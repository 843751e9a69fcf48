"""Large-scale training-data pipeline operators over document tables:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting), and
multimodal column plumbing. All built-ins-first; Python only as
Arrow-batched pandas UDFs."""
