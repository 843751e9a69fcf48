"""Document deduplication at training-data scale.

Four strategies, strongest-guarantee to cheapest:

* exact        — md5(normalized text) groupBy; one shuffle, map-side combine
* n-gram Jaccard — exact pairwise similarity via shingle self-join
                   (quadratic within shingle buckets; the exactness oracle)
* MinHash+LSH  — shingle → signature → band buckets → candidate pairs;
                 near-linear, recall tunable by (bands, rows)
* SimHash      — 16-bit sign-sum fingerprint; hamming-0 bucket match

Everything is deterministic and built-ins-only (md5 / min / explode /
joins stay JVM-side), so each op has an exact DuckDB oracle in
__spark_entry__. The default MinHash family is ``min over shingles of
md5(i || ':' || shingle)`` — lexicographic min of md5 hex strings is a
valid minwise family and is reproducible in ANY engine with md5; an
opt-in ``hash_family='xxhash64'`` swaps the digest loop for the JVM
xxhash64 intrinsic (3-4× faster at prod parameters, pytest-pinned to
yield the same verified pair set — see minhash_signatures).

Scale notes (100 TB): the shingle explode is the big intermediate —
``spark.sql.files.maxPartitionBytes`` bounds input splits, the groupBy
aggregates map-side (partial min per signature slot), and LSH band
buckets shuffle only (band_id, band_sig, doc_id) — bytes per doc ≈
bands × 40. Exact-pair verification joins only within candidate buckets.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def normalized_text(col):
    """Lower + collapse whitespace — the canonical text for hashing."""
    return F.regexp_replace(F.lower(F.trim(col)), "\\s+", " ")


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_members: int = 1000,
) -> DataFrame:
    """Groups of byte-identical (normalized) docs: (content_hash,
    group_size, keeper_id, member_ids). Keeper = min id (deterministic).

    ``member_ids`` is capped at ``max_members`` (smallest ids kept):
    at corpus scale one boilerplate page can appear 10^7 times and an
    unbounded collect_list of that group OOMs its reduce task.
    ``group_size`` always reflects the TRUE count."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), normalized_text(F.col(text_col)).alias("_t"))
        .withColumn("content_hash", F.md5("_t"))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("group_size"),
            F.min("doc_id").alias("keeper_id"),
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, max_members).alias("member_ids"),
        )
        .filter(F.col("group_size") > 1)
    )


def shingles(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).
    Built-ins only: split → transform over a sliding index range."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, threshold: float = 0.8,
) -> DataFrame:
    """EXACT near-dup pairs by n-gram Jaccard ≥ threshold.
    |A∩B| via shingle self-join; |A∪B| = |A|+|B|−|A∩B|.
    Quadratic in bucket size — the correctness oracle for MinHash-LSH;
    at scale run it only on LSH candidate buckets."""
    sh = shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_hashes: int = 32, hash_family: str = "md5",
) -> DataFrame:
    """(doc_id, sig: array[num_hashes]) — slot i = min over shingles of
    hash_i(shingle). Partial min aggregates map-side.

    ``hash_family``:
    * ``'md5'`` (default) — slot i = lexicographic min of
      md5(i || ':' || shingle) hex strings. Reproducible in ANY engine
      with md5, which is why every ORACLED entry keeps it — but it costs
      num_hashes full digests per shingle, the dominant term of the
      prod-parameter run (32 md5s/shingle ≈ 14-17 s at sf0.1).
    * ``'xxhash64'`` — slot i = numeric min of xxhash64(i, shingle)
      (seeded 64-bit, JVM intrinsic, no digest loop). 3-4× faster at
      prod parameters; NOT restatable in DuckDB, so pair-set equality
      vs the md5 family is pytest-pinned instead (thresholded LSH +
      exact verify is family-agnostic in distribution).
    Any fixed total order over a uniform hash makes each shingle equally
    likely to be the argmin (exchangeability), so both families are
    valid minwise estimators."""
    sh = shingles(docs, id_col, text_col, n)
    if hash_family == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    elif hash_family == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    else:
        raise ValueError(f"hash_family must be 'md5' or 'xxhash64', got {hash_family!r}")
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_hashes: int = 32, bands: int = 8,
    verify_threshold: float | None = 0.8, hash_family: str = "md5",
) -> DataFrame:
    """Near-dup candidate pairs via LSH banding; optionally verified with
    exact Jaccard (candidates → exact check keeps precision = 1.0).
    rows_per_band = num_hashes // bands; a pair collides in a band iff
    that band's signature slice matches exactly."""
    r = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, n, num_hashes, hash_family)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                # cast-to-string is a no-op for the md5 family and makes
                # the xxhash64 family's array<long> concat_ws-able
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.concat_ws(
                        "|",
                        F.transform(
                            F.slice("sig", b * r + 1, r), lambda x: x.cast("string")
                        ),
                    ).alias("band_sig"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_sig")
    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_sig") == F.col("y.band_sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    if verify_threshold is None:
        return cand
    # verify ONLY the candidate pairs (the whole point of LSH): restrict
    # the shingle self-join to docs that appear in some candidate pair,
    # then keep candidate pairs. At scale candidates are ~linear while
    # the unrestricted self-join is quadratic within shingle buckets.
    sh = shingles(docs, id_col, text_col, n)
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # no pinned broadcast: the candidate-doc set is output-dependent
    # (a duplicate-heavy corpus can make it a large fraction of the
    # input) — AQE broadcasts it when its measured size is small
    sh = sh.join(cand_docs, "doc_id", "semi")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .join(cand, ["doc_a", "doc_b"], "semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        cand.join(inter, ["doc_a", "doc_b"])
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Dup-CLUSTER resolution: near-dup pairs → (doc_id, cluster_id)
    where cluster_id = min doc_id reachable through the pair graph.
    Pairs only say "these two match"; deduplication needs one keeper per
    connected component (cluster_id == doc_id picks it deterministically).

    Spark-idiomatic iterative min-label propagation: each round joins
    labels across edges (both directions) and keeps the per-node min;
    stops when a round changes nothing. Rounds needed = graph diameter —
    for dup clusters (near-cliques from LSH banding) that's 1-3. Each
    round localCheckpoints: O(E) shuffle per round on (node, label)
    longs only, lineage cut so the plan never deepens. The driver-side
    convergence check is one count per round — bounded by the tiny
    iteration count, not data size."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = 1
    for _ in range(max_iter):
        # neighbor labels: for edge (u,v), u sees v's current label
        nbr = (
            edges.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "node")
            .filter(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # a silent return here would split clusters and leave extra
        # "keepers" undetected downstream — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(pair-chain diameter exceeds max_iter); raise max_iter"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def simhash_col(text_col, bits: int = 16):
    """SimHash fingerprint as an integer column, built-ins only:
    per token, md5 → take `bits` hex-derived bits; fingerprint bit b is
    the sign of Σ_tokens (±1). Deterministic and oracle-reproducible.

    This is the JVM REFERENCE implementation: ``bits`` interpreted
    higher-order-function aggregates re-hash every token once per bit —
    the hot paths use :func:`make_simhash_udf` (one md5 per token,
    vectorized bit spread), equality-pinned by
    tests/test_text_ops.py::test_simhash_udf_matches_jvm."""
    tokens = F.array_distinct(F.split(normalized_text(text_col), " "))
    # per token: integer whose low `bits` bits come from md5 hex
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")  # noqa: E731

    def term_for(b: int):
        return F.aggregate(
            tokens,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.shiftright(tok_hash(t), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    terms = [term_for(b).alias(f"bit{b}") for b in range(bits)]
    out = F.lit(0).cast("long")
    for b, term in enumerate(terms):
        out = out + F.when(term > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("long")
    return out


def make_simhash_udf(bits: int = 16):
    """Arrow-batched SimHash twin of :func:`simhash_col`: one md5 per
    DISTINCT token (the JVM expression re-hashes every token per bit),
    bits spread with numpy. Bit-identical by construction — same
    normalization (Java-\\s whitespace classes, NOT Python's
    unicode-aware \\s), same ``int(md5[:15], 16)`` token hash, same
    sign-of-sum per bit; the equality is test-pinned against the JVM
    expression on real fixture text."""
    # Java regex \s = [ \t\n\x0B\f\r] — Python's \s would also eat
    # unicode spaces and diverge from the JVM normalization
    _ws = re.compile(r"[ \t\n\x0b\f\r]+")
    weights = (1 << np.arange(bits)).astype(np.int64)

    @pandas_udf(T.LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            # .strip(" "): Spark's trim removes ASCII spaces ONLY —
            # Python's bare .strip() would also eat \t\n and diverge
            norm = _ws.sub(" ", ("" if t is None else str(t)).strip(" ").lower())
            # dict.fromkeys = array_distinct (dedup, order irrelevant)
            toks = list(dict.fromkeys(norm.split(" ")))
            h = np.fromiter(
                (int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16) for tok in toks),
                dtype=np.int64, count=len(toks),
            )
            tok_bits = (h[:, None] >> np.arange(bits)) & 1  # (n_tok, bits)
            terms = (2 * tok_bits - 1).sum(axis=0)  # Σ ±1 per bit
            out[i] = int(((terms > 0) * weights).sum())
        return pd.Series(out)

    return simhash


def simhash_near_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bits: int = 16, max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs within hamming distance ``max_hamming`` of the
    ``bits``-bit simhash, via the pigeonhole block trick: split the
    fingerprint into max_hamming+1 blocks — any pair within distance k
    differs in ≤ k blocks, so it matches EXACTLY on at least one block.
    Candidates equi-join on (block_id, block_value) — never an all-pairs
    scan — then the exact hamming distance (bit_count of xor, JVM-side)
    verifies, so precision = 1.0 and recall = 1.0 (the pigeonhole bound
    is exhaustive, unlike probabilistic LSH).

    Scale: shuffle is (block_id, block_val, doc_id, simhash) ≈ 28 B/doc
    × (k+1) blocks; candidate volume is governed by block width
    (bits/(k+1)) — widen ``bits`` before raising ``max_hamming``."""
    n_blocks = max_hamming + 1
    base = bits // n_blocks
    rem = bits % n_blocks  # first `rem` blocks get one extra bit
    s = docs.select(
        F.col(id_col).alias("doc_id"),
        make_simhash_udf(bits)(F.col(text_col)).alias("simhash"),
    )
    blocks = []
    off = 0
    for b in range(n_blocks):
        w = base + (1 if b < rem else 0)
        blocks.append(
            F.struct(
                F.lit(b).alias("block_id"),
                F.shiftright("simhash", off).bitwiseAND(F.lit((1 << w) - 1)).alias("block_val"),
            )
        )
        off += w
    blocked = s.select(
        "doc_id", "simhash", F.explode(F.array(*blocks)).alias("blk")
    ).select("doc_id", "simhash", "blk.block_id", "blk.block_val")
    x, y = blocked.alias("x"), blocked.alias("y")
    return (
        x.join(
            y,
            (F.col("x.block_id") == F.col("y.block_id"))
            & (F.col("x.block_val") == F.col("y.block_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))).alias("hamming"),
        )
        .distinct()  # a close pair matches several blocks; emit once
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_members: int = 1000,
) -> DataFrame:
    """Docs sharing an identical 16-bit simhash bucket (hamming-0 match;
    see simhash_near_duplicates for hamming-k probing). member_ids capped
    at ``max_members`` like exact_duplicates; group_size stays exact."""
    s = docs.select(
        F.col(id_col).alias("doc_id"), make_simhash_udf()(F.col(text_col)).alias("simhash")
    )
    return (
        s.groupBy("simhash")
        .agg(
            F.count("*").alias("group_size"),
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, max_members).alias("member_ids"),
        )
        .filter(F.col("group_size") > 1)
    )
