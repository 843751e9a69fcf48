"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All pure built-in expressions (regexp + arithmetic, JVM codegen), so
each has an exact DuckDB oracle in __spark_entry__. Heuristics are
deliberately simple and deterministic — the point is the Spark-shaped
plumbing and scale behavior (single scan, no shuffle, pushdown-friendly),
not linguistic accuracy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import normalized_text

#: tiny stopword marker sets per language (n-gram heuristic)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "des", "un", "est"],
    "es": ["el", "la", "los", "de", "que", "un", "es"],
}


def _marker_hits(text_norm: Column, markers: list[str]) -> Column:
    """How many marker words occur (as whole words) in the text."""
    hits = F.lit(0)
    for m in markers:
        hits = hits + F.when(text_norm.rlike(f"(^| ){m}( |$)"), 1).otherwise(0)
    return hits


def lang_id_col(text_col: Column) -> Column:
    """Best-scoring marker language; 'und' when nothing hits."""
    t = normalized_text(text_col)
    scores = {lang: _marker_hits(t, ms) for lang, ms in LANG_MARKERS.items()}
    best_score = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(scores)):  # earlier langs win ties
        expr = F.when((scores[lang] == best_score) & (best_score > 0), F.lit(lang)).otherwise(expr)
    return expr


def token_count_col(text_col: Column) -> Column:
    """Whitespace tokenization (empty text → 0 tokens)."""
    t = F.trim(text_col)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, "\\s+")))


def bpe_ish_token_count_col(text_col: Column) -> Column:
    """BPE-ish regex token count: word pieces, numbers, punctuation as
    separate tokens (GPT-2-style pre-tokenizer shape, simplified)."""
    return F.size(
        F.filter(
            F.split(text_col, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
            lambda s: F.trim(s) != "",
        )
    )


def quality_score_col(text_col: Column) -> Column:
    """Composite [0,1] quality score from length / punctuation / stopword
    ratios (C4/Gopher-style filters, simplified to exact arithmetic):
      0.4·len_score + 0.3·stopword_score + 0.3·(1 − punct_ratio)"""
    t = F.trim(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_col(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(t, "[^A-Za-z0-9\\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(1.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    stop_hits = _marker_hits(normalized_text(text_col), LANG_MARKERS["en"])
    stop_score = F.least(stop_hits / F.lit(4.0), F.lit(1.0))
    return F.round(0.4 * len_score + 0.3 * stop_score + 0.3 * (1.0 - punct_ratio), 6)


def gopher_repetition(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_limits: dict[int, float] = {2: 0.20, 3: 0.18, 4: 0.16},
    dup_limits: dict[int, float] = {5: 0.15},
    word_len_range: tuple[float, float] = (3.0, 10.0),
):
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, public):
    per doc, the character mass concentrated in repeated word n-grams —
    the signal that kills boilerplate/spam pages C4-style ratio filters
    miss. Returns one row per doc:

    - ``top{n}_frac`` (n in ``top_limits``): max over n-grams occurring
      MORE THAN ONCE of occurrences × gram chars, / doc chars — "how
      much of the doc is one repeated phrase"; 0 when nothing repeats.
      (Deterministic variant of Gopher's most-frequent-n-gram fraction:
      ours maximizes the repeated char MASS directly, so count ties
      can't make the metric ambiguous and an unrepeated long gram never
      fires it.)
    - ``dup{n}_frac`` (n in ``dup_limits``): summed char mass of all
      n-grams occurring more than once, / doc chars.
    - ``mean_word_len``, ``frac_dup_words``, and ``keep`` — 1 iff every
      frac is under its limit and mean word length is inside
      ``word_len_range`` (Gopher's 3-10).

    Scale shape: one scan builds all gram sizes in a single projection
    (no per-n passes), ONE explode → ONE map-side-combinable
    groupBy(doc, n, gram) count → conditional agg back to one row per
    doc. The shuffle key (doc_id, n, gram) is near-unique, so partial
    aggregation collapses almost everything before the exchange; no
    per-doc quadratic array scans (a transform-over-distinct would be
    O(len²) per doc and melt on long docs)."""
    norm = normalized_text(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(norm).alias("n_chars"),
        F.split(norm, " ").alias("w"),
    )
    per_doc = base.select(
        "doc_id",
        "n_chars",
        F.round(
            F.when(F.col("n_chars") > 0,
                   (F.col("n_chars") - (F.size("w") - 1)) / F.size("w"))
            .otherwise(F.lit(0.0)), 6,
        ).alias("mean_word_len"),
        F.round(1.0 - F.size(F.array_distinct("w")) / F.size("w"), 6).alias("frac_dup_words"),
    )

    def grams(n: int) -> Column:
        return F.when(
            F.size("w") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("w") - n),
                lambda i: F.struct(
                    F.lit(n).alias("n"),
                    F.concat_ws(" ", F.slice("w", i + 1, n)).alias("g"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,g:string>>"))

    ns = sorted({*top_limits, *dup_limits})
    counts = (
        base.select("doc_id", F.explode(F.flatten(F.array(*[grams(n) for n in ns]))).alias("t"))
        .groupBy("doc_id", F.col("t.n").alias("n"), F.col("t.g").alias("g"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("doc_id", "n", "cnt", (F.col("cnt") * F.length("g")).alias("mass"))
    )
    aggs = counts.groupBy("doc_id").agg(
        *[F.max(F.when((F.col("n") == n) & (F.col("cnt") > 1), F.col("mass"))).alias(f"_t{n}")
          for n in top_limits],
        *[F.sum(F.when((F.col("n") == n) & (F.col("cnt") > 1), F.col("mass"))).alias(f"_d{n}")
          for n in dup_limits],
    )
    out = per_doc.join(aggs, "doc_id", "left")

    def frac(raw: str) -> Column:
        return F.round(
            F.when(F.col("n_chars") > 0, F.coalesce(F.col(raw), F.lit(0)) / F.col("n_chars"))
            .otherwise(F.lit(0.0)), 6,
        )

    for n in top_limits:
        out = out.withColumn(f"top{n}_frac", frac(f"_t{n}"))
    for n in dup_limits:
        out = out.withColumn(f"dup{n}_frac", frac(f"_d{n}"))
    keep = (F.col("mean_word_len") >= word_len_range[0]) & (
        F.col("mean_word_len") <= word_len_range[1]
    )
    for n, lim in top_limits.items():
        keep = keep & (F.col(f"top{n}_frac") <= lim)
    for n, lim in dup_limits.items():
        keep = keep & (F.col(f"dup{n}_frac") <= lim)
    return out.select(
        "doc_id",
        *[f"top{n}_frac" for n in top_limits],
        *[f"dup{n}_frac" for n in dup_limits],
        "mean_word_len",
        "frac_dup_words",
        keep.cast("int").alias("keep"),
    )


def fingerprint_col(text_col: Column) -> Column:
    """Content fingerprint: md5 of normalized text (exact-dup key; the
    crawl engine's url_md5 analogue for document bodies)."""
    return F.md5(normalized_text(text_col))


def rolling_fingerprints_col(text_col: Column, window: int = 4) -> Column:
    """Winnowing-style rolling fingerprints: md5 of each `window`-word
    sliding chunk → array<string>. Built-ins only (transform over index
    range); the per-doc MinHash of these = robust partial-overlap key."""
    words = F.split(normalized_text(text_col), " ")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - window, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, window))),
    )
