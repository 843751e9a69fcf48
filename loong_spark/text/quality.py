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
