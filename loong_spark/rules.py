"""Route dispatch (F5) + page parsing (U1/U2) — the scrape DSL, Spark-first.

The reference registers per-site route callbacks
``get '<url-regex>' => sub {...}`` (/root/reference/lib/Loong/Scraper.pm:14-43)
and dispatches by regex over an UNORDERED hash — nondeterministic on
overlapping patterns (/root/reference/lib/Loong/Scraper.pm:160-178).
The rebuild pins declaration order (first match wins; SURVEY.md §2.2 F5)
and expresses dispatch as a JVM-side chain of ``when(url.rlike(p), i)``,
so rule matching never leaves whole-stage codegen.

Parsing (one page → N spans + M links) is the reference's UDTF-shaped
route callback (/root/reference/lib/Loong/Scraper.pm:68-85). In the
simulator pipeline the corpus already stores spans, so "parse" is a join
(pipeline.py). This module provides the PRODUCTION-shaped path: raw HTML
body → interleaved (kind, text, media_ref, offset) spans + hrefs via
``mapInPandas`` (Arrow-batched, 1 row in → many rows out — no per-row
Python UDFs). The HTML "parser" here is a small deterministic regex
extractor (real-tag lxml/bs4 are not in this container; the Spark-side
plumbing — schema, batching, explode shape — is the real, tested part).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .parse_core import decode_body, parse_html as _parse_html, render_html  # noqa: F401
# (_parse_html / render_html re-exported: the pure core lives in
# parse_core so the oracle/tests can import it without pyspark)


@dataclass(frozen=True)
class Rule:
    """One scrape route: url pattern → named extractor (declaration order
    is the dispatch priority — pinned, unlike the reference)."""

    pattern: str
    name: str


def route_match_col(url: Column, rules: list[Rule]) -> Column:
    """F5: first-matching rule id (JVM regex, codegen-friendly); -1 = no
    route (reference croaks 'no pattern matched',
    /root/reference/lib/Loong/Scraper.pm:73-76)."""
    expr = F.lit(-1)
    for i in reversed(range(len(rules))):
        expr = F.when(url.rlike(rules[i].pattern), F.lit(i)).otherwise(expr)
    return expr


#: parse output: one row per span or link
PARSED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("out_kind", T.StringType(), False),  # 'span' | 'link'
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), True),
        T.StructField("href", T.StringType(), True),
        T.StructField("link_idx", T.IntegerType(), True),
    ]
)

def parse_pages(pages: DataFrame, url_col: str = "url", body_col: str = "body") -> DataFrame:
    """mapInPandas page parser: (url, body html) → exploded spans+links.
    Arrow-batched; each input batch yields one output frame (no per-row
    Python UDF). Partitioning of the input is preserved — pre-partition
    by (host, salt) upstream for hot-host balance."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PARSED.fields]
        for pdf in batches:
            rows: list[dict] = []
            for u, b in zip(pdf[url_col], pdf[body_col]):
                rows.extend(_parse_html(u, b))
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return pages.mapInPandas(fn, schema=PARSED)


def parse_pages_bytes(
    pages: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
    ctype_col: str = "content_type",
) -> DataFrame:
    """Production-shaped parse stage: (url, body BYTES, content_type) →
    exploded spans+links. Charset is resolved per page inside the same
    Arrow batch (P4: header param → meta/css scan → utf-8 fallback,
    parse_core.sniff_charset — /root/reference/lib/Loong/Scraper.pm:102-157),
    then decode → parse. One mapInPandas, no per-row Python UDFs."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PARSED.fields]
        for pdf in batches:
            rows: list[dict] = []
            for u, b, ct in zip(pdf[url_col], pdf[body_col], pdf[ctype_col]):
                rows.extend(_parse_html(u, decode_body(ct, b)))
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return pages.mapInPandas(fn, schema=PARSED)


def spans_of(parsed: DataFrame) -> DataFrame:
    """Re-assemble per-doc interleaved span arrays, ordered by offset
    (SURVEY.md §7 Hard parts #4: explode inside UDF stages, collect_list
    sorted at write)."""
    return (
        parsed.filter(F.col("out_kind") == "span")
        .groupBy("url")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("kind", "text", "media_ref", "offset")),
                lambda a, b: F.when(a["offset"] < b["offset"], -1)
                .when(a["offset"] > b["offset"], 1)
                .otherwise(0),
            ).alias("spans")
        )
    )


def links_of(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("out_kind") == "link").select(
        F.col("url").alias("parent"), "href", "link_idx"
    )


# -- production HTTP fetch stub (S4 prod path) ------------------------------
def fetch_pages_http(frontier_batch: DataFrame, timeout_s: float = 10.0) -> DataFrame:
    """PRODUCTION fetch: batched HTTP per partition via mapInPandas
    (reference: async ua->start with ≤20 in-flight,
    /root/reference/lib/Loong/Crawler.pm:166-209). Interface kept so a
    real fetcher drops in; the sandbox has no network, so this raises.
    The simulator join (pipeline.run_batch) is the tested fetch path."""
    raise NotImplementedError(
        "no network in this environment — use the web_graph join simulator; "
        "a real implementation maps partitions to aiohttp/requests sessions "
        "with per-host connection caps"
    )
