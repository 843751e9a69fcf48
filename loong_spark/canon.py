"""Spark-side URL canonicalization / host extraction / hashing (P1-P3).

Fast path: everything expressible with JVM built-ins stays JVM-side
(whole-stage codegen) — trim, fragment strip, host extraction, md5.
The only Python is the relative-href resolver, and that runs as an
Arrow-batched pandas UDF over ``loong_spark.canon_core.resolve_href``
(the same function the oracle uses — single source of truth, no drift).
No per-row Python UDFs anywhere (BASELINE.json north_star).

Reference semantics: resolve_href /root/reference/lib/Loong/Scraper.pm:87-100,
host/trim /root/reference/lib/Loong/Scraper.pm:59-66 + lib/Loong/Utils.pm:32-37,
url_md5 /root/reference/lib/Loong/Crawler.pm:190.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .canon_core import resolve_href


@pandas_udf(T.StringType())
def resolve_href_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    """Arrow-batched resolver. Invoked only on hrefs the JVM fast path
    can't finish (relative paths / dot segments); plain absolute links
    never reach Python."""
    return pd.Series(
        [resolve_href(b, h) for b, h in zip(base, href)], dtype="object"
    )


def _strip_fragment(col: Column) -> Column:
    return F.regexp_replace(col, "#.*$", "")


def canonicalize_col(base: Column, href: Column) -> Column:
    """Canonical absolute URL ('' = drop). Hybrid JVM/pandas plan:

    * trim + fragment-strip: JVM
    * absolute http(s) hrefs with clean paths: JVM passthrough
    * junk schemes (javascript:, mailto:, ...): JVM → ''
    * everything else (relative, dot segments, scheme-relative): pandas UDF

    At web scale most links are absolute or junk, so the Python slice of
    the column is small; Catalyst only evaluates the UDF branch for rows
    matching the `otherwise` (when/otherwise short-circuits per row).
    """
    h = _strip_fragment(F.trim(href))
    is_abs = h.rlike("^(?i)https?://")
    clean_abs = (
        h.rlike("^https?://[a-z0-9.-]+/")  # lowercase scheme+host, has a path
        & ~h.rlike("/\\.\\.?(/|$)")        # no . / .. segments
        & ~h.rlike("[^:/]//")              # no duplicate slashes in the path
    )
    is_junk = h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:") & ~is_abs & ~h.startswith("//")
    return (
        F.when(h == "", _strip_fragment(base))
        .when(clean_abs, h)
        .when(is_junk, F.lit(""))
        .otherwise(resolve_href_udf(base, h))
    )


def host_col(url: Column) -> Column:
    """Lowercased host (P2). `parse_url` is JVM-side."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def path_col(url: Column) -> Column:
    """Path+query of an absolute URL, '/' when absent (mirrors
    canon_core.split_url)."""
    p = F.regexp_replace(url, "^(?i)https?://[^/]*", "")
    return F.when(p == "", "/").otherwise(p)


def url_hash_col(url: Column) -> Column:
    """md5 hex (P3) — JVM built-in, matches canon_core.url_md5."""
    return F.md5(F.encode(url, "utf-8"))
