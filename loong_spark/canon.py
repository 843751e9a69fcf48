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
        [resolve_href(b or "", h or "") for b, h in zip(base, href)], dtype="object"
    )


def _strip_fragment(col: Column) -> Column:
    # everything before the first '#' — substring_index is regex-free and
    # exactly equivalent to regexp_replace(col, "#.*$", "")
    return F.substring_index(col, "#", 1)


def _jvm_parts(base: Column, href: Column) -> tuple[Column, Column, Column]:
    """(stripped href, jvm_handled predicate, jvm result). Shared by the
    column and DataFrame canonicalizers."""
    # NULL href coalesces to '' so it takes the empty→base branch (same as
    # resolve_href('')); without this, jvm_handled is NULL and the row
    # would silently drop from BOTH the fast and slow filters.
    h = _strip_fragment(F.trim(F.coalesce(href, F.lit(""))))
    # Predicate battery ordered cheap→expensive: codegen emits
    # short-circuit && / ||, so the typical absolute-href row costs a few
    # substring tests + ONE regex. The substring forms of the dot-segment
    # and double-slash tests are supersets of the old regexes where they
    # differ — narrowing clean_abs is always safe because the pandas
    # resolver (slow path) is authoritative for anything not fast-pathed.
    scheme_gate = h.startswith("http://") | h.startswith("https://")
    dirty_dots = (
        h.contains("/./") | h.contains("/../") | h.endswith("/.") | h.endswith("/..")
    )
    dup_slash = F.locate("//", h, 9) > 0  # any // after the scheme's own
    clean_abs = (
        scheme_gate
        & ~dirty_dots
        & ~dup_slash
        & h.rlike("^https?://[a-z0-9.-]+/")  # lowercase scheme+host, has a path
    )
    low8 = F.lower(F.substring(h, 1, 8))
    is_abs = (low8 == "https://") | (F.substring(low8, 1, 7) == "http://")
    is_junk = (
        ~h.startswith("//") & ~is_abs & h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:")
    )
    # empty href returns the BASE — which must come out canonical too, so
    # the JVM keeps only bases that are already in canonical form (clean
    # path, lowercase scheme+host); dirty bases go to the resolver, which
    # normalizes them like any absolute href (canon_core empty branch)
    bs = _strip_fragment(F.coalesce(base, F.lit("")))
    base_clean = (
        ~(bs.contains("/./") | bs.contains("/../") | bs.endswith("/.") | bs.endswith("/.."))
        & ~(F.locate("//", bs, 9) > 0)
        & bs.rlike("^https?://[a-z0-9.-]+/")
    )
    jvm_handled = ((h == "") & base_clean) | clean_abs | is_junk
    jvm_result = (
        F.when(h == "", bs)
        .when(clean_abs, h)
        .otherwise(F.lit(""))  # is_junk
    )
    return h, jvm_handled, jvm_result


def canonicalize_col(base: Column, href: Column) -> Column:
    """Canonical absolute URL ('' = drop). Hybrid JVM/pandas plan:

    * trim + fragment-strip: JVM
    * absolute http(s) hrefs with clean paths: JVM passthrough
    * junk schemes (javascript:, mailto:, ...): JVM → ''
    * everything else (relative, dot segments, scheme-relative): pandas UDF

    CAVEAT (hot paths): Catalyst's ExtractPythonUDFs pulls the UDF out of
    the when/otherwise and evaluates it for EVERY row, so this column form
    pays Arrow transfer for 100%% of links. Use :func:`canonicalize_df`
    in volume paths — it filters first so only the resolver slice reaches
    Python. This form is for small/one-off frames.
    """
    h, jvm_handled, jvm_result = _jvm_parts(base, href)
    return F.when(jvm_handled, jvm_result).otherwise(resolve_href_udf(base, h))


def canonicalize_df(
    df, base_col: str, href_col: str, out_col: str = "url"
):
    """DataFrame-level canonicalization keeping Python strictly off the
    fast path: rows the JVM rules fully handle (at web scale, the vast
    majority — absolute hrefs, junk schemes, empties) never leave the JVM;
    only relative/dot-segment/scheme-relative hrefs go through the
    Arrow-batched resolver. Same semantics as :func:`canonicalize_col`
    (property-tested in tests/test_canon.py); row order is not preserved
    (union) — downstream ordering comes from explicit sort keys."""
    base, href = F.col(base_col), F.col(href_col)
    h, jvm_handled, _ = _jvm_parts(base, href)
    # within the handled set, scheme-prefixed ⟺ clean_abs, so the fast
    # projection needs zero regexes (the regex battery runs once, in the
    # filter): empty → base, clean_abs → passthrough, junk → ''
    scheme_gate = h.startswith("http://") | h.startswith("https://")
    fast_result = (
        F.when(h == "", _strip_fragment(base)).when(scheme_gate, h).otherwise(F.lit(""))
    )
    fast = df.filter(jvm_handled).withColumn(out_col, fast_result)
    slow = df.filter(~jvm_handled).withColumn(out_col, resolve_href_udf(base, h))
    return fast.unionByName(slow)


def _scheme_rest(url: Column) -> Column:
    """Chars after the http(s):// scheme, '' for non-absolute URLs.
    Substring arithmetic only — no regex, no parse_url (which also
    diverges from canon_core by stripping ports from HOST)."""
    low8 = F.lower(F.substring(url, 1, 8))
    return (
        F.when(low8 == "https://", F.substring(url, 9, 1 << 30))
        .when(F.substring(low8, 1, 7) == "http://", F.substring(url, 8, 1 << 30))
        .otherwise(F.lit(""))
    )


def host_col(url: Column) -> Column:
    """Lowercased authority (P2) — matches canon_core.split_url exactly
    (authority up to the first '/', ports included)."""
    return F.lower(F.substring_index(_scheme_rest(url), "/", 1))


def path_col(url: Column) -> Column:
    """Path+query of an absolute URL, '/' when absent (mirrors
    canon_core.split_url)."""
    rest = _scheme_rest(url)
    slash = F.instr(rest, "/")
    return (
        F.when(rest == "", url)  # non-absolute: core returns the input
        .when(slash == 0, F.lit("/"))
        .otherwise(F.substring(rest, slash, 1 << 30))
    )


def registrable_domain_col(host: Column) -> Column:
    """eTLD+1 of a host column, pure JVM split/element_at arithmetic
    with the embedded multi-part-suffix set as a codegen In-set — the
    per-domain fairness key (frontier.domain_capped). Twin of
    canon_core.registrable_domain (parity pytest-enforced)."""
    from loong_spark.canon_core import MULTI_PART_SUFFIXES

    h = F.substring_index(host, ":", 1)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    is_ip = h.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    return (
        F.when(is_ip | (n <= 2), h)
        .when(last2.isin(*sorted(MULTI_PART_SUFFIXES)), last3)
        .otherwise(last2)
    )


def url_hash_col(url: Column) -> Column:
    """md5 hex (P3) — JVM built-in, matches canon_core.url_md5."""
    return F.md5(F.encode(url, "utf-8"))
