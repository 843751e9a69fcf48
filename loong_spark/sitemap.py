"""Sitemap discovery + parsing, pure JVM built-ins (no Python UDFs).

The reference seeds crawls from static INI lists
(/root/reference/conf/site/hupu.com/crawl.ini `entry.home`); a
production frontier also ingests the sitemaps protocol (sitemaps.org;
the `Sitemap:` robots.txt extension): robots files ADVERTISE sitemap
URLs, sitemap files LIST page URLs (urlset) or child sitemaps
(sitemapindex). Everything here is a per-fetched-row string expression
— whole-stage-codegen regex/higher-order-function work, O(batch) with
ZERO new shuffles or state tables: discovered locs are injected into
the pipeline's existing raw-link stream (pipeline.py) and ride the
same canonicalize → bloom/seen dedup → robots filter → priority →
admit path as `<a href>` links. That reuse is also what bounds
sitemapindex recursion at scale: a child sitemap is just a URL, so a
cyclic or self-referencing index dedups away at the URL-seen filter
instead of looping.

Semantics are the pure twin's (sitemap_core.py — entity-decoded
trimmed `<loc>` values in document order; agent-independent `Sitemap:`
lines); parity is pytest-enforced on a shared battery plus a
Hypothesis property test (tests/test_sitemap.py). Regex-based block
extraction is deliberate: sitemap XML is machine-generated and
regular, the expression stays in codegen, and the SAME regex restates
in DuckDB for the driver oracle (CDATA-wrapped locs are a documented
non-goal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sitemap_core import _ENTITIES, PRIORITY_NUM_RE

#: JVM regex twins of sitemap_core's patterns (Java and Python regex
#: agree on every construct used: (?s)/(?i) flags, lazy .*?, \s, and
#: explicit [0-9] classes — never \d, which is unicode-wide in Python
#: but ASCII in Java)
LOC_PATTERN = r"(?s)<loc\s*>(.*?)</loc\s*>"
ROOT_PATTERN = r"<\s*(urlset|sitemapindex)[\s>]"
BLOCK_PATTERN = r"(?s)<(?:url|sitemap)\b[^>]*>(.*?)</(?:url|sitemap)\s*>"
PRIO_PATTERN = r"(?s)<priority\s*>(.*?)</priority\s*>"


def _wtrim(c: Column) -> Column:
    # Java-\s trim, byte-identical to robots.py's and the pure twin's
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def xml_unescape_col(c: Column) -> Column:
    """Decode the five predefined XML entities; ``&amp;`` LAST so
    ``&amp;lt;`` yields the literal ``&lt;`` (mirrors
    sitemap_core.xml_unescape's replacement order)."""
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def sitemap_lines_col(txt: Column) -> Column:
    """robots.txt text → array of ``Sitemap:`` URL values in line
    order (agent-independent per the protocol; duplicates kept — the
    frontier's URL-seen filter dedups downstream)."""
    lines = F.split(F.regexp_replace(txt, "^\ufeff+", ""), "\r?\n")
    vals = F.transform(
        lines,
        lambda l: _wtrim(
            F.regexp_extract(
                _wtrim(F.regexp_replace(l, "#.*$", "")),
                r"(?i)^sitemap\s*:(.*)$",
                1,
            )
        ),
    )
    return F.filter(vals, lambda v: v != "")


def sitemap_locs_col(txt: Column) -> Column:
    """sitemap XML text → array of ``<loc>`` values in document order,
    trimmed + entity-decoded (urlset page URLs or sitemapindex child
    sitemaps — valid files never mix the two, so one expression serves
    both; the caller tells them apart by re-fetching)."""
    raw = F.regexp_extract_all(txt, F.lit(LOC_PATTERN), F.lit(1))
    vals = F.transform(raw, lambda v: xml_unescape_col(_wtrim(v)))
    return F.filter(vals, lambda v: v != "")


def sitemap_entries_col(txt: Column) -> Column:
    """sitemap XML text → array<struct<href,sm_prio>> in document order
    — the ``cfg.w_sitemap`` boost path's twin of
    sitemap_core.sitemap_entries: per-``<url>``/``<sitemap>``-block
    extraction so each loc stays associated with ITS ``<priority>``
    sibling (a missing/non-decimal priority is NULL; PRIORITY_NUM_RE
    pins the one numeric grammar both twins parse identically). Still
    pure codegen regex/HOF work, zero shuffles."""
    blocks = F.regexp_extract_all(txt, F.lit(BLOCK_PATTERN), F.lit(1))

    def entry(b: Column) -> Column:
        pv = _wtrim(F.regexp_extract(b, PRIO_PATTERN, 1))
        return F.struct(
            xml_unescape_col(_wtrim(F.regexp_extract(b, LOC_PATTERN, 1))).alias("href"),
            F.when(pv.rlike(PRIORITY_NUM_RE), pv.cast("double")).alias("sm_prio"),
        )

    return F.filter(F.transform(blocks, entry), lambda e: e["href"] != F.lit(""))


def is_sitemap_col(content_type: Column, txt: Column) -> Column:
    """Content gate: XML content type AND urlset/sitemapindex root.
    NULL-safe (a missing body is not a sitemap)."""
    return (
        content_type.isNotNull()
        & txt.isNotNull()
        & content_type.rlike("(?i)xml")
        & txt.rlike(ROOT_PATTERN)
    )


#: sitemaps.org ``<changefreq>`` → re-fetch interval in seconds.
#: ``always`` = re-fetch on every visit (interval 0); ``never`` and
#: unknown/missing values carry NO interval (lastmod is then the only
#: freshness signal, matching the protocol's "archived URLs" intent).
CHANGEFREQ_SECONDS: tuple[tuple[str, int], ...] = (
    ("always", 0),
    ("hourly", 3_600),
    ("daily", 86_400),
    ("weekly", 604_800),
    ("monthly", 2_592_000),
    ("yearly", 31_536_000),
)


def lastmod_epoch_col(lastmod: Column) -> Column:
    """``<lastmod>`` string → midnight-UTC epoch seconds at DATE
    precision, or NULL. The protocol allows a date or a full W3C
    datetime; freshness here is deliberately date-granular (the common
    publisher practice), so only the leading ``YYYY-MM-DD`` is read —
    a full datetime contributes its date part, anything else is NULL.
    Timezone-independent by construction: the date string round-trips
    through a calendar DATE and ``unix_date`` (days since epoch), so
    the session/driver timezone can never shift the result — which is
    what lets DuckDB restate it exactly
    (``(TRY_CAST(.. AS DATE) - DATE '1970-01-01') * 86400``)."""
    ds = F.regexp_extract(lastmod, r"^([0-9]{4}-[0-9]{2}-[0-9]{2})", 1)
    d = F.try_to_timestamp(ds, F.lit("yyyy-MM-dd")).cast("date")
    return F.unix_date(d).cast("long") * F.lit(86400).cast("long")


def changefreq_interval_col(changefreq: Column) -> Column:
    """``<changefreq>`` string → interval seconds per CHANGEFREQ_SECONDS
    (case-insensitive, trimmed); ``never``/unknown/missing → NULL."""
    c = F.lower(_wtrim(changefreq))
    out: Column = F.lit(None).cast("long")
    for name, secs in reversed(CHANGEFREQ_SECONDS):
        out = F.when(c == name, F.lit(secs).cast("long")).otherwise(out)
    return out


def recrawl_due(entries: DataFrame, state: DataFrame, now_epoch: int) -> DataFrame:
    """Freshness selection: which sitemap-listed URLs are due a
    re-fetch? The incremental-recrawl primitive a production frontier
    runs between full crawls (beyond-reference, like all of sitemap.py
    — the reference re-crawls from scratch on a cron,
    /root/reference/script/crawl.pl).

    ``entries``: parsed urlset rows — (loc, lastmod, changefreq,
    priority) as produced by parse_sitemap(kind='url').
    ``state``: fetch history — (loc, last_fetch_epoch long).
    ``now_epoch``: the decision instant (passed in, never wall-clock —
    keeps runs reproducible).

    One left equi-join on loc (AQE picks broadcast vs shuffle from
    measured sizes — at 100 TB `state` is the big side and `entries`
    one batch's sitemaps, so this is a per-batch-bounded probe, never a
    full-history rewrite). Decision precedence, first match wins:

    - never fetched            → due, reason 'new'
    - lastmod date > fetch     → due, reason 'modified' (date
      precision: a same-day edit after the fetch is picked up by the
      NEXT day's run — documented, conservative-cheap)
    - changefreq interval lapsed (now - fetch >= interval) → due,
      reason 'stale' ('always' = interval 0 = every run; 'never' and
      absent changefreq never go stale)
    - else                     → not due, reason 'fresh'
    """
    j = entries.join(state.select("loc", "last_fetch_epoch"), "loc", "left")
    lm = lastmod_epoch_col(F.col("lastmod"))
    iv = changefreq_interval_col(F.col("changefreq"))
    lf = F.col("last_fetch_epoch")
    reason = (
        F.when(lf.isNull(), F.lit("new"))
        .when(lm.isNotNull() & (lm > lf), F.lit("modified"))
        .when(iv.isNotNull() & (F.lit(int(now_epoch)) - lf >= iv), F.lit("stale"))
        .otherwise(F.lit("fresh"))
    )
    return j.select(
        "loc",
        "priority",
        "last_fetch_epoch",
        reason.alias("reason"),
        (reason != F.lit("fresh")).alias("due"),
    )


def parse_sitemap(
    df: DataFrame, xml_col: str = "xml", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Rich per-entry parse for ETL/audit use (the in-pipeline hot path
    uses sitemap_locs_col, which only needs the URLs): explode
    ``<url>``/``<sitemap>`` blocks in document order and extract the
    protocol's per-entry fields.

    Returns ``keep`` passthrough columns plus (kind 'url'|'sitemap',
    entry_idx, loc, lastmod, changefreq, priority double|null) — one
    row per block that carries a non-empty ``<loc>``. lastmod stays a
    string (the protocol allows date OR full W3C datetime); a malformed
    priority is NULL, not an ANSI cast error."""
    xml = F.col(xml_col)
    blocks = F.regexp_extract_all(
        xml, F.lit(r"(?s)<(?:url|sitemap)\b[^>]*>(.*?)</(?:url|sitemap)\s*>"), F.lit(1)
    )
    kind = F.when(
        xml.rlike(r"<\s*sitemapindex[\s>]"), F.lit("sitemap")
    ).otherwise(F.lit("url"))
    out = (
        df.select(*keep, kind.alias("kind"), F.posexplode(blocks).alias("entry_idx", "_b"))
        .withColumn(
            "loc",
            xml_unescape_col(_wtrim(F.regexp_extract("_b", LOC_PATTERN, 1))),
        )
        .filter(F.col("loc") != "")
        .withColumn(
            "lastmod",
            _wtrim(F.regexp_extract("_b", r"(?s)<lastmod\s*>(.*?)</lastmod\s*>", 1)),
        )
        .withColumn(
            "changefreq",
            _wtrim(
                F.regexp_extract("_b", r"(?s)<changefreq\s*>(.*?)</changefreq\s*>", 1)
            ),
        )
        .withColumn(
            "priority",
            _wtrim(
                F.regexp_extract("_b", r"(?s)<priority\s*>(.*?)</priority\s*>", 1)
            ).try_cast("double"),
        )
        .drop("_b")
    )
    return out
