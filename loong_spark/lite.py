"""Lite — the one-call scrape flow (§3.3).

The reference's Lite surface (/root/reference/lib/Loong/Lite.pm:14-88,
driven by /root/reference/script/tumblr.pl) is: register pattern →
callback routes, ``run(url)`` fetches one page and dispatches it through
the matching route, ``download(url, dir)`` saves each media asset. That
is a per-URL imperative loop; the Spark rebuild expresses the SAME flow
as one composition over a DataFrame of fetched pages, so a "lite" script
scales from one page (tumblr.pl's case) to a 100 TB page dump without
changing shape:

    route dispatch (F5, sites.site_dispatch — when-chain, no shuffle)
      → parse spans+links (U1, rules.parse_pages — one Arrow pass over
        the effective body: a js_wrapped route's unwrapped document
        feeds the parser, like the reference's second scrape pass)
      → media manifest (S10, media.media_manifest — distinct refs,
        dedup-before-download) → optional stub fetch (media.fetch_media).

No driver-side loop: every stage is a DataFrame op, so the plan fuses
dispatch+parse into the page scan and the only shuffles are the span
re-assembly and the distinct-ref groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .media import fetch_media, media_manifest
from .rules import links_of, parse_pages, spans_of
from .sites import site_dispatch


def lite_scrape(pages: DataFrame, fetch: bool = False) -> dict[str, DataFrame]:
    """One call: (url, body html) pages → routed pages, per-doc spans,
    out-links, media manifest (and stub-fetched blobs when ``fetch``).

    Returns {"routed", "spans", "links", "media"[, "blobs"]}. ``routed``
    carries the F5 route name and the per-route extraction (next_url /
    unwrapped_html); ``spans``/``links`` come from ONE parse pass over
    the effective body (unwrapped document for js_wrapped routes, the
    raw body otherwise); ``media`` is the dedup'd download work list
    (the reference's Lite re-fetches per referring page — wrong shape
    at scale, see media.py)."""
    routed = site_dispatch(pages)
    # effective body computed IN the projection (same route match the
    # dispatch uses) — joining pages back onto routed would shuffle the
    # body column, i.e. the whole page corpus, on url at scale
    from .rules import route_match_col
    from .sites import site_routes, unwrap_document_write_col

    routes = site_routes()
    rid = route_match_col(F.col("url"), [r for r, _ in routes])
    js_ids = [i for i, (r, _) in enumerate(routes) if r.name == "js_wrapped"]
    eff = F.col("body")
    for i in js_ids:
        eff = F.when(rid == i, unwrap_document_write_col(F.col("body"))).otherwise(eff)
    parsed = parse_pages(pages.select("url", eff.alias("body")))
    spans = spans_of(parsed)
    out = {
        "routed": routed,
        "spans": spans,
        "links": links_of(parsed),
        "media": media_manifest(
            spans.select(F.md5(F.encode("url", "utf-8")).alias("doc_id"), "spans")
        ),
    }
    if fetch:
        out["blobs"] = fetch_media(out["media"])
    return out
