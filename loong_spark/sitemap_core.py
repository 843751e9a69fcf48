"""Pure-Python sitemap parsing — the oracle twin of sitemap.py.

The reference has no sitemap support (its seeds are INI `entry.home`
lists, /root/reference/conf/site/hupu.com/crawl.ini); the north-star
deployment target is a production URL-frontier, and the sitemaps
protocol (sitemaps.org, RFC 9309 §2.3's `Sitemap:` robots extension)
is how real sites advertise their URL inventory to one. This module is
the executable spec the crawl oracle (oracle.py) runs; parity with the
JVM implementation (sitemap.py) is pytest-enforced
(tests/test_sitemap.py).

Semantics (deliberately minimal and twin-mirrorable):

* ``sitemap_lines``: ``Sitemap:`` directives in a robots.txt file —
  agent-INDEPENDENT per the protocol (they bind to no User-agent
  section), case-insensitive key, value kept verbatim (URLs are
  case-sensitive), comments/BOM/CRLF handled exactly like
  robots_core._directives, duplicates kept in line order (the frontier's
  URL-seen filter dedups them downstream for free).
* ``sitemap_locs``: ``<loc>`` element values in document order from a
  urlset OR sitemapindex file — one regex serves both because valid
  files never mix the two block kinds; values are whitespace-trimmed
  and XML-entity-decoded (the protocol REQUIRES loc URLs to be
  entity-escaped). Regex-based on purpose: sitemap XML is
  machine-generated and regular, and the same expression is restatable
  in DuckDB for the driver oracle; CDATA-wrapped locs are out of scope
  (documented limit).
* ``is_sitemap``: content gate — an XML content type AND a
  urlset/sitemapindex root element. A sitemapindex's children are just
  URLs: fetched like any other, re-gated by content, so index recursion
  is bounded by the URL-seen filter (a cyclic index cannot loop).
"""

from __future__ import annotations

import re

from .robots_core import _WS

#: single-pass XML entity decode: the four char entities first, &amp;
#: LAST — "&amp;lt;" must decode to the literal "&lt;", not "<"
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

_LOC_RE = re.compile(r"(?s)<loc\s*>(.*?)</loc\s*>")
_ROOT_RE = re.compile(r"<\s*(urlset|sitemapindex)[\s>]")
_SITEMAP_LINE_RE = re.compile(r"(?i)^sitemap\s*:(.*)$")
#: per-entry block + priority extraction (the cfg.w_sitemap boost path)
_BLOCK_RE = re.compile(r"(?s)<(?:url|sitemap)\b[^>]*>(.*?)</(?:url|sitemap)\s*>")
_PRIO_RE = re.compile(r"(?s)<priority\s*>(.*?)</priority\s*>")
#: the subset of numeric literals BOTH twins parse identically — plain
#: decimals with optional exponent, [0-9] spelled out (Python's \d is
#: unicode-wide, Java's is ASCII); anything else (Infinity, NaN, hex,
#: locale separators) is None/NULL on both sides by construction
PRIORITY_NUM_RE = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$"
_PRIORITY_NUM_RE = re.compile(PRIORITY_NUM_RE)


def xml_unescape(s: str) -> str:
    """Decode the five predefined XML entities (``&amp;`` last)."""
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def sitemap_lines(txt: str) -> list[str]:
    """``Sitemap:`` URL values from robots.txt text, in line order.

    Line handling mirrors robots_core._directives byte-for-byte (BOM,
    CRLF, ``#`` comments, Java-``\\s`` trim) but binds to NO section:
    the protocol scopes Sitemap lines to the whole host."""
    out: list[str] = []
    for raw in re.split(r"\r?\n", txt.lstrip("\ufeff")):
        line = re.sub(r"#.*$", "", raw).strip(_WS)
        m = _SITEMAP_LINE_RE.match(line)
        if m:
            v = m.group(1).strip(_WS)
            if v:
                out.append(v)
    return out


def sitemap_locs(xml: str) -> list[str]:
    """``<loc>`` values in document order — urlset page URLs or
    sitemapindex child-sitemap URLs — trimmed and entity-decoded."""
    out = []
    for m in _LOC_RE.findall(xml):
        v = m.strip(_WS)
        if v:
            out.append(xml_unescape(v))
    return out


def sitemap_entries(xml: str) -> list[tuple[str, float | None]]:
    """(loc, priority|None) pairs in document order — the per-entry
    extraction the ``cfg.w_sitemap`` scheduling boost needs (loc alone
    can't be associated with its ``<priority>`` sibling).

    Block-based (``<url>``/``<sitemap>`` elements) rather than bare
    ``<loc>`` scanning, so on a degenerate file with locs OUTSIDE any
    block this may see fewer URLs than sitemap_locs — on every
    well-formed sitemap (the protocol requires locs inside blocks) the
    loc sequences are identical. Priority parses only the shared
    decimal subset (PRIORITY_NUM_RE); the protocol's values are 0.0-1.0
    decimals, and restricting both twins to one grammar is what makes
    JVM≡pure parity property-testable."""
    out: list[tuple[str, float | None]] = []
    for block in _BLOCK_RE.findall(xml):
        m = _LOC_RE.search(block)
        loc = xml_unescape(m.group(1).strip(_WS)) if m else ""
        if not loc:
            continue
        pm = _PRIO_RE.search(block)
        prio: float | None = None
        if pm:
            pv = pm.group(1).strip(_WS)
            if _PRIORITY_NUM_RE.match(pv):
                prio = float(pv)
        out.append((loc, prio))
    return out


def is_sitemap(content_type: str | None, body_txt: str | None) -> bool:
    """Content gate: XML content type + urlset/sitemapindex root."""
    if not content_type or not body_txt:
        return False
    return bool(re.search(r"(?i)xml", content_type)) and bool(
        _ROOT_RE.search(body_txt)
    )
