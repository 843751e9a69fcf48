"""Pure-Python page-parse core — charset sniffing, HTML→spans/links
extraction, and the render inverse used by fixtures.

Like canon_core, this is the single source of truth shared by the Spark
mapInPandas stages (loong_spark.rules) and the pure-Python tests/oracle,
so the per-row invariant cannot drift. No I/O, no randomness.

Reference semantics:

* charset resolution (P4, /root/reference/lib/Loong/Scraper.pm:102-157):
  Content-Type header ``charset=`` param → ``<meta charset>`` /
  ``<meta http-equiv>`` scan → CSS ``@charset`` → quoted JS-attr
  ``charset="..."`` (the reference's _guess_encoding_javascript applies
  the same quoted charset regex to script payloads, Scraper.pm:106-117)
  → utf-8 fallback.
* parse (U1, /root/reference/lib/Loong/Scraper.pm:68-85): one page →
  ordered interleaved spans (text / media) + discovered links. The
  "DOM" is a small deterministic regex extractor — real-tag lxml/bs4
  are not in this container; the semantics (document order = offset,
  links in document order = link_idx) are the contract.
"""

from __future__ import annotations

import re

_CHARSET_HEADER = re.compile(r"charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", re.I)
_CHARSET_META = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", re.I
)
_CHARSET_CSS = re.compile(rb"@charset\s+[\"']([A-Za-z0-9_.:-]+)")
#: the JS form the reference sniffs (Scraper.pm:50 charset_re over JS):
#: a QUOTED charset= attr anywhere, e.g. <script charset="gbk">
_CHARSET_JS = re.compile(rb"charset\s*=\s*[\"']([A-Za-z0-9_.:-]+)[\"']", re.I)

#: label aliases → python codec names (the common real-web ones)
_CODEC_ALIASES = {
    "gb2312": "gbk",
    "iso-8859-1": "latin-1",
    "latin1": "latin-1",
    "utf8": "utf-8",
    "shift-jis": "shift_jis",
}


def normalize_charset(label: str) -> str:
    low = label.strip().lower()
    return _CODEC_ALIASES.get(low, low)


def sniff_charset(content_type: str | None, body: bytes | None) -> str:
    """Resolve a page's charset: header param → meta/css scan of the
    first 2 KiB → utf-8. Mirrors Scraper.pm:102-157 resolution order."""
    if content_type:
        m = _CHARSET_HEADER.search(content_type)
        if m:
            return normalize_charset(m.group(1))
    head = (body or b"")[:2048]
    m = _CHARSET_META.search(head) or _CHARSET_CSS.search(head) or _CHARSET_JS.search(head)
    if m:
        return normalize_charset(m.group(1).decode("ascii", "ignore"))
    return "utf-8"


def decode_body(content_type: str | None, body: bytes | None) -> str:
    """bytes → str via the sniffed charset; undecodable bytes are
    replaced (the reference's decode is likewise lossy-tolerant),
    unknown labels fall back to utf-8."""
    if body is None:
        return ""
    enc = sniff_charset(content_type, body)
    try:
        return body.decode(enc, errors="replace")
    except LookupError:
        return body.decode("utf-8", errors="replace")


_TAG = re.compile(
    r"<img[^>]*src=[\"']([^\"']+)[\"'][^>]*>"
    r"|<a[^>]*href=[\"']([^\"']+)[\"'][^>]*>"
    r"|<p>([^<]*)</p>"
)


def parse_html(url: str, body: str) -> list[dict]:
    """Deterministic HTML → interleaved spans + links. <p> → text span,
    <img src> → media span (document order = offset), <a href> → link
    (document order = link_idx)."""
    out: list[dict] = []
    offset = 0
    link_idx = 0
    for m in _TAG.finditer(body or ""):
        img, href, text = m.group(1), m.group(2), m.group(3)
        if img is not None:
            out.append(
                dict(url=url, out_kind="span", kind="media", text="", media_ref=img,
                     offset=offset, href=None, link_idx=None)
            )
            offset += 1
        elif href is not None:
            out.append(
                dict(url=url, out_kind="link", kind=None, text=None, media_ref=None,
                     offset=None, href=href, link_idx=link_idx)
            )
            link_idx += 1
        elif text is not None and text.strip():
            out.append(
                dict(url=url, out_kind="span", kind="text", text=text.strip(), media_ref="",
                     offset=offset, href=None, link_idx=None)
            )
            offset += 1
    return out


def render_html(spans: list[dict], links: list[str]) -> str:
    """Inverse of parse_html — fixtures render the synthetic corpus
    through this so the production parse path can be round-tripped."""
    parts = []
    for s in sorted(spans, key=lambda s: s["offset"]):
        if s["kind"] == "media":
            parts.append(f'<img src="{s["media_ref"]}">')
        else:
            parts.append(f"<p>{s['text']}</p>")
    for h in links:
        parts.append(f'<a href="{h}">x</a>')
    return "".join(parts)


def render_body(
    spans: list[dict], links: list[str], charset: str = "utf-8",
    declare: str = "none",
) -> bytes:
    """Render a page to BYTES in ``charset``. ``declare`` controls where
    the charset is discoverable: 'header' (caller puts it in the
    Content-Type), 'meta' (a <meta charset> tag is prepended), 'js' (a
    <script charset="..."> tag is the only signal — the reference's JS
    sniff form), or 'none' (undeclared — only correct for utf-8, the
    sniff fallback)."""
    html = render_html(spans, links)
    if declare == "meta":
        html = f'<meta charset="{charset}">' + html
    elif declare == "js":
        html = f'<script type="text/javascript" charset="{charset}"></script>' + html
    return html.encode(charset)
