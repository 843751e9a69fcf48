"""parse_core: charset sniff/decode (P4) + HTML parse round-trips.

The charset resolution order mirrors the reference scraper
(/root/reference/lib/Loong/Scraper.pm:102-157): Content-Type header →
meta/css scan → utf-8 fallback. Pure-Python — the same functions run
inside the Spark mapInPandas stage, so this IS the parity test."""

from loong_spark.gen import TINY, GraphParams, page_body, page_charset, page_content_type, page_out_links, page_spans
from loong_spark.parse_core import (
    decode_body,
    parse_html,
    render_body,
    render_html,
    sniff_charset,
)

SPANS = [
    {"kind": "text", "text": "café zürich", "media_ref": "", "offset": 0},
    {"kind": "media", "text": "", "media_ref": "media://h/img1.jpg", "offset": 1},
    {"kind": "text", "text": "队列 爬虫", "media_ref": "", "offset": 2},
]
LINKS = ["/a", "http://h9.example/b#frag", "  ../c "]


def test_sniff_header_wins_over_meta():
    body = b'<meta charset="latin-1"><p>x</p>'
    assert sniff_charset("text/html; charset=gbk", body) == "gbk"


def test_sniff_meta_and_css_and_fallback():
    assert sniff_charset("text/html", b'<meta charset="GB2312"><p>x</p>') == "gbk"
    assert (
        sniff_charset("text/html", b"<meta http-equiv=Content-Type content=\"text/html; charset=ISO-8859-1\">")
        == "latin-1"
    )
    assert sniff_charset("text/html", b'@charset "utf8"; body{}') == "utf-8"
    assert sniff_charset("text/html", b"<p>plain</p>") == "utf-8"
    assert sniff_charset(None, None) == "utf-8"


def test_decode_roundtrip_all_charsets():
    html = render_html(SPANS, LINKS)
    for cs, declare, ctype in [
        ("utf-8", "none", "text/html"),
        ("gbk", "meta", "text/html"),
        ("gbk", "header", "text/html; charset=gbk"),
        ("latin-1", "header", "text/html; charset=latin-1"),
    ]:
        spans = SPANS if cs != "latin-1" else SPANS[:2]  # CJK not in latin-1
        body = render_body(spans, LINKS, cs, declare)
        decoded = decode_body(ctype, body)
        parsed = parse_html("http://h0.example/", decoded)
        got_spans = [
            {"kind": r["kind"], "text": r["text"], "media_ref": r["media_ref"], "offset": r["offset"]}
            for r in parsed
            if r["out_kind"] == "span"
        ]
        got_links = [r["href"] for r in parsed if r["out_kind"] == "link"]
        assert got_spans == spans, (cs, declare)
        assert got_links == LINKS, (cs, declare)


def test_unknown_charset_label_falls_back():
    assert decode_body("text/html; charset=bogus-enc", "café".encode()) == "café"


def test_fixture_pages_roundtrip_through_bytes():
    """Every TINY page body decodes+parses back to its generating spans
    and raw hrefs — the invariant the parse-mode pipeline relies on."""
    p = GraphParams(**{**TINY.__dict__})
    n_non_utf8 = 0
    for pid in range(p.n_pages):
        ctype = page_content_type(p, pid)
        if not ctype.startswith("text/html"):
            continue
        cs, _ = page_charset(p, pid)
        n_non_utf8 += cs != "utf-8"
        parsed = parse_html("u", decode_body(ctype, page_body(p, pid)))
        got_spans = [
            {"kind": r["kind"], "text": r["text"], "media_ref": r["media_ref"], "offset": r["offset"]}
            for r in parsed
            if r["out_kind"] == "span"
        ]
        got_links = [r["href"] for r in parsed if r["out_kind"] == "link"]
        assert got_spans == page_spans(p, pid), pid
        assert got_links == page_out_links(p, pid), pid
    assert n_non_utf8 > 0  # the fixture actually exercises non-utf8 decode


def test_sniff_js_charset_attr():
    """The reference's JS sniff form (Scraper.pm:106-117, quoted
    charset_re over script payloads): a <script charset="gbk"> attr is
    the ONLY signal — meta/css absent — and must resolve; the quoted
    requirement means a bare header-style 'charset=x' body token does
    NOT match (that form is header-only)."""
    js_page = b'<script type="text/javascript" charset="gbk"></script><p>x</p>'
    assert sniff_charset("text/html", js_page) == "gbk"
    assert sniff_charset("text/html", b"<p>charset=latin-1 looks like text</p>") == "utf-8"
    # resolution order: meta (earlier tier) beats a JS attr
    both = b'<script charset="latin-1"></script><meta charset="gbk">'
    assert sniff_charset("text/html", both) == "gbk"


def test_decode_js_declared_gbk_roundtrip():
    """render_body(declare='js') → bytes whose only charset signal is
    the script attr → decode_body recovers the exact spans text."""
    body = render_body(SPANS, LINKS, charset="gbk", declare="js")
    decoded = decode_body("text/html", body)
    parsed = parse_html("u", decoded)
    texts = [p["text"] for p in parsed if p["out_kind"] == "span" and p["kind"] == "text"]
    assert texts == ["café zürich", "队列 爬虫"]
