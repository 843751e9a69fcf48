"""§3.3 one-call Lite flow (reference Lite.pm:14-88 + script/tumblr.pl):
route dispatch → parse → media manifest in one composition; js_wrapped
routes' unwrapped documents feed the parser (the reference's second
scrape pass)."""

from loong_spark.lite import lite_scrape
from loong_spark.rules import render_html


def test_lite_scrape_end_to_end(spark):
    spans = [
        {"kind": "text", "text": "hello world", "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "http://cdn.example/a.jpg", "offset": 1},
    ]
    plain = render_html(spans, ["http://h1.example/next"])
    # js_wrapped route: payload only readable after the unwrap
    inner = render_html(
        [{"kind": "media", "text": "", "media_ref": "http://cdn.example/b.mp4", "offset": 0}],
        [],
    )
    js = f'document.write("{inner}")'
    # both pages reference a.jpg → the manifest dedups it (n_refs=2)
    plain2 = render_html(
        [{"kind": "media", "text": "", "media_ref": "http://cdn.example/a.jpg", "offset": 0}],
        [],
    )
    pages = spark.createDataFrame(
        [
            ("http://h1.example/p/1", plain),
            ("http://h1.example/p/2", plain2),
            ("http://h1.example/vendor/app.js?v=3", js),
        ],
        "url string, body string",
    )

    out = lite_scrape(pages, fetch=True)
    routed = {r.url: r for r in out["routed"].collect()}
    assert routed["http://h1.example/vendor/app.js?v=3"].route == "js_wrapped"
    assert routed["http://h1.example/p/1"].route is None  # no site route

    spans_by_url = {r.url: r.spans for r in out["spans"].collect()}
    assert [s.text for s in spans_by_url["http://h1.example/p/1"] if s.kind == "text"] == [
        "hello world"
    ]
    # the unwrapped js payload parsed: its media span is visible
    assert [
        s.media_ref for s in spans_by_url["http://h1.example/vendor/app.js?v=3"]
    ] == ["http://cdn.example/b.mp4"]

    links = out["links"].collect()
    assert [(r.parent, r.href) for r in links] == [
        ("http://h1.example/p/1", "http://h1.example/next")
    ]

    media = {r.media_ref: r.n_refs for r in out["media"].collect()}
    assert media == {"http://cdn.example/a.jpg": 2, "http://cdn.example/b.mp4": 1}
    # dedup-before-download: one blob per distinct ref
    blobs = out["blobs"].collect()
    assert {b.media_ref for b in blobs} == set(media)
