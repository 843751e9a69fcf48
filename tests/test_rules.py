"""Route dispatch (F5) + mapInPandas page parser (U1) round-trip."""

from pyspark.sql import functions as F

from loong_spark.gen import TINY, build_graph
from loong_spark.rules import (
    Rule,
    links_of,
    parse_pages,
    render_html,
    route_match_col,
    spans_of,
)


def test_route_first_match_wins(spark):
    rules = [
        Rule(r"/p/\d+$", "page"),
        Rule(r"/d/", "detail"),
        Rule(r".*", "fallback"),
    ]
    df = spark.createDataFrame(
        [("http://h1.example/p/5",), ("http://h1.example/d/3/9",), ("http://h1.example/",)],
        "url string",
    )
    got = {r["url"]: r["rule"] for r in
           df.select("url", route_match_col(F.col("url"), rules).alias("rule")).collect()}
    assert got["http://h1.example/p/5"] == 0       # declaration order pinned
    assert got["http://h1.example/d/3/9"] == 1
    assert got["http://h1.example/"] == 2
    empty = spark.createDataFrame([("http://x/",)], "url string")
    assert empty.select(route_match_col(F.col("url"), rules[:2]).alias("r")).collect()[0]["r"] == -1


def test_parse_roundtrip_corpus(spark):
    """Render the generator's spans+links to HTML, parse with the
    production mapInPandas path, and recover the exact span sequence
    (kind, text, media_ref, order) + links in order."""
    pages = list(build_graph(TINY).values())[:20]
    rows = [(p["url"], render_html(p["body_spans"], p["out_links"])) for p in pages]
    df = spark.createDataFrame(rows, "url string, body string")
    parsed = parse_pages(df).cache()

    got_spans = {r["url"]: r["spans"] for r in spans_of(parsed).collect()}
    for p in pages:
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in p["body_spans"]]
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got_spans.get(p["url"], [])]
        assert got == want, p["url"]

    got_links = {}
    for r in links_of(parsed).collect():
        got_links.setdefault(r["parent"], []).append((r["link_idx"], r["href"]))
    for p in pages:
        want = list(p["out_links"])  # parser keeps raw hrefs; canon filters junk later
        got = [h for _, h in sorted(got_links.get(p["url"], []))]
        assert got == want, p["url"]
