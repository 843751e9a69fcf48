"""Site-transform library (P9/P10/P11): cipher decode parity with the
pure-Python reference twin, document.write unwrap, form-URL synthesis."""

import random
import string

from pyspark.sql import functions as F

from loong_spark.sites import (
    ALPHABET,
    decode_comic_image_col,
    decode_comic_image_py,
    encode_comic_image_col,
    file_redirect_col,
    getfile_url_col,
    photo_url_col,
    unwrap_document_write_col,
)


def encode_py(plain: str, k: str, f: str, filler_x: str) -> str:
    """Python encoder twin: char codes joined by f, digits mapped to key
    chars, then key + separator + filler (filler length = alphabet
    position of its final letter, matching the decoder's layout)."""
    xi = ALPHABET.index(filler_x) + 1
    body = f.join(str(ord(c)) for c in plain)
    body = "".join(k[int(c)] if c.isdigit() else c for c in body)
    # layout: body(L-xi-12) | sk(11) | filler(xi+1, last char = x)
    filler = "_" * xi + filler_x
    return body + k + f + filler


def _rand_cipher_case(rnd: random.Random):
    plain = "".join(
        rnd.choice(string.ascii_lowercase + string.digits + ":/._-")
        for _ in range(rnd.randint(1, 40))
    )
    # key: 10 distinct non-digit chars; separator outside the key
    pool = list(string.ascii_uppercase + "!@#$%^&*()")
    rnd.shuffle(pool)
    k, f = "".join(pool[:10]), pool[10]
    x = rnd.choice(ALPHABET)
    return plain, encode_py(plain, k, f, x)


def test_decode_py_inverts_encode():
    rnd = random.Random(5)
    for _ in range(200):
        plain, enc = _rand_cipher_case(rnd)
        assert decode_comic_image_py(enc) == plain


def test_decode_col_matches_python_twin(spark):
    rnd = random.Random(9)
    cases = [_rand_cipher_case(rnd) for _ in range(150)]
    df = spark.createDataFrame(
        [(i, enc, plain) for i, (plain, enc) in enumerate(cases)],
        "id int, enc string, plain string",
    )
    rows = df.select(
        "id", "plain", decode_comic_image_col(F.col("enc")).alias("dec")
    ).collect()
    for r in rows:
        assert r["dec"] == r["plain"], r["id"]


def test_encode_col_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "http://cdn.example.com/a/b_01.jpg"), (2, "x"), (3, "vol_06/99770_0030.JPG")],
        "id int, plain string",
    )
    out = df.select(
        "id", "plain",
        decode_comic_image_col(encode_comic_image_col(F.col("plain"))).alias("dec"),
    ).collect()
    assert all(r["dec"] == r["plain"] for r in out)


def test_photo_url_domain_selection(spark):
    df = spark.createDataFrame(
        [
            # multi-domain list + ?=N query → pick index N
            (1, "http://h.example.com/comic?=1", "http://c0.example.com|http://c1.example.com/"),
            # no query param → index 0
            (2, "http://h.example.com/comic", "http://c0.example.com|http://c1.example.com"),
            # single-domain list always wins
            (3, "http://h.example.com/comic?=7", "http://only.example.com/"),
        ],
        "id int, url string, hd string",
    )
    enc = encode_comic_image_col(F.lit("img/1.jpg"))
    got = {r["id"]: r["u"] for r in df.select(
        "id", photo_url_col(F.col("url"), F.col("hd"), enc).alias("u")
    ).collect()}
    assert got[1] == "http://c1.example.com/img/1.jpg"  # trailing slash stripped
    assert got[2] == "http://c0.example.com/img/1.jpg"
    assert got[3] == "http://only.example.com/img/1.jpg"


def test_unwrap_document_write(spark):
    js = 'var x=1;document.write("<li class=\\"game-item \\">NBA</li>");x=2;'
    df = spark.createDataFrame([(1, js)], "id int, js string")
    got = df.select(unwrap_document_write_col(F.col("js")).alias("h")).collect()[0]["h"]
    assert got == '<li class="game-item ">NBA</li>'


def test_getfile_url_synthesis(spark):
    html = (
        "so.addVariable('file','198333');so.addVariable('mp4','0');"
        "so.addVariable('seccode','9d69d3f3');so.addVariable('max_vid','198435');"
    )
    df = spark.createDataFrame([(1, html)], "id int, html string")
    got = df.select(
        getfile_url_col(F.lit("http://v.example.com"), F.col("html")).alias("u")
    ).collect()[0]["u"]
    assert got == (
        "http://v.example.com/getfile.php?VID=198333&mp4=0"
        "&seccode=9d69d3f3&max_vid=198435"
    )


def test_ua_pool(spark):
    from loong_spark.sites import UA_POOL, ua_pool_col

    df = spark.createDataFrame(
        [(f"http://h{i}.example/p",) for i in range(200)], "url string"
    )
    picks = df.select(
        ua_pool_col(F.col("url"), "web").alias("web"),
        ua_pool_col(F.col("url"), "mobile").alias("mob"),
    ).collect()
    assert all(r["web"] in UA_POOL["web"] and r["mob"] in UA_POOL["mobile"] for r in picks)
    # every pool member gets picked across 200 urls (uniform-ish spread)
    assert {r["web"] for r in picks} == set(UA_POOL["web"])
    # deterministic: same url → same UA on a second evaluation
    again = df.select(ua_pool_col(F.col("url"), "web").alias("web")).collect()
    assert [r["web"] for r in picks] == [r["web"] for r in again]


def test_term_lookup(spark):
    from loong_spark.sites import NBA_TERMS, PLAYER_TERMS, term_lookup_col

    df = spark.createDataFrame(
        [(1, "平均得分"), (2, "平均助攻"), (3, "没有这个"), (4, "身高")],
        "id int, label string",
    )
    got = {r["id"]: (r["nba"], r["player"]) for r in df.select(
        "id",
        term_lookup_col(F.col("label"), NBA_TERMS).alias("nba"),
        term_lookup_col(F.col("label"), PLAYER_TERMS).alias("player"),
    ).collect()}
    assert got[1] == ("PPG", None)
    assert got[2] == ("APG", None)
    assert got[3] == (None, None)
    assert got[4] == (None, "height")


def test_normalize_date(spark):
    from loong_spark.sites import normalize_date_col

    df = spark.createDataFrame(
        [(1, "更新: 2013/7/4 rating 8.9"), (2, "no date"), (3, "x 1999/12/31 y")],
        "id int, t string",
    )
    got = {r["id"]: r["d"] for r in
           df.select("id", normalize_date_col(F.col("t")).alias("d")).collect()}
    assert got[1] == "2013-07-04" and got[2] is None and got[3] == "1999-12-31"


def test_site_dispatch(spark):
    from loong_spark.sites import site_dispatch

    video_html = "so.addVariable('file','42');so.addVariable('mp4','1');" \
                 "so.addVariable('seccode','s3c');so.addVariable('max_vid','77');"
    pages = spark.createDataFrame(
        [
            ("http://v.example.com/view_video.php?viewkey=abc", video_html),
            ("http://v.example.com/getfile.php?VID=42", "file=http%3A%2F%2Fcdn%2F42.mp4"),
            ("http://j.example.com/data.js?x=1",
             'document.write("<li>\\"x\\"</li>");'),
            ("http://other.example.com/page", "<html></html>"),
        ],
        "url string, body string",
    )
    got = {r["url"]: r for r in site_dispatch(pages).collect()}
    v = got["http://v.example.com/view_video.php?viewkey=abc"]
    assert v["route"] == "video_page"
    assert v["next_url"] == (
        "http://v.example.com/getfile.php?VID=42&mp4=1&seccode=s3c&max_vid=77"
    )
    g = got["http://v.example.com/getfile.php?VID=42"]
    assert g["route"] == "getfile_redirect" and g["next_url"] == "http://cdn/42.mp4"
    j = got["http://j.example.com/data.js?x=1"]
    assert j["route"] == "js_wrapped" and j["unwrapped_html"] == '<li>"x"</li>'
    o = got["http://other.example.com/page"]
    assert o["route"] is None and o["next_url"] is None


def test_file_redirect(spark):
    df = spark.createDataFrame(
        [(1, "file=http%3A%2F%2Fcdn%2Fv.mp4&rest"), (2, "no match here")],
        "id int, html string",
    )
    got = {r["id"]: r["u"] for r in
           df.select("id", file_redirect_col(F.col("html")).alias("u")).collect()}
    assert got[1] == "http://cdn/v.mp4&rest"
    assert got[2] is None
