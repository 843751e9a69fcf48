"""WARC/CDX archive sink: record serialization is byte-exact, CDX
offsets seek to real records in the written files, and the manifest
matches the files on disk byte-for-byte."""

import hashlib
import os

from pyspark.sql import functions as F

from loong_spark.warc import (
    assign_files,
    cdx_index,
    surt_key,
    uuid_hex,
    warc_records,
    warcinfo_bytes,
    write_warc_files,
)

DATE = "2026-01-01T00:00:00Z"


def _pages(spark):
    rows = [
        ("http://a.example/", 200, "text/html", b"<html>hello</html>"),
        ("http://a.example/x?q=1", 200, "text/html", "café body".encode()),
        ("http://b.a.example/deep/path", 301, "text/html", b""),
        ("http://c.example/miss", 404, "text/plain", b"gone"),
        # non-UTF8 binary payload: the block stays binary end-to-end
        ("http://c.example/bin", 200, "application/octet-stream", b"\xff\x00\x01\xfe"),
        ("http://c.example/odd", 418, "text/plain", b"teapot"),  # unmapped reason
    ]
    return spark.createDataFrame(
        rows, "url string, status int, content_type string, body binary"
    )


def test_record_serialization_exact(spark):
    recs = {r["url"]: r for r in warc_records(_pages(spark), warc_date=DATE).collect()}
    r = recs["http://a.example/"]
    body = b"<html>hello</html>"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: 18\r\n\r\n"
    )
    assert bytes(r["block"]) == http + body
    assert r["content_length"] == len(http) + len(body)
    assert r["record_length"] == len(r["header"].encode()) + r["content_length"] + 4
    assert r["block_digest"] == hashlib.sha256(http + body).hexdigest()
    assert r["payload_digest"] == hashlib.sha256(body).hexdigest()
    assert r["record_id"] == uuid_hex(hashlib.md5(b"http://a.example/").hexdigest())
    # header is a parseable WARC/1.1 header with the exact fields
    lines = r["header"].split("\r\n")
    assert lines[0] == "WARC/1.1"
    fields = dict(l.split(": ", 1) for l in lines[1:] if l)
    assert fields["WARC-Type"] == "response"
    assert fields["WARC-Target-URI"] == "http://a.example/"
    assert fields["WARC-Date"] == DATE
    assert int(fields["Content-Length"]) == r["content_length"]
    # unmapped status serializes with empty reason, still valid HTTP/1.1
    assert bytes(recs["http://c.example/odd"]["block"]).startswith(b"HTTP/1.1 418 \r\n")


def test_surt_key(spark):
    got = dict(
        _pages(spark)
        .select("url", surt_key(F.col("url")).alias("k"))
        .collect()
    )
    assert got["http://a.example/"] == "example,a)/"
    assert got["http://a.example/x?q=1"] == "example,a)/x?q=1"
    assert got["http://b.a.example/deep/path"] == "example,a,b)/deep/path"


def test_roundtrip_files_cdx_manifest(spark, tmp_path):
    out = str(tmp_path / "warc")
    recs = assign_files(warc_records(_pages(spark), warc_date=DATE), n_files=3)
    manifest = {r["file_id"]: r for r in write_warc_files(recs, out, warc_date=DATE).collect()}
    cdx = cdx_index(recs, warc_date=DATE).collect()
    assert len(cdx) == 6

    # manifest rows match the files on disk byte-for-byte
    for m in manifest.values():
        raw = open(os.path.join(out, m["filename"]), "rb").read()
        assert len(raw) == m["n_bytes"]
        assert hashlib.sha256(raw).hexdigest() == m["file_sha256"]
        assert raw.startswith(warcinfo_bytes(DATE))

    # every CDX row seeks to a real record whose bytes re-parse to the row
    for row in cdx:
        with open(os.path.join(out, row["filename"]), "rb") as f:
            f.seek(row["offset"])
            rec = f.read(row["length"])
        assert rec.startswith(b"WARC/1.1\r\n")
        assert rec.endswith(b"\r\n\r\n")
        head, _, rest = rec.partition(b"\r\n\r\n")
        fields = dict(
            l.split(": ", 1) for l in head.decode().split("\r\n")[1:] if ": " in l
        )
        assert fields["WARC-Target-URI"] == row["url"]
        block = rest[:-4]
        assert len(block) == int(fields["Content-Length"])
        assert "sha256:" + hashlib.sha256(block).hexdigest() == fields["WARC-Block-Digest"]
        assert row["digest"] == hashlib.sha256(block).hexdigest()
        assert row["ts"] == "20260101000000"

    # file record counts agree between manifest and CDX
    by_file = {}
    for row in cdx:
        by_file[row["filename"]] = by_file.get(row["filename"], 0) + 1
    assert {m["filename"]: m["n_records"] for m in manifest.values()} == by_file


def test_deterministic_rerun(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    recs = assign_files(warc_records(_pages(spark), warc_date=DATE), n_files=2)
    ma = {r["filename"]: r["file_sha256"] for r in write_warc_files(recs, a, warc_date=DATE).collect()}
    mb = {r["filename"]: r["file_sha256"] for r in write_warc_files(recs, b, warc_date=DATE).collect()}
    assert ma == mb  # same input -> byte-identical archives


def test_cli_warc_export(capsys, spark, tmp_path):
    """Product surface: parse-mode crawl with --cache-raw, then `warc`
    exports real archives whose CDX offsets seek to real records; a
    warehouse without raw bytes exits 2 cleanly."""
    import json

    from loong_spark import cli

    wh, out = str(tmp_path / "wh"), str(tmp_path / "arch")
    assert cli.main([
        "crawl", "--warehouse", wh, "--demo", "--parse", "--cache-raw",
        "--demo-pages", "40", "--max-batches", "2",
    ]) == 0
    capsys.readouterr()
    assert cli.main(["warc", "--warehouse", wh, "--out", out, "--files", "2"]) == 0
    manifest = [json.loads(l) for l in capsys.readouterr().out.splitlines()
                if l.startswith("{")]
    assert manifest and sum(m["n_records"] for m in manifest) > 0
    for m in manifest:
        raw = open(os.path.join(out, m["filename"]), "rb").read()
        assert len(raw) == m["n_bytes"]
        assert hashlib.sha256(raw).hexdigest() == m["file_sha256"]
    cdx = spark.read.parquet(os.path.join(out, "cdx")).collect()
    assert len(cdx) == sum(m["n_records"] for m in manifest)
    for row in cdx:
        with open(os.path.join(out, row["filename"]), "rb") as f:
            f.seek(row["offset"])
            rec = f.read(row["length"])
        assert rec.startswith(b"WARC/1.1\r\n") and rec.endswith(b"\r\n\r\n")
        assert f"WARC-Target-URI: {row['url']}\r\n".encode() in rec

    # span-mode warehouse (no raw bytes kept) → clean exit 2
    wh2 = str(tmp_path / "wh2")
    assert cli.main([
        "crawl", "--warehouse", wh2, "--demo", "--demo-pages", "20",
        "--max-batches", "1",
    ]) == 0
    capsys.readouterr()
    assert cli.main(["warc", "--warehouse", wh2, "--out", str(tmp_path / "x")]) == 2
    assert "raw_pages" in capsys.readouterr().err


def test_gz_members_seekable(spark, tmp_path):
    """.warc.gz layout: every record its own deterministic gzip member —
    seeking a returned offset and decompressing ONE member yields the
    exact record; the aggregated manifest matches the files on disk."""
    import gzip

    from loong_spark.warc import write_warc_gz_files

    out = str(tmp_path / "gz")
    recs = assign_files(warc_records(_pages(spark), warc_date=DATE), n_files=2)
    cdx = write_warc_gz_files(recs, out, warc_date=DATE).collect()
    assert len(cdx) == 6
    for row in cdx:
        with open(os.path.join(out, row["filename"]), "rb") as f:
            f.seek(row["offset"])
            member = f.read(row["length"])
        rec = gzip.decompress(member)
        assert rec.startswith(b"WARC/1.1\r\n") and rec.endswith(b"\r\n\r\n")
        assert f"WARC-Target-URI: {row['url']}\r\n".encode() in rec
        head, _, rest = rec.partition(b"\r\n\r\n")
        block = rest[:-4]
        assert hashlib.sha256(block).hexdigest() == row["digest"]
    # per-file byte totals and sha256 agree with the concatenated members
    by_file = {}
    for row in cdx:
        by_file.setdefault(row["filename"], []).append(row)
    for name, rows in by_file.items():
        raw = open(os.path.join(out, name), "rb").read()
        assert len(raw) == max(r["offset"] + r["length"] for r in rows)
        assert hashlib.sha256(raw).hexdigest() == rows[0]["file_sha256"]
        # whole-file decompression also works (members concatenate)
        assert gzip.decompress(raw).count(b"WARC/1.1\r\n") == len(rows) + 1

    # determinism: a second write produces byte-identical archives
    out2 = str(tmp_path / "gz2")
    cdx2 = write_warc_gz_files(recs, out2, warc_date=DATE).collect()
    assert {r["file_sha256"] for r in cdx} == {r["file_sha256"] for r in cdx2}
