"""WARC/1.1 + CDX archive sink — the interchange format a real crawl ships.

The reference stores scraped rows in MySQL/Mongo (SURVEY.md §2 S5/S9,
/root/reference/lib/Loong/Mango.pm) and has no archival export; every
production web crawl at 100 TB (Common Crawl, IA) instead ships
**WARC** (ISO 28500) files plus a **CDX** byte-offset index so any
record is seekable without scanning the archive. This module adds that
sink Spark-first:

* :func:`warc_records` — page rows → fully-formed WARC response
  records, ENTIRELY JVM-side (concat / length / sha2 / regexp — no
  Python in the record builder). Output carries the exact serialized
  header string, the binary block, and the record's total byte length,
  so downstream offset math is pure arithmetic.
* :func:`assign_files` — records → target archive file ids (hash
  partitioning on url; any deterministic key works). One file = one
  write task = one task's stream — the distributed-archiver shape.
* :func:`cdx_index` — per-record (file, offset, length) via a window
  over each file's pinned record order, plus the SURT-style url key
  real CDX tooling sorts on. Offsets account for the leading warcinfo
  record byte-for-byte.
* :func:`write_warc_files` — the sink: one grouped-map task per file
  streams warcinfo + its records (same pinned order) to
  ``<prefix>-<file_id>.warc`` and returns a manifest row
  (n_records, n_bytes, file sha256). Byte-level agreement between the
  written files, the manifest, and the CDX offsets is pytest-enforced
  (tests/test_warc.py seeks each CDX offset in the real file and
  re-parses the record found there).

Scale shape: the record builder is one codegen projection over the
pages scan (no shuffle); file assignment + the offset window shuffle
once on ``file_id`` (the same exchange the grouped-map writer needs, so
AQE reuses it); each writer task holds one file's records — file count
is the knob that bounds task memory (Common Crawl caps ~1 GiB/file the
same way). Nothing driver-side.

Determinism: record ids derive from md5(url), the capture timestamp is
caller-supplied (the crawl clock in production, a pinned literal in
tests/oracles), and within-file order is (urlkey, url) — so the same
input always produces byte-identical archives, which is what makes the
DuckDB oracle able to reproduce content lengths, digests, and offsets
exactly.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

CRLF = "\r\n"

#: HTTP reason phrases the simulator's status fixtures use; anything
#: else serializes with an empty reason (valid per RFC 9112 §4).
REASONS = {
    200: "OK",
    301: "Moved Permanently",
    302: "Found",
    404: "Not Found",
    500: "Internal Server Error",
}

#: pinned warcinfo payload — constant across files ON PURPOSE: a
#: filename-dependent warcinfo would give every archive a different
#: leading-record length and the CDX offset base would stop being one
#: literal the oracle can reproduce.
WARCINFO_FIELDS = "software: loong-spark/1.0\r\nformat: WARC File Format 1.1\r\n"


def warcinfo_bytes(warc_date: str) -> bytes:
    """The archive's leading warcinfo record, serialized. Pure Python —
    it's per-FILE (a handful of bytes written once per writer task),
    not per-row; the per-row path below never leaves the JVM."""
    payload = WARCINFO_FIELDS.encode()
    rid = uuid_hex(hashlib.md5(b"warcinfo:" + payload).hexdigest())
    header = (
        f"WARC/1.1{CRLF}"
        f"WARC-Type: warcinfo{CRLF}"
        f"WARC-Record-ID: <urn:uuid:{rid}>{CRLF}"
        f"WARC-Date: {warc_date}{CRLF}"
        f"Content-Type: application/warc-fields{CRLF}"
        f"Content-Length: {len(payload)}{CRLF}{CRLF}"
    )
    return header.encode() + payload + b"\r\n\r\n"


def uuid_hex(md5_hex: str) -> str:
    """32 hex chars → 8-4-4-4-12 uuid layout (deterministic record ids
    from content, the Common Crawl practice for reproducible archives)."""
    h = md5_hex
    return f"{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def _uuid_col(md5_hex: Column) -> Column:
    return F.concat_ws(
        "-",
        F.substring(md5_hex, 1, 8),
        F.substring(md5_hex, 9, 4),
        F.substring(md5_hex, 13, 4),
        F.substring(md5_hex, 17, 4),
        F.substring(md5_hex, 21, 12),
    )


def surt_key(url: Column) -> Column:
    """SURT-style sort key: reversed host labels + ')' + path — what CDX
    indexes sort on so one host's records cluster. 'http://a.b.c/x' →
    'c,b,a)/x'."""
    host = F.regexp_extract(url, r"^[a-z]+://([^/]*)", 1)
    path = F.regexp_extract(url, r"^[a-z]+://[^/]*(/.*)?$", 1)
    return F.concat(
        F.array_join(F.reverse(F.split(F.lower(host), r"\.")), ","),
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
    )


def _reason_col(status: Column) -> Column:
    pairs = [x for kv in REASONS.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    return F.coalesce(F.element_at(F.create_map(*pairs), status), F.lit(""))


def warc_records(
    pages: DataFrame,
    url_col: str = "url",
    status_col: str = "status",
    ctype_col: str = "content_type",
    body_col: str = "body",
    warc_date: str = "2026-01-01T00:00:00Z",
) -> DataFrame:
    """Fetched pages → serialized WARC/1.1 response records, one codegen
    projection (concat/length/sha2 — no shuffle, no Python).

    ``body_col`` may be binary (the production PAGES shape) or string;
    strings serialize as their UTF-8 bytes. Output columns:

    - ``url``, ``urlkey`` (SURT sort key), ``record_id`` (uuid from
      md5(url)), ``status``
    - ``header`` (the WARC header string, ready to write),
      ``block`` (binary: HTTP status line + headers + payload)
    - ``content_length`` (block bytes), ``record_length`` (total record
      bytes incl. header and the closing CRLF CRLF)
    - ``block_digest`` / ``payload_digest`` (sha256 hex of block / body)

    ``record_length`` is what CDX offset arithmetic sums — it is exact
    by construction because the header string itself is a column.
    """
    url = F.col(url_col)
    status = F.col(status_col)
    body = F.col(body_col).cast("binary")
    http_head = F.concat(
        F.lit("HTTP/1.1 "),
        status.cast("string"),
        F.lit(" "),
        _reason_col(status),
        F.lit(CRLF),
        F.lit("Content-Type: "),
        F.col(ctype_col),
        F.lit(CRLF),
        F.lit("Content-Length: "),
        F.octet_length(body).cast("string"),
        F.lit(CRLF + CRLF),
    )
    block = F.concat(http_head.cast("binary"), body)
    rid = _uuid_col(F.md5(url))
    content_length = F.octet_length(block)
    header = F.concat(
        F.lit("WARC/1.1" + CRLF),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Record-ID: <urn:uuid:"), rid, F.lit(">" + CRLF),
        F.lit("WARC-Date: " + warc_date + CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(CRLF),
        F.lit("Content-Type: application/http;msgtype=response" + CRLF),
        F.lit("WARC-Block-Digest: sha256:"), F.sha2(block, 256), F.lit(CRLF),
        F.lit("WARC-Payload-Digest: sha256:"), F.sha2(body, 256), F.lit(CRLF),
        F.lit("Content-Length: "), content_length.cast("string"),
        F.lit(CRLF + CRLF),
    )
    return pages.select(
        url.alias("url"),
        surt_key(url).alias("urlkey"),
        rid.alias("record_id"),
        status.alias("status"),
        header.alias("header"),
        block.alias("block"),
        content_length.alias("content_length"),
        (F.octet_length(header) + content_length + F.lit(4)).alias("record_length"),
        F.sha2(block, 256).alias("block_digest"),
        F.sha2(body, 256).alias("payload_digest"),
    )


def assign_files(records: DataFrame, n_files: int, file_id: Column | None = None) -> DataFrame:
    """Attach the target archive file id. Default: hash-partition on url
    (uniform across files regardless of host skew — one hot host never
    concentrates into one writer task). Callers needing an
    oracle-reproducible or locality-preserving layout pass their own
    ``file_id`` expression."""
    if n_files <= 0:
        raise ValueError(f"n_files must be > 0, got {n_files}")
    fid = file_id if file_id is not None else F.pmod(F.xxhash64("url"), F.lit(n_files))
    return records.withColumn("file_id", fid.cast("int"))


def cdx_index(records: DataFrame, warc_date: str = "2026-01-01T00:00:00Z", prefix: str = "loong") -> DataFrame:
    """Per-record byte offsets into the target archives — the CDX index.

    One window over each file's pinned record order (urlkey, url — the
    SAME order write_warc_files streams), summing the preceding records'
    exact ``record_length``; the leading warcinfo record's bytes shift
    every offset by one constant. The shuffle key is ``file_id`` — the
    identical exchange the writer itself needs."""
    base = len(warcinfo_bytes(warc_date))
    w = (
        Window.partitionBy("file_id")
        .orderBy("urlkey", "url")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts = warc_date.replace("-", "").replace(":", "").replace("T", "").replace("Z", "")
    return records.select(
        "urlkey",
        F.lit(ts).alias("ts"),
        "url",
        F.concat(F.lit(prefix + "-"), F.lpad(F.col("file_id").cast("string"), 5, "0"), F.lit(".warc")).alias("filename"),
        (F.lit(base) + F.coalesce(F.sum("record_length").over(w), F.lit(0))).alias("offset"),
        F.col("record_length").alias("length"),
        "status",
        F.col("block_digest").alias("digest"),
    )


MANIFEST = T.StructType(
    [
        T.StructField("file_id", T.IntegerType(), False),
        T.StructField("filename", T.StringType(), False),
        T.StructField("n_records", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("file_sha256", T.StringType(), False),
    ]
)


def write_warc_files(
    records: DataFrame,
    out_dir: str,
    prefix: str = "loong",
    warc_date: str = "2026-01-01T00:00:00Z",
) -> DataFrame:
    """The sink: one grouped-map task per archive file streams
    warcinfo + that file's records — (urlkey, url) order, byte-identical
    to what cdx_index priced — to ``out_dir/<prefix>-<file_id>.warc``
    and returns its manifest row.

    Task memory is one file's records (bound it with the file count);
    the shuffle is the same file_id exchange as the index. ``out_dir``
    must be a filesystem visible to executors (local dir here; an
    object-store mount on a cluster)."""
    import os

    info = warcinfo_bytes(warc_date)

    def write_one(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        name = f"{prefix}-{fid:05d}.warc"
        pdf = pdf.sort_values(["urlkey", "url"], kind="mergesort")
        h = hashlib.sha256()
        n = 0
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, name), "wb") as f:
            for chunk in (info, *(
                bytes(r.header, "utf-8") + bytes(r.block) + b"\r\n\r\n"
                for r in pdf.itertuples()
            )):
                f.write(chunk)
                h.update(chunk)
                n += len(chunk)
        return pd.DataFrame(
            {
                "file_id": [fid],
                "filename": [name],
                "n_records": [len(pdf)],
                "n_bytes": [n],
                "file_sha256": [h.hexdigest()],
            }
        )

    return records.select(
        "file_id", "urlkey", "url", "header", "block"
    ).groupBy("file_id").applyInPandas(write_one, schema=MANIFEST)


GZ_CDX = T.StructType(
    [
        T.StructField("file_id", T.IntegerType(), False),
        T.StructField("filename", T.StringType(), False),
        T.StructField("urlkey", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("file_sha256", T.StringType(), False),
    ]
)


def _gz_member(data: bytes) -> bytes:
    """One DETERMINISTIC gzip member (mtime=0, no filename): the
    member-per-record layout readers rely on to decompress a single
    record from a seek — Common Crawl's .warc.gz shape."""
    import gzip
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(data)
    return buf.getvalue()


def write_warc_gz_files(
    records: DataFrame,
    out_dir: str,
    prefix: str = "loong",
    warc_date: str = "2026-01-01T00:00:00Z",
) -> DataFrame:
    """Compressed sink: ``<prefix>-<file_id>.warc.gz`` with EVERY record
    (and the leading warcinfo) its own gzip member — a reader seeks a
    CDX offset and decompresses exactly one member, never the file.

    Unlike write_warc_files + cdx_index (where offsets are pure
    arithmetic the DuckDB oracle restates), compressed member offsets
    exist only after compression, so this writer RETURNS the per-record
    CDX rows itself (offset/length of each member, plus the file
    sha256); the manifest is an aggregation of them. Same task shape:
    one file per grouped-map task, same pinned (urlkey, url) order.
    Byte-level agreement is pytest-verified by seeking the written
    files (tests/test_warc.py)."""
    import os

    info_gz = _gz_member(warcinfo_bytes(warc_date))

    def write_one(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        name = f"{prefix}-{fid:05d}.warc.gz"
        pdf = pdf.sort_values(["urlkey", "url"], kind="mergesort")
        h = hashlib.sha256()
        rows = []
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(info_gz)
            h.update(info_gz)
            pos = len(info_gz)
            for r in pdf.itertuples():
                member = _gz_member(
                    bytes(r.header, "utf-8") + bytes(r.block) + b"\r\n\r\n"
                )
                f.write(member)
                h.update(member)
                rows.append((r.urlkey, r.url, pos, len(member), r.block_digest))
                pos += len(member)
        sha = h.hexdigest()
        return pd.DataFrame(
            [
                {
                    "file_id": fid,
                    "filename": name,
                    "urlkey": uk,
                    "url": u,
                    "offset": off,
                    "length": ln,
                    "digest": dg,
                    "file_sha256": sha,
                }
                for uk, u, off, ln, dg in rows
            ]
        )

    return records.select(
        "file_id", "urlkey", "url", "header", "block", "block_digest"
    ).groupBy("file_id").applyInPandas(write_one, schema=GZ_CDX)
