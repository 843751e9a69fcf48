"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship frontier-scheduling query at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 +
training-data ops); each callable is (spark, sf_dir) → DataFrame.
``oracle_sql()`` — exact DuckDB ANSI-SQL equivalents. Non-SQL-expressible
ops (pipeline e2e, ANN, multimodal pandas-UDF stages) omit the oracle and
are covered by pytest golden tests instead (tests/test_pipeline_e2e.py).

Column names/types are aligned pairwise; every computed column is aliased
identically on both sides. Float-summing queries quantize to integers
(cents) or round(…, 6) AFTER identical arithmetic so cross-engine hashes
match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from loong_spark.text.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    connected_components,
    make_simhash_udf,
    simhash_near_duplicates,
)
from loong_spark.text.quality import (
    LANG_MARKERS,
    bpe_ish_token_count_col,
    fingerprint_col,
    lang_id_col,
    quality_score_col,
    rolling_fingerprints_col,
    token_count_col,
)
from loong_spark.text.multimodal import (
    extract_image_features,
    media_table_from_documents,
    resize_images,
    sample_video_frames,
)
from loong_spark.text.similarity import ann_topk, brute_force_topk, cosine_near_dup_pairs

SF_DEFAULT = "/root/testdata/sf0.001"

_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ============================================================ crawl-engine ops
# Operators from SURVEY.md §2 expressed over the driver's tables (events as
# the frontier stand-in: user_id≈host, value≈priority, event_id≈seq).

def q_frontier_schedule_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O3+O4: per-host cap (3) in deterministic total order, then
    global budget (50) — the scheduling kernel of frontier.schedule()."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("value", "event_id")
        .limit(50)
        .select("user_id", "event_id", "value")
    )


def q_politeness_eligibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: per-host inter-fetch gap ≥ 300 s (lag window over the
    politeness clock)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "gap_s",
            F.round(
                F.col("ts").cast("timestamp").cast("double")
                - F.col("prev_ts").cast("timestamp").cast("double"),
                6,
            ),
        )
        .filter(F.col("gap_s") >= 300.0)
        .select("user_id", "event_id", "gap_s")
    )


def q_priority_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7: priority = depth + 0.1·log1p(host_seen_count)."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("host_seen"))
    return (
        ev.join(counts, "user_id")
        .select(
            "user_id",
            "event_id",
            F.round(
                (F.col("event_id") % 5).cast("double")
                + 0.1 * F.log1p(F.col("host_seen").cast("double")),
                6,
            ).alias("priority"),
        )
    )


def q_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 within-batch dedup: first enqueue attempt wins (row_number==1)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


def q_dedup_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 exact seen-filter: left-anti join against the 'seen' set."""
    ev = _t(spark, sf_dir, "events")
    seen = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return ev.join(seen, "user_id", "left_anti").select("event_id", "user_id")


def q_route_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: first-match rule dispatch (declaration order pinned)."""
    p = _t(spark, sf_dir, "part")
    rule = (
        F.when(F.col("p_type").contains("STEEL"), 0)
        .when(F.col("p_type").contains("BRASS"), 1)
        .when(F.col("p_type").contains("COPPER"), 2)
        .otherwise(-1)
    )
    return (
        p.withColumn("rule_id", rule)
        .groupBy("rule_id")
        .agg(F.count("*").alias("n"))
    )


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-lite/P2/P3: fragment strip + host extraction + md5 over
    synthesized URLs (full relative-href resolution is pandas-UDF —
    pytest-verified against the shared core; tests/test_canon.py)."""
    ev = _t(spark, sf_dir, "events")
    raw = F.concat(
        F.lit("http://h"),
        (F.col("user_id") % 20).cast("string"),
        F.lit(".example/p/"),
        F.col("event_id").cast("string"),
        F.when(F.col("event_id") % 4 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    url = F.regexp_replace(raw, "#.*$", "")
    return ev.select(
        "event_id",
        url.alias("url"),
        F.regexp_extract(url, "^https?://([^/]+)", 1).alias("host"),
        F.md5(url).alias("url_hash"),
    )


def q_pagination_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: page 1 + total → explode(sequence(1, total))."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.explode(F.sequence(F.lit(1), F.least(F.col("p_size"), F.lit(5)))).alias("page"),
    ).select(
        "p_partkey",
        "page",
        F.concat(
            F.lit("http://parts.example/p/"),
            F.col("p_partkey").cast("string"),
            F.lit("?page="),
            F.col("page").cast("string"),
        ).alias("page_url"),
    )


def q_merge_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12+J1: left-biased hash merge = left join + coalesce per column."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # no pinned broadcast: customer grows with SF — AQE promotes the
    # build side from measured sizes (VERDICT r4 #7)
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey",
        "o_custkey",
        F.coalesce(F.col("c_name"), F.lit("unknown")).alias("cust_name"),
        F.coalesce(F.col("c_nationkey"), F.lit(-1)).alias("nation_key"),
    )


def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/S5 upsert semantics: MERGE-by-key keeps the newest row."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


def q_host_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A3: per-host exact distinct + counters (metrics table)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 approx: HLL-style approx_count_distinct (sketches differ across
    engines → no SQL oracle; rows-only check; bounds pytest-checked)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users")
    )


# ============================================================ relational demos
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (pricing summary). Money quantized to integer cents
    BEFORE summing → bit-exact cross-engine aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("sum_qty_c"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_base_c"),
            F.sum(F.round(disc_price * 10000).cast("long")).alias("sum_disc_c"),
            F.count("*").alias("count_order"),
        )
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # AQE-decided build (no pin)
        .groupBy("l_orderkey")
        .agg(F.sum(rev).alias("revenue_c"))
        .orderBy(F.desc("revenue_c"), "l_orderkey")
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, group by nation."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(n, s.s_nationkey == n.n_nationkey)   # 25 rows at ANY SF, but
        .join(r, n.n_regionkey == r.r_regionkey)   # let AQE pick it anyway
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_c"))
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-scan forecasting-revenue aggregate — every
    predicate pushes to the parquet scan, projection prunes to 4 columns,
    no shuffle beyond the final 1-row partial-agg merge."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).alias("revenue_c"), F.count("*").alias("n_items"))
    )


# ============================================================ training-data ops
def q_docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return exact_duplicates(d, "doc_id", "text").select(
        "content_hash", "group_size", "keeper_id"
    )


def q_docs_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.2)


def q_docs_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    sig = minhash_signatures(d, "doc_id", "text", n=3, num_hashes=4)
    return sig.select(
        "doc_id",
        *[F.col("sig")[i].alias(f"h{i}") for i in range(4)],
    )


def q_docs_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, "doc_id", "text", n=3, num_hashes=4, bands=2, verify_threshold=0.2
    )


def q_docs_minhash_lsh_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH at the library's PRODUCTION defaults (32 hashes /
    8 bands / verify 0.8) — the demo-parameter twin keeps its cheap
    oracle; this one proves the real configuration end-to-end."""
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, "doc_id", "text", n=3, num_hashes=32, bands=8, verify_threshold=0.8
    )


def q_docs_minhash_lsh_xx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH at prod parameters with the FAST hash family
    (hash_family='xxhash64': one seeded JVM intrinsic per slot instead
    of 32 md5 digests per shingle — the dominant cost of the prod run).
    The md5 family stays the default everywhere BECAUSE DuckDB can
    reproduce it; this entry shares the md5 prod oracle, which holds
    because the LSH+exact-verify output is hash-family-agnostic here
    (pair-set equality also pytest-pinned in
    test_text_ops.test_minhash_hash_family_agnostic)."""
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, "doc_id", "text", n=3, num_hashes=32, bands=8, verify_threshold=0.8,
        hash_family="xxhash64",
    )


def q_docs_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-cluster resolution over the MinHash-LSH pair graph
    (dedup.connected_components): (doc_id, cluster_id=min reachable id).
    Oracle: recursive-CTE transitive closure over the same pair SQL —
    exact because both engines see identical pairs."""
    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", n=3, num_hashes=4, bands=2, verify_threshold=0.2
    )
    return connected_components(pairs)


def q_docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # Arrow-batched fingerprint (one md5 per token); bit-identical to
    # the JVM simhash_col reference — equality test-pinned, and this
    # row's DuckDB oracle hash is the cross-engine proof
    return d.select(
        "doc_id", make_simhash_udf(bits=16)(F.col("text")).alias("simhash")
    )


def q_docs_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-k simhash near-dup via pigeonhole block join (recall 1.0,
    so the quadratic all-pairs SQL is an EXACT oracle — the engine never
    runs all-pairs, the oracle may)."""
    d = _t(spark, sf_dir, "documents")
    return simhash_near_duplicates(d, bits=16, max_hamming=3)


def q_docs_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id_col(F.col("text")).alias("pred_lang"))


def q_docs_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count_col(F.col("text")).alias("n_bpe_tokens"),
    )


def q_docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score_col(F.col("text")).alias("quality"))


def q_docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_col(F.col("text")).alias("fp"))


def q_docs_rolling_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(rolling_fingerprints_col(F.col("text"), 4)).alias("pos", "fp")
    )


def q_emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    return brute_force_topk(e, q, k=5)


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: multi-table LSH candidates + exact cosine verify.
    Oracle is the exact all-pairs SQL — the verify step keeps precision
    at 1.0, and multi-probe recall (pytest-bounded ≥ 0.9) covers the
    qualifying pairs at this threshold/corpus."""
    e = _t(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(e, threshold=0.9, dim=64)


def q_emb_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (approximate by construction → rows-only check).
    Its EXACT TWIN is `emb_cosine_topk`: same queries (vec_id < 3), same
    k, same output shape (query_id, vec_id, cosine, rank), brute-force
    scored and fully oracled — so the driver verifies the exact answer
    at this output shape, and pytest bounds this sketch's recall against
    it (tests/test_text_ops.py::test_ann_topk_recall{,_10x})."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    return ann_topk(e, q, dim=64, k=5, n_planes=6)


def q_emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN (spherical k-means quantizer; approximate by
    construction → bound-checked, not value-oracled). Same EXACT TWIN as
    emb_ann_topk — `emb_cosine_topk` (same queries vec_id < 3, same k,
    same output shape) — so scripts/check_entry.py asserts recall ≥ 0.30
    against the twin's DuckDB SQL (measured 0.733 at sf0.01,
    n_list=16/n_probe=4 — probing 4/16 lists), and pytest holds the
    ≥ 0.9 clustered-corpus bound (test_ivf_topk_recall). Training is
    deterministic (no RNG): hash-bucket sample + md5-order init."""
    from loong_spark.text.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    return ivf_topk(e, q, dim=64, k=5, n_list=16, n_probe=4)


def q_media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 front half (media download work list, ref lib/Loong/Lite.pm:50-60):
    docs synthesize interleaved spans whose media refs deliberately
    collide across docs (doc_id % 7 × % 50 → 350 distinct assets);
    media.media_manifest explodes spans and groups to distinct refs +
    reference counts + first referring doc — dedup-before-download. The
    oracle restates the group-by over the same constructed refs."""
    from loong_spark.media import media_manifest

    d = _t(spark, sf_dir, "documents")
    ref = F.concat(
        F.lit("media://s"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        F.lit("/img"), F.pmod(F.col("doc_id"), F.lit(50)).cast("string"),
        F.lit(".jpg"),
    )
    text_span = F.struct(
        F.lit("text").alias("kind"), F.col("text").alias("text"),
        F.lit("").alias("media_ref"), F.lit(0).alias("offset"),
    )
    media_span = F.struct(
        F.lit("media").alias("kind"), F.lit("").alias("text"),
        ref.alias("media_ref"), F.lit(1).alias("offset"),
    )
    docs = d.select(
        "doc_id",
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, F.array(text_span))
        .otherwise(F.array(text_span, media_span))
        .alias("spans"),
    )
    return media_manifest(docs)


def q_media_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 back half (download sink, ref lib/Loong/Lite.pm:50-60):
    manifest refs → Arrow-batched mapInPandas fetch. The GET kernel is
    the documented sandbox stub (bytes = ascii md5 hex of the ref), so
    the scalar outputs (n_bytes, body_md5) are oracle-stateable while
    the batching/schema plumbing is the production shape."""
    from loong_spark.media import fetch_media

    return fetch_media(q_media_manifest(spark, sf_dir)).select(
        "media_ref", "n_bytes", "body_md5"
    )


def q_lite_scrape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3 one-call Lite flow (lite.lite_scrape; reference Lite.pm:14-88
    + script/tumblr.pl) exercised end-to-end THROUGH THE HTML PARSER:
    pages render deterministically from the documents table (span text =
    md5(text) — HTML-safe; one shared media asset per doc_id % 50), then
    dispatch → parse (mapInPandas) → media manifest. The oracle restates
    the expected manifest straight from doc arithmetic, so a parse or
    manifest bug breaks the hash — this is the strongest SQL-stateable
    check of the real parse kernel."""
    from loong_spark.lite import lite_scrape

    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://docs.example/p/"), F.col("doc_id").cast("string"))
    ref = F.concat(
        F.lit("http://cdn.example/a/"),
        F.pmod(F.col("doc_id"), F.lit(50)).cast("string"),
        F.lit(".jpg"),
    )
    body = F.concat(
        F.lit("<p>"), F.md5(F.encode(F.col("text"), "utf-8")),
        F.lit('</p><img src="'), ref, F.lit('">'),
    )
    pages = d.select(url.alias("url"), body.alias("body"))
    return lite_scrape(pages)["media"].select("media_ref", "n_refs", "first_doc")


def q_site_comic_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 obfuscated image-URL cipher (sites.decode_comic_image_col,
    ref lib/Loong/Scraper/Hhssee.pm:131-166): each doc plants a
    deterministic plaintext path, encodes it with the substitution+split
    cipher, and the operator under test decodes it back — the oracle
    states the plaintext directly, so any decode defect hash-mismatches.
    Pure codegen projection, zero shuffle."""
    from loong_spark.sites import decode_comic_image_col, encode_comic_image_col

    d = _t(spark, sf_dir, "documents")
    plain = F.concat(
        F.lit("http://img.example.com/dm01/vol_"),
        F.pmod(F.col("doc_id"), F.lit(50)).cast("string"),
        F.lit("/"), F.col("doc_id").cast("string"), F.lit(".jpg"),
    )
    return d.select(
        "doc_id", decode_comic_image_col(encode_comic_image_col(plain)).alias("img_url")
    )


def q_site_js_unwrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 document.write unwrap (sites.unwrap_document_write_col, ref
    lib/Loong/Scraper/Jrs.pm:29-31): payload extraction + backslash
    unescape from a JS wrapper built per doc."""
    from loong_spark.sites import unwrap_document_write_col

    d = _t(spark, sf_dir, "documents")
    js = F.concat(
        F.lit('var m=1;document.write("<li class=\\"game-item \\"><div>doc '),
        F.col("doc_id").cast("string"),
        F.lit('</div></li>");m=2;'),
    )
    return d.select("doc_id", unwrap_document_write_col(js).alias("html"))


def q_site_form_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 form/query URL synthesis (sites.getfile_url_col, ref
    lib/Loong/Scraper/91porn.pm:40-57): scrape so.addVariable key/value
    pairs out of a per-doc player blob and rebuild the getfile URL."""
    from loong_spark.sites import getfile_url_col

    d = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("so.addVariable('file','"), F.col("doc_id").cast("string"),
        F.lit("');so.addVariable('mp4','0');so.addVariable('seccode','"),
        F.md5(F.col("doc_id").cast("string")),
        F.lit("');so.addVariable('max_vid','99999');"),
    )
    return d.select(
        "doc_id", getfile_url_col(F.lit("http://v.example.com"), html).alias("next_url")
    )


def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt parsing (robots.parse_robots): each doc synthesizes a
    robots file — one third global (*) sections with Allow + Crawl-delay,
    one third agent-specific, one third for a different bot (must yield
    NO row). All windows/aggregation JVM-side; oracle states the parsed
    output directly."""
    from loong_spark.robots import parse_robots

    d = _t(spark, sf_dir, "documents")
    m3 = F.pmod(F.col("doc_id"), F.lit(3))
    ua = F.when(m3 == 0, "*").when(m3 == 1, "loong").otherwise("otherbot")
    did = F.col("doc_id").cast("string")
    txt = F.concat(
        F.lit("# synthetic\nUser-agent: "), ua,
        F.lit("\nDisallow: /p"), did, F.lit("/\n"),
        F.when(
            m3 == 0,
            F.concat(
                F.lit("Allow: /p"), did, F.lit("/ok\nCrawl-delay: "),
                (F.pmod(F.col("doc_id"), F.lit(7)) + 1).cast("string"), F.lit("\n"),
            ),
        ).otherwise(F.lit("")),
    )
    robots = d.select(
        F.concat(F.lit("h"), did, F.lit(".example")).alias("host"),
        txt.alias("robots_txt"),
    )
    parsed = parse_robots(robots, agent="loong")
    # scalar columns only: the driver comparator sorts rows in pandas and
    # cannot hash array cells — join the (already array_sort-ed) rule
    # arrays into one pipe-delimited string per kind.
    return parsed.select(
        "host",
        F.array_join("disallow", "|").alias("disallow"),
        F.array_join("allow", "|").alias("allow"),
        "crawl_delay",
    )


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemaps-protocol XML parsing (sitemap.parse_sitemap; sitemaps.org
    — beyond-reference like robots: the reference seeds from static INI
    lists only). Each doc synthesizes a sitemap file: even doc_ids a
    urlset (whitespace-padded + entity-escaped loc, lastmod/priority
    fields, a malformed priority → NULL, an empty-loc block that must be
    dropped), odd doc_ids a sitemapindex over two child sitemaps. All
    extraction is codegen regex; the oracle states the parsed output
    arithmetically (the fixed point — any parse defect hash-mismatches)."""
    from loong_spark.sitemap import parse_sitemap

    d = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    lastmod = F.format_string(
        "2026-%02d-%02d",
        F.pmod(F.col("doc_id"), F.lit(9)) + 1,
        F.pmod(F.col("doc_id"), F.lit(28)) + 1,
    )
    prio = F.concat(F.lit("0."), (F.pmod(F.col("doc_id"), F.lit(9)) + 1).cast("string"))
    urlset = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>\n'
              '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
              "  <url><loc>  http://s"), sid, F.lit(".example/a?x=1&amp;y=2  </loc>"
              "<lastmod>"), lastmod, F.lit("</lastmod><priority>"), prio,
        F.lit("</priority></url>\n  <url><loc>http://s"), sid,
        F.lit(".example/b</loc><changefreq>daily</changefreq>"
              "<priority>high</priority></url>\n"
              "  <url><loc>   </loc></url>\n</urlset>\n"),
    )
    index = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>\n'
              '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
              "  <sitemap><loc>http://s"), sid, F.lit(".example/sm-0.xml</loc>"
              "<lastmod>"), lastmod, F.lit("</lastmod></sitemap>\n"
              "  <sitemap><loc>http://s"), sid,
        F.lit(".example/sm-1.xml</loc></sitemap>\n</sitemapindex>\n"),
    )
    xml = F.when(F.pmod(F.col("doc_id"), F.lit(2)) == 0, urlset).otherwise(index)
    parsed = parse_sitemap(d.select("doc_id", xml.alias("xml")), keep=("doc_id",))
    return parsed.select(
        "doc_id", "kind",
        F.col("entry_idx").cast("long").alias("entry_idx"),
        "loc", "lastmod", "changefreq", "priority",
    )


def q_sitemap_discover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Sitemap:`` robots-directive extraction (sitemap.sitemap_lines_col
    — the discovery half of cfg.fetch_sitemaps). Each doc synthesizes a
    robots file: one fifth advertise NO sitemap (empty result), one
    quarter two sitemaps (the second with sloppy case, padding, and a
    trailing comment), the rest one; odd docs use CRLF line ends, every
    third doc a leading BOM. Oracle states the extracted URL list."""
    from loong_spark.sitemap import sitemap_lines_col

    d = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    nl = F.when(F.pmod(F.col("doc_id"), F.lit(2)) == 1, "\r\n").otherwise("\n")
    bom = F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, "\ufeff").otherwise("")
    sm1 = F.concat(F.lit("Sitemap: http://h"), sid, F.lit(".example/sitemap.xml"))
    sm2 = F.concat(F.lit("sitemap:   http://h"), sid,
                   F.lit(".example/sm2.xml   # mirror"))
    m5 = F.pmod(F.col("doc_id"), F.lit(5))
    m4 = F.pmod(F.col("doc_id"), F.lit(4))
    tail = F.when(m5 == 0, F.lit("")).otherwise(
        F.when(m4 == 0, F.concat(sm1, nl, sm2, nl)).otherwise(F.concat(sm1, nl))
    )
    txt = F.concat(
        bom, F.lit("User-agent: *"), nl, F.lit("Disallow: /private/"), nl, tail
    )
    return d.select(
        "doc_id", F.array_join(sitemap_lines_col(txt), "|").alias("sitemaps")
    )


def q_sitemap_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-recrawl selection (sitemap.recrawl_due): which
    sitemap-listed URLs are due a re-fetch, from declared <lastmod>
    (date precision) + <changefreq> intervals joined against fetch
    history. Composes the real pipeline — synthesized urlset XML →
    parse_sitemap → recrawl_due — while the oracle restates the
    decision arithmetically (the fixed point: a parse or join defect
    hash-mismatches). Per doc: entry /a carries lastmod 2026-(1..5)-dd
    + priority (fetched iff doc_id%3≠0, 1h+(doc_id%60)d ago); entry /b
    cycles all changefreq values incl 'never' and an unknown word, a
    malformed lastmod every 5th doc (fetched iff doc_id%4≠0,
    30min+(doc_id%10)h ago). 'now' is pinned to 2026-06-01 UTC —
    deterministic, never wall-clock."""
    import datetime as _dt

    from loong_spark.sitemap import parse_sitemap, recrawl_due

    now_epoch = (
        _dt.date(2026, 6, 1).toordinal() - _dt.date(1970, 1, 1).toordinal()
    ) * 86400
    d = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    lastmod_a = F.format_string(
        "2026-%02d-%02d",
        F.pmod(F.col("doc_id"), F.lit(5)) + 1,
        F.pmod(F.col("doc_id"), F.lit(28)) + 1,
    )
    freqs = F.array(
        *[F.lit(x) for x in ("always", "hourly", "daily", "weekly",
                             "monthly", "yearly", "never", "often")]
    )
    freq_b = F.element_at(freqs, (F.pmod(F.col("doc_id"), F.lit(8)) + 1).cast("int"))
    lastmod_b = F.when(F.pmod(F.col("doc_id"), F.lit(5)) == 0, F.lit("soon")).otherwise(
        F.lit("")
    )
    prio_a = F.concat(F.lit("0."), (F.pmod(F.col("doc_id"), F.lit(9)) + 1).cast("string"))
    xml = F.concat(
        F.lit("<urlset><url><loc>http://s"), sid, F.lit(".example/a</loc><lastmod>"),
        lastmod_a, F.lit("</lastmod><priority>"), prio_a,
        F.lit("</priority></url><url><loc>http://s"), sid,
        F.lit(".example/b</loc><lastmod>"), lastmod_b,
        F.lit("</lastmod><changefreq>"), freq_b,
        F.lit("</changefreq></url></urlset>"),
    )
    entries = parse_sitemap(d.select("doc_id", xml.alias("xml"))).select(
        "loc", "lastmod", "changefreq", "priority"
    )
    day, hour = F.lit(86400).cast("long"), F.lit(3600).cast("long")
    st_a = d.select(
        F.concat(F.lit("http://s"), sid, F.lit(".example/a")).alias("loc"),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(3)) != 0,
            F.lit(now_epoch) - F.pmod(F.col("doc_id"), F.lit(60)).cast("long") * day
            - hour,
        ).alias("last_fetch_epoch"),
    )
    st_b = d.select(
        F.concat(F.lit("http://s"), sid, F.lit(".example/b")).alias("loc"),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(4)) != 0,
            F.lit(now_epoch) - F.pmod(F.col("doc_id"), F.lit(10)).cast("long") * hour
            - F.lit(1800).cast("long"),
        ).alias("last_fetch_epoch"),
    )
    state = st_a.unionByName(st_b).filter(F.col("last_fetch_epoch").isNotNull())
    return recrawl_due(entries, state, now_epoch)


def q_site_term_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 CN-label term map (sites.term_lookup_col, ref
    lib/Loong/Scraper/Hupu.pm:6-39): each doc carries one CN stat label
    (picked by doc_id), the literal-map lookup returns the EN column
    name; unknown labels → NULL. Oracle states the EN name directly."""
    from loong_spark.sites import NBA_TERMS, term_lookup_col

    d = _t(spark, sf_dir, "documents")
    labels = list(NBA_TERMS)  # insertion order, stable
    # every 7th doc gets an unknown label to exercise the NULL miss path
    cn = F.when(
        F.pmod(F.col("doc_id"), F.lit(7)) == 0, F.lit("未知字段")
    ).otherwise(
        F.element_at(
            F.array(*[F.lit(s) for s in labels]),
            (F.pmod(F.col("doc_id"), F.lit(len(labels))) + 1).cast("int"),
        )
    )
    return d.select(
        "doc_id", term_lookup_col(cn, NBA_TERMS).alias("en_field")
    )


def q_site_date_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 date normalization (sites.normalize_date_col, ref
    lib/Loong/Scraper/Hhssee.pm:74-77): Y/M/D triple embedded in text →
    zero-padded ISO date."""
    from loong_spark.sites import normalize_date_col

    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("更新: "),
        (F.pmod(F.col("doc_id"), F.lit(25)) + 2000).cast("string"), F.lit("/"),
        (F.pmod(F.col("doc_id"), F.lit(12)) + 1).cast("string"), F.lit("/"),
        (F.pmod(F.col("doc_id"), F.lit(28)) + 1).cast("string"),
    )
    return d.select("doc_id", normalize_date_col(raw).alias("last_update"))


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots rules (north_star; frontier.robots_allowed): RFC 9309
    most-specific-match allow/disallow over synthesized paths, pure JVM
    array ops — including wildcard rules (``*`` any sequence, trailing
    ``$`` end anchor; specificity = rule length, Google-parser style).
    Disallow /click/, /view/, and any path with a 'u' ending in '2'
    (``/*u*2$``); allow the /click/1* subtree, /view/…7 pages
    (``/view/*7$``), and ``/sig*`` (which is SHORTER than the wildcard
    disallow it overlaps, so it loses — the precedence edge case). The
    oracle restates each rule as a hand-translated anchored regex with
    its rule length."""
    from loong_spark.frontier import robots_allowed

    ev = _t(spark, sf_dir, "events")
    path = F.concat(
        F.lit("/"), F.col("event_type"), F.lit("/"),
        F.pmod(F.col("event_id"), F.lit(100)).cast("string"),
    )
    disallow = F.array(F.lit("/click/"), F.lit("/view/"), F.lit("/*u*2$"))
    allow = F.array(F.lit("/click/1"), F.lit("/view/*7$"), F.lit("/sig*"))
    return ev.select(
        "event_id",
        path.alias("path"),
        robots_allowed(path, disallow, allow).alias("allowed"),
    )


def q_etl_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.4 ETL lifecycle (loong_spark.loader): regex-filtered driving
    scan (S8) → object_id left join with left-biased merge (J1+P12) →
    INI-style column map (P13) → MERGE upsert keyed on index (J2).
    Mirrors /root/reference/lib/Loong/Loader.pm:39-103 set-oriented."""
    from loong_spark.loader import TableMapping, load_table, upsert

    o = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("http://shop.example/order/"), F.col("o_orderkey").cast("string")).alias("url"),
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
        F.col("o_orderdate").alias("odate"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("VIP")).alias("segment"),
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("cust_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    m = TableMapping(
        name="order_export",
        columns={
            "custkey": "custkey", "order_id": "order_id", "order_url": "url",
            "cust_name": "cust_name", "segment": "segment",
            "price_c": "price_c", "odate": "odate",
        },
        index=["custkey"],
        source=["orders_x", "customers_x"],
        object_id=["custkey"],
        pattern="/order/[0-9]*[02468]$",
    )
    batch = load_table({"orders_x": o, "customers_x": c}, m)
    return upsert(None, batch, ["custkey"], ["odate", "order_id"]).drop("odate")


def q_parse_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 route-callback parse as a driver-checkable query: render a
    deterministic HTML body per document (pure SQL concat — hex token,
    img, link), then run the REAL Arrow-batched mapInPandas parser
    (rules.parse_pages → parse_core.parse_html) and emit its span rows.
    The oracle reproduces the expected spans in SQL, so this checks the
    parser's extraction order/offsets exactly."""
    from loong_spark.rules import parse_pages

    d = _t(spark, sf_dir, "documents")
    tok = F.substring(F.md5(F.col("text")), 1, 12)
    body = F.concat(
        F.lit("<p>"), tok, F.lit("</p>"),
        F.lit('<img src="img://'), F.col("doc_id").cast("string"), F.lit('.jpg">'),
        F.lit('<a href="/next/'), F.col("doc_id").cast("string"), F.lit('">x</a>'),
    )
    pages = d.select(
        F.concat(F.lit("http://docs.example/"), F.col("doc_id").cast("string")).alias("url"),
        body.alias("body"),
    )
    return (
        parse_pages(pages)
        .filter(F.col("out_kind") == "span")
        .select(
            "url", "kind", "text", "media_ref",
            F.col("offset").cast("int").alias("span_offset"),
        )
    )


def q_mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary media column → Arrow-batched
    mapInPandas feature extraction (decode kernel is a deterministic
    stub — see loong_spark.text.multimodal — so the whole path is
    oracle-checkable; the float feature array is pytest-covered)."""
    d = _t(spark, sf_dir, "documents")
    feats = extract_image_features(media_table_from_documents(d))
    return feats.select("media_id", "width", "height", "n_bytes", "phash")


def q_mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 video row → N frame rows via mapInPandas (ffmpeg stubbed;
    frame count is deterministic in blob size)."""
    d = _t(spark, sf_dir, "documents")
    media = media_table_from_documents(d, repeat_n=2048)
    frames = sample_video_frames(media, every_n=30)
    return frames.select("media_id", "frame_idx")


def q_mm_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage metadata: the stub decode is deterministic, so the
    thumbnail target dims (multimodal.thumbnail_dims — downscale-only,
    aspect-preserving, integer floor) are pure arithmetic on the fake
    (width, height) and the oracle restates them exactly (VERDICT r4
    #3). Output BYTES stay a stub (zlib — not SQL-expressible); their
    determinism is pytest-covered."""
    d = _t(spark, sf_dir, "documents")
    resized = resize_images(media_table_from_documents(d), target=224)
    return resized.select("media_id", "out_w", "out_h")


def q_docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style n-gram repetition filters (text.quality.
    gopher_repetition, Rae et al. 2021 §A1.1): per-doc repeated-phrase
    char-mass fractions (top 2/3/4-gram, duplicated 5-grams), mean word
    length, duplicate-word fraction, and the keep/drop verdict — the
    boilerplate/spam signal C4-ratio filters miss. One explode + one
    map-side-combinable groupBy; the oracle replays the identical gram
    arithmetic."""
    from loong_spark.text.quality import gopher_repetition

    return gopher_repetition(_t(spark, sf_dir, "documents"))


def q_url_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain fairness cap (canon.registrable_domain_col
    + the frontier.domain_capped window, cfg.domain_cap): hosts with
    subdomains and multi-part public suffixes collapse to their eTLD+1
    and each domain keeps its first 4 rows in the pinned order — the
    stage that stops a subdomain flood from filling the batch budget.
    The oracle recomputes the domain GENERICALLY (same suffix-set
    arithmetic on the host string, not the synthesis shortcut), so a
    suffix-handling bug breaks the hash."""
    from loong_spark.canon import registrable_domain_col

    d = _t(spark, sf_dir, "documents")
    suffix = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("co.uk"), F.lit("com.au"), F.lit("net")),
        (F.pmod(F.col("doc_id"), F.lit(5)) + 1).cast("int"),
    )
    host = F.concat(
        F.when(
            F.pmod(F.col("doc_id"), F.lit(3)) == 0,
            F.concat(F.lit("s"), F.pmod(F.col("doc_id"), F.lit(11)).cast("string"), F.lit(".")),
        ).otherwise(F.lit("")),
        F.lit("site"), F.pmod(F.col("doc_id"), F.lit(17)).cast("string"),
        F.lit("."), suffix,
    )
    w = Window.partitionBy("domain").orderBy("doc_id")
    return (
        d.select(
            "doc_id",
            host.alias("host"),
            registrable_domain_col(host).alias("domain"),
        )
        .withColumn("rn_d", F.row_number().over(w))
        .filter(F.col("rn_d") <= 4)
    )


_WARC_DATE = "2026-01-01T00:00:00Z"


def _warc_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fetched-page rows from the documents table — the
    PAGES shape (url, status, content_type, body bytes) the WARC sink
    consumes; everything downstream is pure arithmetic the oracle
    restates."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.concat(F.lit("http://docs.example/doc/"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(200).alias("status"),
        F.lit("text/html").alias("content_type"),
        F.encode(F.col("text"), "utf-8").alias("body"),
    )


def q_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC/1.1 response-record serialization (warc.warc_records —
    beyond-reference archive sink; the reference stores rows in
    MySQL/Mongo, lib/Loong/Mango.pm, with no archival export): one
    codegen projection builds the exact header string, HTTP block,
    digests, and total record byte length. The oracle rebuilds the same
    bytes with DuckDB string ops, so one byte of drift in the format
    breaks the hash."""
    from loong_spark.warc import warc_records

    return warc_records(_warc_pages(spark, sf_dir), warc_date=_WARC_DATE).select(
        "url", "urlkey", "record_id", "content_length", "record_length",
        "block_digest", "payload_digest",
    )


def _warc_recs_with_files(spark: SparkSession, sf_dir: str):
    from loong_spark.warc import assign_files, warc_records

    recs = warc_records(_warc_pages(spark, sf_dir), warc_date=_WARC_DATE)
    # oracle-reproducible file assignment: the doc id embedded in the url
    fid = F.pmod(F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long"), F.lit(4))
    return assign_files(recs, 4, file_id=fid)


def q_warc_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX byte-offset index over the assigned archives (warc.cdx_index):
    per-file window sum of exact record lengths + the warcinfo base —
    the offsets tests/test_warc.py seeks in real files. The oracle
    replays the identical window arithmetic."""
    from loong_spark.warc import cdx_index

    return cdx_index(_warc_recs_with_files(spark, sf_dir), warc_date=_WARC_DATE)


def q_warc_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-archive manifest (file record count + total bytes incl. the
    leading warcinfo record) — what write_warc_files returns from its
    one-task-per-file writer, restated as the pure aggregation so the
    oracle can check the byte math."""
    from loong_spark.warc import warcinfo_bytes

    base = len(warcinfo_bytes(_WARC_DATE))
    return (
        _warc_recs_with_files(spark, sf_dir)
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            (F.lit(base) + F.sum("record_length")).alias("n_bytes"),
        )
        .select(
            F.concat(
                F.lit("loong-"), F.lpad(F.col("file_id").cast("string"), 5, "0"), F.lit(".warc")
            ).alias("filename"),
            "n_records",
            "n_bytes",
        )
    )


# ============================================================ contract surface
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the frontier scheduling kernel at sf0.001."""
    return q_frontier_schedule_topk(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "frontier_schedule_topk": q_frontier_schedule_topk,
        "politeness_eligibility": q_politeness_eligibility,
        "priority_rescore": q_priority_rescore,
        "dedup_first_wins": q_dedup_first_wins,
        "dedup_anti_join": q_dedup_anti_join,
        "route_match": q_route_match,
        "url_canonicalize": q_url_canonicalize,
        "pagination_expand": q_pagination_expand,
        "merge_coalesce": q_merge_coalesce,
        "upsert_latest": q_upsert_latest,
        "host_metrics": q_host_metrics,
        "approx_distinct": q_approx_distinct,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "tpch_q6": q_tpch_q6,
        "docs_exact_dedup": q_docs_exact_dedup,
        "docs_ngram_jaccard": q_docs_ngram_jaccard,
        "docs_minhash_signature": q_docs_minhash_signature,
        "docs_minhash_lsh": q_docs_minhash_lsh,
        "docs_minhash_lsh_prod": q_docs_minhash_lsh_prod,
        "docs_minhash_lsh_xx": q_docs_minhash_lsh_xx,
        "docs_dup_clusters": q_docs_dup_clusters,
        "docs_simhash": q_docs_simhash,
        "docs_simhash_neardup": q_docs_simhash_neardup,
        "docs_lang_id": q_docs_lang_id,
        "docs_token_count": q_docs_token_count,
        "docs_quality": q_docs_quality,
        "docs_fingerprint": q_docs_fingerprint,
        "docs_rolling_fp": q_docs_rolling_fp,
        "emb_cosine_topk": q_emb_cosine_topk,
        "emb_near_dup": q_emb_near_dup,
        "emb_ann_topk": q_emb_ann_topk,
        "emb_ivf_topk": q_emb_ivf_topk,
        "robots_filter": q_robots_filter,
        "robots_parse": q_robots_parse,
        "sitemap_parse": q_sitemap_parse,
        "sitemap_discover": q_sitemap_discover,
        "sitemap_recrawl": q_sitemap_recrawl,
        "site_comic_decode": q_site_comic_decode,
        "site_js_unwrap": q_site_js_unwrap,
        "site_form_synth": q_site_form_synth,
        "site_term_map": q_site_term_map,
        "site_date_norm": q_site_date_norm,
        "parse_spans": q_parse_spans,
        "etl_export": q_etl_export,
        "mm_image_features": q_mm_image_features,
        "mm_video_frames": q_mm_video_frames,
        "mm_resize_meta": q_mm_resize_meta,
        "media_manifest": q_media_manifest,
        "lite_scrape": q_lite_scrape,
        "media_fetch": q_media_fetch,
        "warc_records": q_warc_records,
        "warc_cdx": q_warc_cdx,
        "warc_manifest": q_warc_manifest,
        "docs_repetition": q_docs_repetition,
        "url_domain_cap": q_url_domain_cap,
    }


# ---------------------------------------------------------------- oracle SQL
def _sql_grams(n: int = 3) -> str:
    """Shared CTE text: distinct word n-gram shingles per doc (mirrors
    text.dedup.shingles, incl. the short-doc edge: one truncated gram)."""
    return f"""
    words AS (
      SELECT doc_id, regexp_split_to_array({_NORM}, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(w[gs:gs+{n - 1}], ' ') AS shingle
      FROM words, unnest(generate_series(1, greatest(len(w)-{n - 1}, 1))) AS t(gs)
    )"""


def _sql_jaccard_pairs(threshold: float, n: int = 3) -> str:
    return f"""
    WITH {_sql_grams(n)},
    sizes AS (SELECT doc_id, count(*) AS ns FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_inter / (sa.ns + sb.ns - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(n_inter / (sa.ns + sb.ns - n_inter), 6) >= {threshold}"""


def _sql_minhash_sig(num_hashes: int = 4, n: int = 3) -> str:
    mins = ",\n      ".join(
        f"min(md5('{i}:' || shingle)) AS h{i}" for i in range(num_hashes)
    )
    return f"""
    sig AS (
      SELECT doc_id, {mins}
      FROM grams GROUP BY doc_id
    )"""


def _sql_lsh_pairs(num_hashes: int, bands: int, threshold: float) -> str:
    """Verified LSH near-dup pairs at arbitrary (num_hashes, bands):
    candidates collide iff some band's signature slice matches exactly;
    exact Jaccard filters them. Generalizes the banding OR-clause so the
    same SQL backs both the demo-parameter and production-parameter
    entries."""
    r = num_hashes // bands
    band_conds = " OR ".join(
        "(" + " AND ".join(f"a.h{b * r + j} = b.h{b * r + j}" for j in range(r)) + ")"
        for b in range(bands)
    )
    return f"""
            WITH {_sql_grams(3)},
            {_sql_minhash_sig(num_hashes)},
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM sig a JOIN sig b ON a.doc_id < b.doc_id
               AND ({band_conds})
            ),
            sizes AS (SELECT doc_id, count(*) AS ns FROM grams GROUP BY doc_id),
            inter AS (
              SELECT g1.doc_id AS doc_a, g2.doc_id AS doc_b, count(*) AS n_inter
              FROM grams g1 JOIN grams g2 ON g1.shingle = g2.shingle AND g1.doc_id < g2.doc_id
              GROUP BY 1, 2
            ),
            jac AS (
              SELECT i.doc_a, i.doc_b, round(n_inter / (sa.ns + sb.ns - n_inter), 6) AS jaccard
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b
            )
            SELECT c.doc_a, c.doc_b, j.jaccard
            FROM cand c JOIN jac j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
            WHERE j.jaccard >= {threshold}"""


def _sql_lang_id() -> str:
    score_exprs = []
    for lang, markers in LANG_MARKERS.items():
        hits = " + ".join(
            f"(CASE WHEN regexp_matches(t, '(^| ){m}( |$)') THEN 1 ELSE 0 END)"
            for m in markers
        )
        score_exprs.append(f"({hits}) AS s_{lang}")
    langs = list(LANG_MARKERS)
    best = f"greatest({', '.join('s_' + la for la in langs)})"
    case = " ".join(
        f"WHEN s_{la} = best AND best > 0 THEN '{la}'" for la in langs
    )
    return f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
    scores AS (SELECT doc_id, {', '.join(score_exprs)} FROM norm),
    ranked AS (SELECT doc_id, s_en, s_de, s_fr, s_es, {best} AS best FROM scores)
    SELECT doc_id, CASE {case} ELSE 'und' END AS pred_lang FROM ranked"""


def _sql_term_map() -> str:
    """Oracle for site_term_map: the EN name selected directly by
    doc_id's label index (doc_id%7==0 rows carry an unknown label →
    NULL). Built from the same NBA_TERMS the Spark side maps through,
    so the SQL never contains the CN keys — only the expected output."""
    from loong_spark.sites import NBA_TERMS

    ens = list(NBA_TERMS.values())
    whens = "\n              ".join(
        f"WHEN {i} THEN '{en}'" for i, en in enumerate(ens)
    )
    return f"""
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN NULL
                    ELSE CASE doc_id % {len(ens)}
              {whens}
                    END
               END AS en_field
        FROM documents"""


def _sql_simhash(bits: int = 16) -> str:
    tok_int = "CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT)"
    bit_sums = ",\n        ".join(
        f"sum(CASE WHEN ({tok_int} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(regexp_split_to_array({_NORM}, ' ')) AS tok
      FROM documents
    ),
    bitsums AS (
      SELECT doc_id,
        {bit_sums}
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bitsums"""


_SQL_COSINE_CTES = """
    norms AS (
      SELECT vec_id,
             sqrt((SELECT sum(x*x) FROM (SELECT unnest(embedding)::DOUBLE AS x) t)) AS nrm
      FROM embeddings
    )"""


def _sql_quality() -> str:
    stop_hits = " + ".join(
        f"(CASE WHEN regexp_matches(tn, '(^| ){m}( |$)') THEN 1 ELSE 0 END)"
        for m in LANG_MARKERS["en"]
    )
    return f"""
    WITH base AS (
      SELECT doc_id, trim(text) AS t, {_NORM} AS tn FROM documents
    ),
    feats AS (
      SELECT doc_id,
        length(t) AS n_chars,
        length(t) - length(regexp_replace(t, '[^A-Za-z0-9\\s]', '', 'g')) AS n_punct,
        ({stop_hits}) AS stop_hits
      FROM base
    )
    SELECT doc_id,
      round(
        0.4 * least(n_chars / 500.0, 1.0)
        + 0.3 * least(stop_hits / 4.0, 1.0)
        + 0.3 * (1.0 - (CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 1.0 END)),
        6) AS quality
    FROM feats"""


def oracle_sql() -> dict[str, str]:
    sql = {
        "frontier_schedule_topk": """
            WITH ranked AS (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rn
              FROM events
            )
            SELECT user_id, event_id, value FROM ranked WHERE rn <= 3
            ORDER BY value, event_id LIMIT 50""",
        "politeness_eligibility": """
            WITH lagged AS (
              SELECT user_id, event_id,
                     round(epoch(ts) - epoch(lag(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)), 6) AS gap_s
              FROM events
            )
            SELECT user_id, event_id, gap_s FROM lagged WHERE gap_s >= 300.0""",
        "priority_rescore": """
            WITH counts AS (SELECT user_id, count(*) AS host_seen FROM events GROUP BY user_id)
            SELECT e.user_id, e.event_id,
                   round((e.event_id % 5)::DOUBLE + 0.1 * ln(1 + c.host_seen), 6) AS priority
            FROM events e JOIN counts c ON e.user_id = c.user_id""",
        "dedup_first_wins": """
            WITH ranked AS (
              SELECT user_id, event_type, event_id,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) AS rn
              FROM events
            )
            SELECT user_id, event_type, event_id FROM ranked WHERE rn = 1""",
        "dedup_anti_join": """
            SELECT event_id, user_id FROM events
            WHERE user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'error')""",
        "route_match": """
            SELECT CASE WHEN p_type LIKE '%STEEL%' THEN 0
                        WHEN p_type LIKE '%BRASS%' THEN 1
                        WHEN p_type LIKE '%COPPER%' THEN 2
                        ELSE -1 END AS rule_id,
                   count(*) AS n
            FROM part GROUP BY 1""",
        "url_canonicalize": """
            WITH raw AS (
              SELECT event_id,
                     'http://h' || (user_id % 20) || '.example/p/' || event_id ||
                     (CASE WHEN event_id % 4 = 0 THEN '#frag' ELSE '' END) AS raw_url
              FROM events
            )
            SELECT event_id,
                   regexp_replace(raw_url, '#.*$', '') AS url,
                   regexp_extract(regexp_replace(raw_url, '#.*$', ''), '^https?://([^/]+)', 1) AS host,
                   md5(regexp_replace(raw_url, '#.*$', '')) AS url_hash
            FROM raw""",
        "pagination_expand": """
            SELECT p_partkey, gs AS page,
                   'http://parts.example/p/' || p_partkey || '?page=' || gs AS page_url
            FROM part, unnest(generate_series(1, least(p_size, 5))) AS t(gs)""",
        "merge_coalesce": """
            SELECT o.o_orderkey, o.o_custkey,
                   coalesce(c.c_name, 'unknown') AS cust_name,
                   coalesce(c.c_nationkey, -1) AS nation_key
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""",
        "upsert_latest": """
            WITH ranked AS (
              SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total_price,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders
            )
            SELECT o_custkey, o_orderkey, total_price FROM ranked WHERE rn = 1""",
        "host_metrics": """
            SELECT user_id, count(*) AS n_events,
                   count(DISTINCT event_type) AS n_types,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
            FROM events GROUP BY user_id""",
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
                   CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_c,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus""",
        "tpch_q3": """
            SELECT l.l_orderkey,
                   CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_c
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l.l_orderkey
            ORDER BY revenue_c DESC, l_orderkey LIMIT 10""",
        "tpch_q5": """
            SELECT n.n_name,
                   CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_c
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE c.c_nationkey = s.s_nationkey AND r.r_name = 'ASIA'
            GROUP BY n.n_name""",
        "tpch_q6": """
            SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) AS revenue_c,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1995-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24""",
        "docs_exact_dedup": f"""
            SELECT md5({_NORM}) AS content_hash,
                   count(*) AS group_size,
                   min(doc_id) AS keeper_id
            FROM documents GROUP BY 1 HAVING count(*) > 1""",
        "docs_ngram_jaccard": _sql_jaccard_pairs(0.2),
        "docs_minhash_signature": f"""
            WITH {_sql_grams(3)},
            {_sql_minhash_sig(4)}
            SELECT doc_id, h0, h1, h2, h3 FROM sig""",
        "docs_minhash_lsh": _sql_lsh_pairs(4, 2, 0.2),
        "docs_minhash_lsh_prod": _sql_lsh_pairs(32, 8, 0.8),
        # the fast family shares the md5 prod oracle: verified LSH output
        # is hash-family-agnostic (and the checker hash-compares it)
        "docs_minhash_lsh_xx": _sql_lsh_pairs(32, 8, 0.8),
        "docs_simhash": _sql_simhash(16),
        "docs_simhash_neardup": f"""
            WITH sims AS ({_sql_simhash(16)})
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
            FROM sims a JOIN sims b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
        "docs_lang_id": _sql_lang_id(),
        "docs_token_count": f"""
            SELECT doc_id,
              CASE WHEN trim(text) = '' THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
              len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
            FROM documents""",
        "docs_quality": _sql_quality(),
        "docs_fingerprint": f"SELECT doc_id, md5({_NORM}) AS fp FROM documents",
        "docs_rolling_fp": f"""
            WITH words AS (SELECT doc_id, regexp_split_to_array({_NORM}, ' ') AS w FROM documents)
            SELECT doc_id, gs - 1 AS pos,
                   md5(array_to_string(w[gs:gs+3], ' ')) AS fp
            FROM words, unnest(generate_series(1, greatest(len(w)-3, 1))) AS t(gs)""",
        "emb_cosine_topk": f"""
            WITH {_SQL_COSINE_CTES},
            q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT q.query_id, v.vec_id,
                round(
                  (SELECT sum(a*b) FROM (SELECT unnest(q.qe)::DOUBLE AS a,
                                                unnest(v.embedding)::DOUBLE AS b) t)
                  / (nq.nrm * nv.nrm), 6) AS cosine
              FROM embeddings v
              CROSS JOIN q
              JOIN norms nq ON nq.vec_id = q.query_id
              JOIN norms nv ON nv.vec_id = v.vec_id
            ),
            ranked AS (
              SELECT query_id, vec_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, vec_id) AS rank
              FROM scored
            )
            SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 5""",
        "emb_near_dup": f"""
            WITH {_SQL_COSINE_CTES},
            pairs AS (
              SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                round(
                  (SELECT sum(x*y) FROM (SELECT unnest(a.embedding)::DOUBLE AS x,
                                                unnest(b.embedding)::DOUBLE AS y) t)
                  / (na.nrm * nb.nrm), 6) AS cosine
              FROM embeddings a
              JOIN embeddings b ON a.vec_id < b.vec_id
              JOIN norms na ON na.vec_id = a.vec_id
              JOIN norms nb ON nb.vec_id = b.vec_id
            )
            SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.9""",
        "robots_filter": """
            WITH p AS (
              SELECT event_id,
                     '/' || event_type || '/' || CAST(event_id % 100 AS VARCHAR) AS path
              FROM events
            )
            SELECT event_id, path,
              coalesce(list_max(list_transform(
                  list_filter([{'re': '^/click/1', 'n': 8},
                               {'re': '^/view/.*7$', 'n': 9},
                               {'re': '^/sig.*', 'n': 5}],
                              r -> regexp_matches(path, r.re)),
                  r -> r.n)), -1)
              >=
              coalesce(list_max(list_transform(
                  list_filter([{'re': '^/click/', 'n': 7},
                               {'re': '^/view/', 'n': 6},
                               {'re': '^/.*u.*2$', 'n': 6}],
                              r -> regexp_matches(path, r.re)),
                  r -> r.n)), -1)
              AS allowed
            FROM p""",
        "robots_parse": """
            SELECT 'h' || CAST(doc_id AS VARCHAR) || '.example' AS host,
                   '/p' || CAST(doc_id AS VARCHAR) || '/' AS disallow,
                   CASE WHEN doc_id % 3 = 0
                        THEN '/p' || CAST(doc_id AS VARCHAR) || '/ok'
                        ELSE '' END AS allow,
                   CASE WHEN doc_id % 3 = 0
                        THEN CAST(doc_id % 7 + 1 AS DOUBLE) END AS crawl_delay
            FROM documents WHERE doc_id % 3 < 2""",
        # sitemap oracles state the EXPECTED parse output arithmetically
        # (the Spark side builds the XML/robots text then parses it — the
        # oracle is the fixed point, so any extraction defect, including
        # trim/entity/comment/BOM handling, hash-mismatches)
        "sitemap_parse": """
            WITH e0 AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0 THEN 'url' ELSE 'sitemap' END AS kind,
                     CAST(0 AS BIGINT) AS entry_idx,
                     CASE WHEN doc_id % 2 = 0
                          THEN 'http://s' || CAST(doc_id AS VARCHAR) || '.example/a?x=1&y=2'
                          ELSE 'http://s' || CAST(doc_id AS VARCHAR) || '.example/sm-0.xml'
                     END AS loc,
                     printf('2026-%02d-%02d', doc_id % 9 + 1, doc_id % 28 + 1) AS lastmod,
                     '' AS changefreq,
                     CASE WHEN doc_id % 2 = 0
                          THEN CAST('0.' || CAST(doc_id % 9 + 1 AS VARCHAR) AS DOUBLE)
                     END AS priority
              FROM documents
            ), e1 AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0 THEN 'url' ELSE 'sitemap' END AS kind,
                     CAST(1 AS BIGINT) AS entry_idx,
                     CASE WHEN doc_id % 2 = 0
                          THEN 'http://s' || CAST(doc_id AS VARCHAR) || '.example/b'
                          ELSE 'http://s' || CAST(doc_id AS VARCHAR) || '.example/sm-1.xml'
                     END AS loc,
                     '' AS lastmod,
                     CASE WHEN doc_id % 2 = 0 THEN 'daily' ELSE '' END AS changefreq,
                     CAST(NULL AS DOUBLE) AS priority
              FROM documents
            )
            SELECT * FROM e0 UNION ALL SELECT * FROM e1""",
        "sitemap_discover": """
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN ''
                        WHEN doc_id % 4 = 0
                        THEN 'http://h' || CAST(doc_id AS VARCHAR) || '.example/sitemap.xml'
                             || '|http://h' || CAST(doc_id AS VARCHAR) || '.example/sm2.xml'
                        ELSE 'http://h' || CAST(doc_id AS VARCHAR) || '.example/sitemap.xml'
                   END AS sitemaps
            FROM documents""",
        "sitemap_recrawl": """
            WITH n AS (SELECT CAST(DATE '2026-06-01' - DATE '1970-01-01'
                                   AS BIGINT) * 86400 AS now_e),
            a AS (
              SELECT 'http://s' || CAST(doc_id AS VARCHAR) || '.example/a' AS loc,
                     CAST('0.' || CAST(doc_id % 9 + 1 AS VARCHAR) AS DOUBLE) AS priority,
                     CASE WHEN doc_id % 3 <> 0
                          THEN now_e - (doc_id % 60) * 86400 - 3600
                     END AS last_fetch_epoch,
                     CAST(TRY_CAST(printf('2026-%02d-%02d', doc_id % 5 + 1,
                                          doc_id % 28 + 1) AS DATE)
                          - DATE '1970-01-01' AS BIGINT) * 86400 AS lm_e,
                     CAST(NULL AS BIGINT) AS iv
              FROM documents, n
            ),
            b AS (
              SELECT 'http://s' || CAST(doc_id AS VARCHAR) || '.example/b' AS loc,
                     CAST(NULL AS DOUBLE) AS priority,
                     CASE WHEN doc_id % 4 <> 0
                          THEN now_e - (doc_id % 10) * 3600 - 1800
                     END AS last_fetch_epoch,
                     CAST(NULL AS BIGINT) AS lm_e,
                     CASE doc_id % 8 WHEN 0 THEN 0 WHEN 1 THEN 3600
                          WHEN 2 THEN 86400 WHEN 3 THEN 604800
                          WHEN 4 THEN 2592000 WHEN 5 THEN 31536000
                          ELSE NULL END AS iv
              FROM documents, n
            ),
            u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
            r AS (
              SELECT loc, priority, last_fetch_epoch,
                     CASE WHEN last_fetch_epoch IS NULL THEN 'new'
                          WHEN lm_e IS NOT NULL AND lm_e > last_fetch_epoch
                               THEN 'modified'
                          WHEN iv IS NOT NULL AND now_e - last_fetch_epoch >= iv
                               THEN 'stale'
                          ELSE 'fresh' END AS reason
              FROM u, n
            )
            SELECT loc, priority, last_fetch_epoch, reason,
                   reason <> 'fresh' AS due
            FROM r""",
        # site_* oracles state the EXPECTED output directly (the Spark
        # side encodes then decodes / wraps then unwraps — the oracle is
        # the fixed point, so any transform defect hash-mismatches)
        "site_comic_decode": """
            SELECT doc_id,
                   'http://img.example.com/dm01/vol_' || CAST(doc_id % 50 AS VARCHAR)
                   || '/' || CAST(doc_id AS VARCHAR) || '.jpg' AS img_url
            FROM documents""",
        "site_js_unwrap": """
            SELECT doc_id,
                   '<li class="game-item "><div>doc ' || CAST(doc_id AS VARCHAR)
                   || '</div></li>' AS html
            FROM documents""",
        "site_form_synth": """
            SELECT doc_id,
                   'http://v.example.com/getfile.php?VID=' || CAST(doc_id AS VARCHAR)
                   || '&mp4=0&seccode=' || md5(CAST(doc_id AS VARCHAR))
                   || '&max_vid=99999' AS next_url
            FROM documents""",
        "site_term_map": _sql_term_map(),
        "site_date_norm": """
            SELECT doc_id,
                   printf('%04d-%02d-%02d',
                          2000 + doc_id % 25, doc_id % 12 + 1, doc_id % 28 + 1)
                   AS last_update
            FROM documents""",
        "etl_export": """
            WITH o1 AS (
              SELECT 'http://shop.example/order/' || CAST(o_orderkey AS VARCHAR) AS url,
                     o_orderkey AS order_id, o_custkey AS custkey,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
                     o_orderdate AS odate,
                     CASE WHEN o_orderkey % 3 = 0 THEN 'VIP' END AS segment
              FROM orders
            ),
            ox AS (SELECT * FROM o1 WHERE regexp_matches(url, '/order/[0-9]*[02468]$')),
            cx AS (SELECT c_custkey AS custkey, c_name AS cust_name,
                          c_mktsegment AS rsegment FROM customer),
            merged AS (
              SELECT ox.custkey, ox.order_id, ox.url AS order_url, cx.cust_name,
                     coalesce(ox.segment, cx.rsegment) AS segment,
                     ox.price_c, ox.odate
              FROM ox LEFT JOIN cx USING (custkey)
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY custkey
                                           ORDER BY odate DESC, order_id DESC) AS rn
              FROM merged
            )
            SELECT custkey, order_id, order_url, cust_name, segment, price_c
            FROM ranked WHERE rn = 1""",
        "parse_spans": """
            WITH p AS (
              SELECT 'http://docs.example/' || CAST(doc_id AS VARCHAR) AS url,
                     substr(md5(text), 1, 12) AS tok,
                     CAST(doc_id AS VARCHAR) AS id
              FROM documents
            )
            SELECT url, 'text' AS kind, tok AS text, '' AS media_ref,
                   CAST(0 AS INT) AS span_offset FROM p
            UNION ALL
            SELECT url, 'media' AS kind, '' AS text,
                   'img://' || id || '.jpg' AS media_ref,
                   CAST(1 AS INT) AS span_offset FROM p""",
        "mm_image_features": """
            WITH media AS (
              SELECT md5('img://' || source || '/' || CAST(doc_id AS VARCHAR)) AS media_id,
                     repeat('img://' || source || '/' || CAST(doc_id AS VARCHAR), 32) AS blob
              FROM documents WHERE doc_id % 3 = 0
            )
            SELECT media_id,
                   64 + (('0x' || substr(md5(blob), 1, 2))::INT % 192) AS width,
                   64 + (('0x' || substr(md5(blob), 3, 2))::INT % 192) AS height,
                   CAST(len(blob) AS BIGINT) AS n_bytes,
                   substr(md5(blob), 1, 16) AS phash
            FROM media""",
        "mm_video_frames": """
            WITH media AS (
              SELECT md5('img://' || source || '/' || CAST(doc_id AS VARCHAR)) AS media_id,
                     len(repeat('img://' || source || '/' || CAST(doc_id AS VARCHAR), 2048)) AS nb
              FROM documents WHERE doc_id % 3 = 0
            )
            SELECT media_id, CAST(f - 1 AS INT) AS frame_idx
            FROM media, unnest(generate_series(1, greatest(nb // (30*1024), 1))) AS t(f)""",
        "media_manifest": """
            SELECT 'media://s' || CAST(doc_id % 7 AS VARCHAR)
                   || '/img' || CAST(doc_id % 50 AS VARCHAR) || '.jpg' AS media_ref,
                   count(*) AS n_refs, min(doc_id) AS first_doc
            FROM documents WHERE doc_id % 3 <> 0
            GROUP BY 1""",
        "media_fetch": """
            WITH refs AS (
              SELECT DISTINCT 'media://s' || CAST(doc_id % 7 AS VARCHAR)
                     || '/img' || CAST(doc_id % 50 AS VARCHAR) || '.jpg' AS media_ref
              FROM documents WHERE doc_id % 3 <> 0
            )
            SELECT media_ref, 32 AS n_bytes, md5(md5(media_ref)) AS body_md5
            FROM refs""",
        "lite_scrape": """
            WITH pages AS (
              SELECT 'http://docs.example/p/' || CAST(doc_id AS VARCHAR) AS url,
                     'http://cdn.example/a/' || CAST(doc_id % 50 AS VARCHAR)
                       || '.jpg' AS media_ref
              FROM documents
            )
            SELECT media_ref, count(*) AS n_refs, min(md5(url)) AS first_doc
            FROM pages GROUP BY 1""",
        # resize dims: same deterministic fake-decode arithmetic as
        # mm_image_features, then thumbnail_dims (downscale-only,
        # aspect-preserving, integer floor) restated in SQL
        "mm_resize_meta": """
            WITH media AS (
              SELECT md5('img://' || source || '/' || CAST(doc_id AS VARCHAR)) AS media_id,
                     repeat('img://' || source || '/' || CAST(doc_id AS VARCHAR), 32) AS blob
              FROM documents WHERE doc_id % 3 = 0
            ),
            dims AS (
              SELECT media_id,
                     64 + (('0x' || substr(md5(blob), 1, 2))::INT % 192) AS w,
                     64 + (('0x' || substr(md5(blob), 3, 2))::INT % 192) AS h
              FROM media
            )
            SELECT media_id,
                   CAST(CASE WHEN greatest(w, h) <= 224 THEN w
                        ELSE greatest(1, w * 224 // greatest(w, h)) END AS INT) AS out_w,
                   CAST(CASE WHEN greatest(w, h) <= 224 THEN h
                        ELSE greatest(1, h * 224 // greatest(w, h)) END AS INT) AS out_h
            FROM dims""",
        # approx_distinct, emb_ann_topk: intentionally no oracle (sketch /
        # approximate ops); scripts/check_entry.py BOUND-checks both
        # against their exact twins, and pytest pins recall/error bounds.
    }
    # WARC/1.1 record serialization restated byte-for-byte in DuckDB
    # string ops: the oracle rebuilds the exact header text, HTTP block,
    # sha256 digests, and record byte lengths, so any drift in the
    # serialized format (one header, one CRLF, one length) breaks the
    # value hash. CRLF is composed via chr() — no raw control chars in
    # the SQL text. _warc_base = the serialized warcinfo leading-record
    # size every CDX offset / manifest total is shifted by.
    from loong_spark.warc import warcinfo_bytes as _wib

    _warc_base = len(_wib(_WARC_DATE))
    _crlf = "(chr(13) || chr(10))"
    _warc_rec_cte = f"""
    WITH pages AS (
      SELECT 'http://docs.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
             doc_id, text
      FROM documents
    ),
    blocks AS (
      SELECT url, doc_id,
             'HTTP/1.1 200 OK' || {_crlf} ||
             'Content-Type: text/html' || {_crlf} ||
             'Content-Length: ' || CAST(octet_length(encode(text)) AS VARCHAR) ||
             {_crlf} || {_crlf} || text AS block,
             sha256(text) AS payload_digest,
             md5(url) AS m
      FROM pages
    ),
    recs AS (
      SELECT url, doc_id,
             array_to_string(list_reverse(string_split(
               lower(regexp_extract(url, '^[a-z]+://([^/]*)', 1)), '.')), ',')
               || ')' ||
               coalesce(nullif(regexp_extract(url, '^[a-z]+://[^/]*(/.*)?$', 1), ''), '/')
               AS urlkey,
             substr(m, 1, 8) || '-' || substr(m, 9, 4) || '-' || substr(m, 13, 4)
               || '-' || substr(m, 17, 4) || '-' || substr(m, 21, 12) AS record_id,
             octet_length(encode(block)) AS content_length,
             sha256(block) AS block_digest,
             payload_digest,
             'WARC/1.1' || {_crlf} ||
             'WARC-Type: response' || {_crlf} ||
             'WARC-Record-ID: <urn:uuid:' || substr(m, 1, 8) || '-' || substr(m, 9, 4)
               || '-' || substr(m, 13, 4) || '-' || substr(m, 17, 4) || '-'
               || substr(m, 21, 12) || '>' || {_crlf} ||
             'WARC-Date: {_WARC_DATE}' || {_crlf} ||
             'WARC-Target-URI: ' || url || {_crlf} ||
             'Content-Type: application/http;msgtype=response' || {_crlf} ||
             'WARC-Block-Digest: sha256:' || sha256(block) || {_crlf} ||
             'WARC-Payload-Digest: sha256:' || payload_digest || {_crlf} ||
             'Content-Length: ' || CAST(octet_length(encode(block)) AS VARCHAR) ||
             {_crlf} || {_crlf} AS header
      FROM blocks
    ),
    sized AS (
      SELECT url, doc_id, urlkey, record_id, content_length, block_digest,
             payload_digest,
             octet_length(encode(header)) + content_length + 4 AS record_length,
             doc_id % 4 AS file_id
      FROM recs
    )"""
    sql["warc_records"] = f"""{_warc_rec_cte}
    SELECT url, urlkey, record_id, content_length, record_length,
           block_digest, payload_digest
    FROM sized"""
    sql["warc_cdx"] = f"""{_warc_rec_cte}
    SELECT urlkey, '20260101000000' AS ts, url,
           'loong-' || lpad(CAST(file_id AS VARCHAR), 5, '0') || '.warc' AS filename,
           {_warc_base} + COALESCE(sum(record_length) OVER (
             PARTITION BY file_id ORDER BY urlkey, url
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS "offset",
           record_length AS length, 200 AS status, block_digest AS digest
    FROM sized"""
    sql["warc_manifest"] = f"""{_warc_rec_cte}
    SELECT 'loong-' || lpad(CAST(file_id AS VARCHAR), 5, '0') || '.warc' AS filename,
           count(*) AS n_records, {_warc_base} + sum(record_length) AS n_bytes
    FROM sized GROUP BY 1"""
    # registrable-domain fairness cap: the oracle recomputes eTLD+1
    # generically from the host string with the SAME embedded suffix set
    # (imported from the pure twin so the lists can't drift), then
    # replays the per-domain window cap.
    from loong_spark.canon_core import MULTI_PART_SUFFIXES as _MPS

    _mps_sql = ", ".join(f"'{s}'" for s in sorted(_MPS))
    sql["url_domain_cap"] = f"""
    WITH hosts AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 3 = 0
                   THEN 's' || CAST(doc_id % 11 AS VARCHAR) || '.' ELSE '' END)
             || 'site' || CAST(doc_id % 17 AS VARCHAR) || '.'
             || (['com', 'org', 'co.uk', 'com.au', 'net'])[CAST(doc_id % 5 AS INT) + 1]
               AS host
      FROM documents
    ),
    doms AS (
      SELECT doc_id, host,
             CASE WHEN len(string_split(host, '.')) <= 2 THEN host
                  WHEN array_to_string(string_split(host, '.')[-2:], '.') IN ({_mps_sql})
                       THEN array_to_string(string_split(host, '.')[-3:], '.')
                  ELSE array_to_string(string_split(host, '.')[-2:], '.') END AS domain
      FROM hosts
    ),
    ranked AS (
      SELECT doc_id, host, domain,
             row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn_d
      FROM doms
    )
    SELECT doc_id, host, domain, rn_d FROM ranked WHERE rn_d <= 4"""
    # Gopher repetition: identical gram construction (all sizes from one
    # word array), counts, and char-mass arithmetic as the Spark op —
    # top fracs only from grams occurring >1 time, dup-5 mass over all
    # repeated 5-grams, keep compared on the ROUNDED fracs.
    sql["docs_repetition"] = f"""
    WITH words AS (
      SELECT doc_id, {_NORM} AS norm, regexp_split_to_array({_NORM}, ' ') AS w
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, length(norm) AS n_chars,
             CASE WHEN length(norm) > 0
                  THEN round((length(norm) - (len(w) - 1)) / len(w), 6)
                  ELSE 0.0 END AS mean_word_len,
             round(1 - len(list_distinct(w)) / len(w), 6) AS frac_dup_words
      FROM words
    ),
    grams AS (
      SELECT doc_id, n, array_to_string(w[gs:gs+n-1], ' ') AS g
      FROM words,
           unnest([2, 3, 4, 5]) AS tn(n),
           unnest(generate_series(1, len(w) - n + 1)) AS t(gs)
      WHERE len(w) >= n
    ),
    counts AS (
      SELECT doc_id, n, count(*) AS cnt, count(*) * length(g) AS mass
      FROM grams GROUP BY doc_id, n, g
    ),
    aggs AS (
      SELECT doc_id,
             max(CASE WHEN n = 2 AND cnt > 1 THEN mass END) AS t2,
             max(CASE WHEN n = 3 AND cnt > 1 THEN mass END) AS t3,
             max(CASE WHEN n = 4 AND cnt > 1 THEN mass END) AS t4,
             sum(CASE WHEN n = 5 AND cnt > 1 THEN mass END) AS d5
      FROM counts GROUP BY doc_id
    ),
    fracs AS (
      SELECT p.doc_id,
             CASE WHEN n_chars > 0 THEN round(coalesce(t2, 0) / n_chars, 6) ELSE 0.0 END AS top2_frac,
             CASE WHEN n_chars > 0 THEN round(coalesce(t3, 0) / n_chars, 6) ELSE 0.0 END AS top3_frac,
             CASE WHEN n_chars > 0 THEN round(coalesce(t4, 0) / n_chars, 6) ELSE 0.0 END AS top4_frac,
             CASE WHEN n_chars > 0 THEN round(coalesce(d5, 0) / n_chars, 6) ELSE 0.0 END AS dup5_frac,
             mean_word_len, frac_dup_words
      FROM per_doc p LEFT JOIN aggs a ON p.doc_id = a.doc_id
    )
    SELECT doc_id, top2_frac, top3_frac, top4_frac, dup5_frac,
           mean_word_len, frac_dup_words,
           CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0
                AND top2_frac <= 0.20 AND top3_frac <= 0.18
                AND top4_frac <= 0.16 AND dup5_frac <= 0.15 AS INT) AS keep
    FROM fracs"""
    # dup clusters = transitive closure (recursive CTE) over the SAME
    # pair SQL the docs_minhash_lsh oracle uses — cluster_id is the min
    # reachable doc_id, exactly the fixpoint the Spark label propagation
    # converges to.
    sql["docs_dup_clusters"] = f"""
        WITH RECURSIVE pairs AS ({sql['docs_minhash_lsh']}),
        edges AS (
          SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION ALL
          SELECT doc_b AS u, doc_a AS v FROM pairs
        ),
        nodes AS (SELECT DISTINCT u FROM edges),
        reach(u, v) AS (
          SELECT u, u FROM nodes
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        )
        SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u"""
    return sql
