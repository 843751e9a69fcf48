"""Training-data ops: dedup / similarity / quality / multimodal plumbing."""

import math

import pytest
from pyspark.sql import functions as F

from loong_spark.text.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_col,
    simhash_duplicates,
    simhash_near_duplicates,
)
from loong_spark.text.multimodal import (
    extract_image_features,
    media_table_from_docs,
    sample_video_frames,
)
from loong_spark.text.quality import (
    fingerprint_col,
    lang_id_col,
    quality_score_col,
    token_count_col,
)
from loong_spark.text.similarity import ann_topk, brute_force_topk, cosine_near_dup_pairs


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),          # near dup
        (4, "der hund und die katze ist ein tier"),                  # German
        (5, "completely unrelated text about spark engines and data"),
        (6, "  THE  Quick   Brown fox JUMPS over the lazy dog "),    # normalized dup of 1
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_dedup(docs):
    groups = exact_duplicates(docs, "doc_id", "text").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["member_ids"] == [1, 2, 6] and g["keeper_id"] == 1


def test_ngram_jaccard(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0 and pairs[(1, 6)] == 1.0 and pairs[(2, 6)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0  # near dup
    assert (1, 5) not in pairs


def test_minhash_lsh_finds_near_dups(docs):
    got = {(r["doc_a"], r["doc_b"]) for r in
           minhash_lsh_pairs(docs, num_hashes=32, bands=16, verify_threshold=0.5).collect()}
    assert {(1, 2), (1, 6), (2, 6), (1, 3)} <= got
    # verified pairs are a subset of exact-jaccard pairs (precision 1.0)
    exact = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert got <= exact


def test_minhash_signature_deterministic(docs):
    s1 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs, num_hashes=8).collect()}
    s2 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs, num_hashes=8).collect()}
    assert s1 == s2
    assert s1[1] == s1[2]  # identical docs → identical signatures


def test_simhash_buckets(docs):
    groups = simhash_duplicates(docs).collect()
    by_members = [tuple(g["member_ids"]) for g in groups]
    assert any({1, 2, 6} <= set(m) for m in by_members)


def test_quality_and_lang(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in a house of wool and is happy"),
            (2, "der hund und die katze ist ein"),
            (3, "le chat et la vache est un animal des bois"),
            (4, "!!! ??? ***"),
            (5, ""),
        ],
        "id int, text string",
    )
    rows = {r["id"]: r for r in df.select(
        "id",
        lang_id_col(F.col("text")).alias("lang"),
        token_count_col(F.col("text")).alias("n_tok"),
        quality_score_col(F.col("text")).alias("q"),
        fingerprint_col(F.col("text")).alias("fp"),
    ).collect()}
    assert rows[1]["lang"] == "en" and rows[2]["lang"] == "de" and rows[3]["lang"] == "fr"
    assert rows[4]["lang"] == "und"
    assert rows[1]["n_tok"] == 14 and rows[5]["n_tok"] == 0
    assert rows[1]["q"] > rows[4]["q"]
    assert len(rows[1]["fp"]) == 32


def test_brute_force_topk(spark):
    vecs = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)]
        + [(10, [1.0, 0.1, 0.0, 0.0])],
        "vec_id int, embedding array<float>",
    )
    qs = spark.createDataFrame([(0, [1.0, 0.0, 0.0, 0.0])], "query_id int, embedding array<float>")
    got = brute_force_topk(vecs, qs, k=2).collect()
    assert [r["vec_id"] for r in got] == [0, 10]
    assert got[0]["cosine"] == 1.0 and got[0]["rank"] == 1


def test_ann_topk_contains_exact_hit(spark):
    import random

    rnd = random.Random(7)
    vecs = spark.createDataFrame(
        [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(200)],
        "vec_id int, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(0, [rnd.uniform(-1, 1) for _ in range(8)])], "query_id int, embedding array<float>"
    )
    exact = brute_force_topk(vecs, q, k=1).collect()[0]
    approx = ann_topk(vecs, q, dim=8, k=5, n_planes=4).collect()
    # the ANN result must be exact among its bucket and well-formed
    assert all(a["cosine"] <= exact["cosine"] + 1e-9 for a in approx)
    assert [a["rank"] for a in approx] == sorted(a["rank"] for a in approx)


def test_cosine_near_dup(spark):
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [0.0, 1.0])],
        "vec_id int, embedding array<float>",
    )
    # exact oracle flag
    pairs = cosine_near_dup_pairs(vecs, threshold=0.99, exact=True).collect()
    assert len(pairs) == 1 and (pairs[0]["vec_a"], pairs[0]["vec_b"]) == (1, 2)
    # default (LSH) path finds the same pair here — near-identical vectors
    # land in the same sign-bucket of every table
    lsh = cosine_near_dup_pairs(vecs, threshold=0.99, dim=2).collect()
    assert len(lsh) == 1 and (lsh[0]["vec_a"], lsh[0]["vec_b"]) == (1, 2)


def _clustered_vectors(n_base: int, dups_per: int, dim: int, seed: int = 11):
    """Deterministic corpus: n_base random unit-ish vectors, each with
    dups_per slightly-perturbed near-duplicates (cosine ≈ 0.99+)."""
    import random

    rnd = random.Random(seed)
    rows = []
    vid = 0
    for _ in range(n_base):
        base = [rnd.uniform(-1, 1) for _ in range(dim)]
        rows.append((vid, base))
        vid += 1
        for _ in range(dups_per):
            rows.append((vid, [x + rnd.uniform(-0.01, 0.01) for x in base]))
            vid += 1
    return rows


def test_cosine_near_dup_lsh_recall(spark):
    """The default (multi-table LSH) path must keep precision 1.0 (its
    cosine filter is exact) and recall ≥ 0.9 vs the exact self-join."""
    rows = _clustered_vectors(n_base=30, dups_per=2, dim=16)
    vecs = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    exact = {(r["vec_a"], r["vec_b"])
             for r in cosine_near_dup_pairs(vecs, threshold=0.95, exact=True).collect()}
    lsh = {(r["vec_a"], r["vec_b"])
           for r in cosine_near_dup_pairs(vecs, threshold=0.95, dim=16).collect()}
    assert lsh <= exact  # precision 1.0
    assert exact, "fixture must plant qualifying pairs"
    assert len(lsh) / len(exact) >= 0.9


def test_ann_topk_recall(spark):
    """Multi-table ANN recall@5 ≥ 0.9 vs brute force on a clustered
    corpus (single-table single-probe is exactly what this guards
    against regressing to)."""
    rows = _clustered_vectors(n_base=40, dups_per=4, dim=16, seed=23)
    vecs = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    qs = spark.createDataFrame(
        [(r[0], r[1]) for r in rows if r[0] % 25 == 0], "query_id int, embedding array<float>"
    )
    exact = brute_force_topk(vecs, qs, k=5).collect()
    approx = ann_topk(vecs, qs, dim=16, k=5, n_planes=6, n_tables=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.9


def test_simhash_near_duplicates_exhaustive(docs, spark):
    """Pigeonhole block match has recall 1.0: the blocked join must equal
    the all-pairs hamming filter exactly."""
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_near_duplicates(docs, max_hamming=3).collect()}
    sims = {r["doc_id"]: r["simhash"]
            for r in docs.select(
                "doc_id", simhash_col(F.col("text")).alias("simhash")
            ).collect()}
    ids = sorted(sims)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sims[a] ^ sims[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want
    assert any(h == 0 for h in got.values())  # the exact-dup trio collides


def test_connected_components(spark):
    from loong_spark.text.dedup import connected_components

    # two components: {1,2,3,7} via a path (diameter 3 — needs real
    # iteration, not one hop) and {10,11}; 99 isolated (not in pairs)
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (3, 7), (10, 11)], "doc_a int, doc_b int"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_exact_dedup_member_cap(spark):
    """A pathological dup group must not materialize an unbounded
    member_ids array; group_size stays exact."""
    rows = [(i, "same text every time") for i in range(10_000)] + [(10_000, "unique")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    g = exact_duplicates(docs, max_members=100).collect()
    assert len(g) == 1
    assert g[0]["group_size"] == 10_000
    assert g[0]["member_ids"] == list(range(100))  # smallest ids kept


def test_multimodal_plumbing(spark):
    media = spark.createDataFrame(
        [(str(i), f"media://h{i}/x.jpg", "image", bytes([i]) * (1024 * (i + 1))) for i in range(5)],
        "media_id string, media_ref string, kind string, bytes binary",
    )
    feats = extract_image_features(media).collect()
    assert len(feats) == 5
    f0 = next(f for f in feats if f["media_id"] == "0")
    assert 64 <= f0["width"] < 256 and len(f0["feature"]) == 8
    # determinism
    again = next(f for f in extract_image_features(media).collect() if f["media_id"] == "0")
    assert again["phash"] == f0["phash"]

    frames = sample_video_frames(media, every_n=1).groupBy("media_id").count().collect()
    assert {r["media_id"]: r["count"] for r in frames}["4"] == 5


def test_ann_topk_recall_10x(spark):
    """Recall@5 ≥ 0.9 held at a 10× corpus (2000 vectors, 16 queries):
    bucket occupancy grows with corpus size, so this is the assertion
    that the multi-table probe parameters survive scale-up rather than
    only the toy fixture (SCALE.md ANN note)."""
    rows = _clustered_vectors(n_base=400, dups_per=4, dim=16, seed=29)
    vecs = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    qs = spark.createDataFrame(
        [(r[0], r[1]) for r in rows if r[0] % 125 == 0], "query_id int, embedding array<float>"
    )
    exact = brute_force_topk(vecs, qs, k=5).collect()
    approx = ann_topk(vecs, qs, dim=16, k=5, n_planes=6, n_tables=4).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert len(exact_sets) >= 10
    assert hits / total >= 0.9, f"recall {hits}/{total} at 10x corpus"


def test_ann_tuning_sweep(spark):
    """The (n_planes, n_tables) tuning harness: recall/cost measured vs
    the exact baseline; more tables at the same planes never hurts recall
    (supersets of candidates, deterministic seeds) and always costs more;
    best_params picks the cheapest point over the recall floor."""
    from loong_spark.text.ann_tuning import best_params, sweep_ann_params

    # dups_per=4 → 5-member clusters: the true top-5 is the cluster, so
    # recall measures the LSH probes, not luck on a random 5th neighbor
    rows = _clustered_vectors(n_base=60, dups_per=4, dim=16, seed=31)
    vecs = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    qs = spark.createDataFrame(
        [(r[0], r[1]) for r in rows if r[0] % 60 == 0],
        "query_id int, embedding array<float>",
    )
    grid = [(6, 1), (6, 4), (8, 8)]
    sweep = sweep_ann_params(vecs, qs, dim=16, k=5, grid=grid)
    by = {(r["n_planes"], r["n_tables"]): r for r in sweep}
    assert set(by) == set(grid)
    # more tables at fixed planes: candidate set is a superset → recall
    # monotone non-decreasing, cost strictly up (extra probe tables)
    assert by[(6, 4)]["recall_at_k"] >= by[(6, 1)]["recall_at_k"]
    assert by[(6, 4)]["candidates_per_query"] >= by[(6, 1)]["candidates_per_query"]
    # every point beats brute force on cost
    assert all(r["cost_fraction"] < 1.0 for r in sweep)
    # the shipped-parameter neighborhood reaches the 0.9 recall floor
    best = best_params(sweep, min_recall=0.9)
    assert best is not None
    # cheapest qualifying point: nothing qualifying is cheaper
    assert all(
        r["cost_fraction"] >= best["cost_fraction"]
        for r in sweep if r["recall_at_k"] >= 0.9
    )


def test_minhash_hash_family_agnostic(spark, docs):
    """VERDICT r4 #4: the opt-in xxhash64 family (one JVM intrinsic per
    slot instead of 32 md5 digests per shingle) yields the same candidate
    PAIR SET and the same verified output as the md5 family on the
    fixture — thresholded LSH is family-agnostic in distribution, and
    the exact-Jaccard verify step is family-independent by construction."""
    from loong_spark.text.dedup import minhash_lsh_pairs

    def pairs(fam, verify):
        return {
            tuple(r) for r in minhash_lsh_pairs(
                docs, num_hashes=32, bands=8, verify_threshold=verify,
                hash_family=fam,
            ).collect()
        }

    assert pairs("md5", None) == pairs("xxhash64", None)      # raw candidates
    verified = pairs("md5", 0.8)
    assert verified == pairs("xxhash64", 0.8) and verified    # verified output

    import pytest

    with pytest.raises(ValueError, match="hash_family"):
        minhash_lsh_pairs(docs, hash_family="sha9000")


def test_ann_tuning_sweep_rejects_empty_inputs(spark):
    """ADVICE r5: an empty corpus or query set raises a clear ValueError
    naming the empty input instead of a ZeroDivisionError mid-sweep."""
    import pytest

    from loong_spark.text.ann_tuning import sweep_ann_params

    rows = _clustered_vectors(n_base=10, dups_per=1, dim=16, seed=7)
    vecs = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    empty = spark.createDataFrame([], "query_id int, embedding array<float>")
    with pytest.raises(ValueError, match="queries.*empty"):
        sweep_ann_params(vecs, empty, dim=16, k=5, grid=[(4, 1)])
    no_corpus = spark.createDataFrame([], "vec_id int, embedding array<float>")
    qs = spark.createDataFrame(rows[:1], "query_id int, embedding array<float>")
    with pytest.raises(ValueError, match="corpus.*empty"):
        sweep_ann_params(no_corpus, qs, dim=16, k=5, grid=[(4, 1)])


def test_probes_udf_matches_jvm(spark):
    """The Arrow-batched probe matmul (the hot path) must produce the
    SAME (table, bucket) keys as the JVM reference expression — bucket
    equality is what makes the fast path a pure implementation swap."""
    from pyspark.sql import functions as F

    from loong_spark.text.similarity import lsh_probes_col, make_lsh_probes_udf

    rows = _clustered_vectors(n_base=25, dups_per=3, dim=16, seed=17)
    vecs = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    jvm = {
        (r.vec_id, r.table, r.bucket)
        for r in vecs.select(
            "vec_id",
            F.explode(lsh_probes_col(F.col("embedding"), 16, 6, 4)).alias("p"),
        ).select("vec_id", "p.table", "p.bucket").collect()
    }
    udf = make_lsh_probes_udf(16, 6, 4)
    fast = {
        (r.vec_id, r.table, r.bucket)
        for r in vecs.select(
            "vec_id", F.posexplode(udf(F.col("embedding"))).alias("table", "bucket")
        ).collect()
    }
    assert fast == jvm


def test_simhash_udf_matches_jvm(spark, docs):
    """The Arrow-batched SimHash (one md5 per token) must be
    bit-identical to the JVM reference expression (simhash_col) — on the
    shared docs fixture AND on whitespace edge cases where Python/Java
    normalization semantics could diverge (tabs/newlines at the edges,
    unicode spaces, empty text)."""
    from loong_spark.text.dedup import make_simhash_udf

    edge = spark.createDataFrame(
        [
            (100, "\tleading tab and  double  space"),
            (101, "trailing newline\n"),
            (102, "  only spaces  "),
            (103, ""),
            (104, "unicode nbsp inside"),
            (105, "MiXeD CaSe ÀÉÜ tokens"),
        ],
        "doc_id int, text string",
    )
    for df in (docs, edge):
        rows = df.select(
            "doc_id",
            simhash_col(F.col("text")).alias("jvm"),
            make_simhash_udf()(F.col("text")).alias("fast"),
        ).collect()
        assert rows and all(r.jvm == r.fast for r in rows), [
            (r.doc_id, r.jvm, r.fast) for r in rows if r.jvm != r.fast
        ]


def test_ivf_topk_recall(spark):
    """IVF-Flat recall@5 ≥ 0.9 vs brute force on a clustered corpus:
    a cluster's members share a nearest centroid, so the query's top
    list contains its whole near-dup cluster."""
    from loong_spark.text.similarity import ivf_topk

    rows = _clustered_vectors(n_base=40, dups_per=4, dim=16, seed=31)
    vecs = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    qs = spark.createDataFrame(
        [(r[0], r[1]) for r in rows if r[0] % 25 == 0], "query_id int, embedding array<float>"
    )
    exact = brute_force_topk(vecs, qs, k=5).collect()
    approx = ivf_topk(vecs, qs, dim=16, k=5, n_list=8, n_probe=3).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.9, f"IVF recall {hits}/{total}"
    # well-formed: per-query ranks are 1..n and cosines never beat exact top-1
    best = {r["query_id"]: r["cosine"] for r in exact if r["rank"] == 1}
    for q, rs in _group_rows(approx).items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert all(r["cosine"] <= best[q] + 1e-9 for r in rs)


def _group_rows(rows):
    out = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(r["query_id"], []).append(r)
    return out


def test_ivf_deterministic(spark):
    """Training has no RNG: same corpus → bit-identical centroids and
    identical search results across calls (and across the hash-bucket
    sample path when ratio > 1)."""
    import numpy as np

    from loong_spark.text.similarity import ivf_topk, train_ivf_centroids

    rows = _clustered_vectors(n_base=20, dups_per=3, dim=8, seed=5)
    vecs = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    c1 = train_ivf_centroids(vecs, dim=8, n_list=6)
    c2 = train_ivf_centroids(vecs, dim=8, n_list=6)
    assert np.array_equal(c1, c2)
    # sampled path (ratio > 1) is deterministic too
    s1 = train_ivf_centroids(vecs, dim=8, n_list=4, sample_limit=30)
    s2 = train_ivf_centroids(vecs, dim=8, n_list=4, sample_limit=30)
    assert np.array_equal(s1, s2)
    qs = spark.createDataFrame(rows[:2], "query_id int, embedding array<float>")
    r1 = sorted(map(tuple, ivf_topk(vecs, qs, dim=8, k=3, n_list=6, n_probe=2).collect()))
    r2 = sorted(map(tuple, ivf_topk(vecs, qs, dim=8, k=3, n_list=6, n_probe=2).collect()))
    assert r1 == r2 and r1


def test_ivf_train_guards(spark):
    """Empty corpus and dim mismatch raise; n_list clamps to the sample;
    n_probe clamps to n_list (full scan = brute-force equality)."""
    import pytest as _pytest

    from loong_spark.text.similarity import ivf_topk, train_ivf_centroids

    empty = spark.createDataFrame([], "vec_id int, embedding array<float>")
    with _pytest.raises(ValueError, match="empty"):
        train_ivf_centroids(empty, dim=4)
    tiny_rows = [(i, [float(i == j) for j in range(4)]) for i in range(3)]
    tiny = spark.createDataFrame(tiny_rows, "vec_id int, embedding array<float>")
    with _pytest.raises(ValueError, match="dim"):
        train_ivf_centroids(tiny, dim=7)
    c = train_ivf_centroids(tiny, dim=4, n_list=16)
    assert 1 <= len(c) <= 3
    # probing every list == exact: equals brute force on the tiny corpus
    qs = spark.createDataFrame(tiny_rows[:1], "query_id int, embedding array<float>")
    exact = sorted(map(tuple, brute_force_topk(tiny, qs, k=3).collect()))
    full = sorted(map(tuple, ivf_topk(tiny, qs, dim=4, k=3, n_list=16, n_probe=99).collect()))
    assert full == exact


def test_ivf_tuning_sweep(spark):
    """The IVF (n_list, n_probe) harness: same row shape as the LSH
    sweep (best_params works on it); more probes at fixed n_list never
    hurts recall (probed lists are a superset) and never costs less;
    the clustered corpus reaches the 0.9 floor below brute-force cost."""
    from loong_spark.text.ann_tuning import best_params, sweep_ivf_params

    rows = _clustered_vectors(n_base=60, dups_per=4, dim=16, seed=31)
    vecs = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    qs = spark.createDataFrame(
        [(r[0], r[1]) for r in rows if r[0] % 60 == 0],
        "query_id int, embedding array<float>",
    )
    grid = [(8, 1), (8, 3), (16, 2)]
    sweep = sweep_ivf_params(vecs, qs, dim=16, k=5, grid=grid)
    by = {(r["n_list"], r["n_probe"]): r for r in sweep}
    assert set(by) == set(grid)
    assert by[(8, 3)]["recall_at_k"] >= by[(8, 1)]["recall_at_k"]
    assert by[(8, 3)]["candidates_per_query"] >= by[(8, 1)]["candidates_per_query"]
    assert all(r["cost_fraction"] < 1.0 for r in sweep)
    best = best_params(sweep, min_recall=0.9)
    assert best is not None
    # cand/query from the list histogram must equal n_probe/n_list-ish
    # coverage: never more than the whole corpus
    assert all(r["candidates_per_query"] <= len(rows) for r in sweep)


# ------------------------------------------------------- gopher repetition
def _rep_ref(text, top_ns=(2, 3, 4), dup_ns=(5,)):
    """Pure-Python reference of gopher_repetition for one doc."""
    import re

    norm = re.sub(r"\s+", " ", text.strip().lower())
    w = norm.split(" ")
    n_chars = len(norm)
    out = {"mean_word_len": round((n_chars - (len(w) - 1)) / len(w), 6) if n_chars else 0.0,
           "frac_dup_words": round(1 - len(set(w)) / len(w), 6)}
    for kind, ns in (("top", top_ns), ("dup", dup_ns)):
        for n in ns:
            grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)] if len(w) >= n else []
            cnt = {}
            for g in grams:
                cnt[g] = cnt.get(g, 0) + 1
            if kind == "top":
                mass = max((c * len(g) for g, c in cnt.items() if c > 1), default=0)
            else:
                mass = sum(c * len(g) for g, c in cnt.items() if c > 1)
            out[f"{kind}{n}_frac"] = round(mass / n_chars, 6) if n_chars else 0.0
    return out


def test_gopher_repetition_matches_reference(spark):
    from loong_spark.text.quality import gopher_repetition

    texts = {
        1: "the quick brown fox jumps over the lazy dog near the quiet river bank today",
        2: "spam spam spam spam spam spam",
        3: "buy now buy now buy now buy now limited offer buy now buy now",
        4: "one two three four five six seven eight nine ten",
        5: "x",
        6: "a a a a a b b b b b a a a a a b b b b b",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_repetition(docs).collect()}
    for did, text in texts.items():
        ref = _rep_ref(text)
        for k, v in ref.items():
            assert got[did][k] == v, f"doc {did} {k}: {got[did][k]} != {v}"
    # the spam/boilerplate docs are dropped, normal prose survives
    assert got[1]["keep"] == 1
    assert got[4]["keep"] == 1
    assert got[2]["keep"] == 0  # one phrase is the whole doc
    assert got[3]["keep"] == 0  # repeated 2-gram over the limit
    assert got[6]["keep"] == 0  # repeated 5-grams over the limit
    assert got[5]["keep"] == 0  # mean word length below 3


def test_gopher_repetition_empty_and_short(spark):
    from loong_spark.text.quality import gopher_repetition

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "ab cd")], "doc_id int, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_repetition(docs).collect()}
    for did in (1, 2):  # empty docs: all fracs 0, dropped by word-length rule
        assert got[did]["top2_frac"] == 0.0
        assert got[did]["dup5_frac"] == 0.0
        assert got[did]["keep"] == 0
    assert got[3]["top2_frac"] == 0.0  # one UNREPEATED 2-gram never fires
    assert got[3]["dup5_frac"] == 0.0
