"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline: cross join
  (broadcast query side) + JVM-side dot product via zip_with/aggregate.
* LSH-bucketed ANN (random signed hyperplanes) — the scale path: each
  vector maps to a sign-bit bucket; search joins only same-bucket pairs.
  Hyperplanes derive deterministically from md5(seed, plane, dim) so
  results are reproducible without storing the planes.
* IVF-Flat ANN (spherical k-means coarse quantizer) — the second scale
  path: centroids train driver-side on a bounded deterministic sample,
  each corpus vector indexes into exactly ONE inverted list, queries
  probe their n_probe nearest lists. Search is an equi-join on list_id.
* embedding-cosine near-dup — pairs with cosine ≥ threshold.

Scalar cosine stays JVM-side (F.zip_with, F.aggregate); BULK linear
algebra is Arrow-batched numpy — `cosine_pandas` for wide vectors and
`make_lsh_probes_udf` for probe generation (one matmul per batch; the
interpreted higher-order-function fold costs ~100× per dot product and
measurably dominated the corpus scan). Never per-row Python.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


@pandas_udf(T.DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched numpy cosine for wide vectors (dim ≥ ~256)."""
    av = np.stack(a.to_numpy())
    bv = np.stack(b.to_numpy())
    num = (av * bv).sum(axis=1)
    den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
    return pd.Series(np.where(den == 0, 0.0, num / den))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
    use_pandas: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query. Query side broadcasts (small);
    the corpus scan is one pass, no shuffle until the per-query top-k
    (window over ≤ |corpus| rows per query — two-phase via partial
    TakeOrdered under AQE)."""
    q = F.broadcast(
        queries.select(F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("_qv"))
    )
    joined = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")).crossJoin(q)
    cos = (
        cosine_pandas(F.col("_v"), F.col("_qv"))
        if use_pandas
        else cosine_col(F.col("_v").cast("array<double>"), F.col("_qv").cast("array<double>"))
    )
    scored = joined.select("query_id", "vec_id", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rk").alias("rank"))
    )


def _hyperplane(seed: int, plane: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane from md5 — reproducible anywhere."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}:{plane}:{d}".encode()).digest()
        out.append(1.0 if h[0] & 1 else -1.0)
    return out


def lsh_bucket_col(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-bit bucket id: bit p = (vec · hyperplane_p) >= 0. JVM-side:
    the hyperplanes are literal arrays folded into the plan."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(seed, p, dim)])
        bit = F.when(dot_col(vec.cast("array<double>"), plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_probes_col(vec: Column, dim: int, n_planes: int, n_tables: int, seed: int = 42) -> Column:
    """array<struct<table:int, bucket:int>> — one sign-bucket per hash
    table (independent hyperplane sets). Exploding this and equi-joining
    on (table, bucket) gives multi-table LSH in ONE shuffle instead of
    n_tables unions; per-pair recall = 1-(1-p^n_planes)^n_tables where p
    is the per-plane collision probability (≈ 1-θ/π).

    This is the JVM REFERENCE implementation: n_tables × n_planes
    interpreted higher-order-function dot products per row cost ~100×
    a numpy matmul and dominate the corpus scan (measured: the probe
    projection alone ran 7× the full brute-force cosine at sf0.1) — the
    hot paths use :func:`make_lsh_probes_udf`, whose bucket equality
    with this expression is test-pinned."""
    return F.array(*[
        F.struct(
            F.lit(t).alias("table"),
            lsh_bucket_col(vec, dim, n_planes, seed + 7919 * t).alias("bucket"),
        )
        for t in range(n_tables)
    ])


def _planes_matrix(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> np.ndarray:
    """(n_tables·n_planes, dim) ±1 hyperplane matrix, same derivation
    order as lsh_probes_col (table-major, seed + 7919·t per table)."""
    rows = []
    for t in range(n_tables):
        s = seed + 7919 * t
        for p in range(n_planes):
            rows.append(_hyperplane(s, p, dim))
    return np.asarray(rows, dtype=np.float64)


def make_lsh_probes_udf(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    """Arrow-batched probe generator: ``array<int>`` of one sign-bucket
    per table (index = table id — posexplode recovers (table, bucket)).
    One float64 matmul per Arrow batch (``V @ P.T``) replaces
    n_tables × n_planes interpreted HOF folds per ROW; the hyperplanes
    fold into the closure (config-sized), so executors pay no lookup.
    Produces bit-identical buckets to lsh_probes_col except where a dot
    product is within float summation-order rounding of exactly 0 —
    pinned by tests/test_text_ops.py::test_probes_udf_matches_jvm."""
    planes = _planes_matrix(dim, n_planes, n_tables, seed)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (mat @ planes.T) >= 0  # (n, n_tables·n_planes)
        buckets = bits.reshape(len(mat), n_tables, n_planes) @ weights
        return pd.Series(list(buckets.astype(np.int32)))

    return probes


def ann_candidate_pairs(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """The ANN probe stage alone: distinct (query, vector) pairs sharing
    ANY of the n_tables sign-buckets — the rows the cosine re-rank will
    score. Exposed separately so the tuning harness (ann_tuning.py) can
    measure candidate COST per parameter point; ann_topk consumes it.
    Probe generation is the Arrow-batched matmul (make_lsh_probes_udf) —
    one numpy product per batch, not per-row HOF folds."""
    probes = make_lsh_probes_udf(dim, n_planes, n_tables, seed)
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        F.posexplode(probes(F.col(vec_col))).alias("table", "bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(qid_col).alias("query_id"),
            F.col(qvec_col).alias("_qv"),
            F.posexplode(probes(F.col(qvec_col))).alias("table", "bucket"),
        )
    )
    return v.join(q, ["table", "bucket"]).select("query_id", "vec_id", "_v", "_qv").distinct()


def ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share ANY of the query's n_tables
    LSH buckets (multi-table probing — single-table single-probe recall
    collapses at corpus scale), then exact cosine re-rank over the
    distinct candidates. At 100 TB the probe join is a co-partitioned
    equi-join on (table, bucket) — candidate rows per query ≈
    n_tables × corpus / 2^n_planes — instead of a full cross join; the
    distinct() dedups vectors colliding in several tables BEFORE the
    (expensive) cosine, so each candidate is scored once."""
    cand = ann_candidate_pairs(
        vectors, queries, dim, n_planes, n_tables,
        id_col, vec_col, qid_col, qvec_col, seed,
    )
    scored = cand.select(
        "query_id", "vec_id",
        F.round(cosine_col(F.col("_v").cast("array<double>"), F.col("_qv").cast("array<double>")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rk").alias("rank"))
    )


def cosine_near_dup_pairs(
    vectors: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int | None = None, n_planes: int = 6, n_tables: int = 4,
    seed: int = 42, exact: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine ≥ threshold).

    Default (exact=False) is the scale path: multi-table LSH candidate
    generation — pairs collide iff they share a sign-bucket in ANY of
    n_tables independent hyperplane sets — followed by the exact cosine
    computed per candidate pair. The threshold filter IS the exact
    verify, so precision = 1.0 by construction; multi-table probing
    keeps recall high (per-pair ≈ 1-(1-p^n_planes)^n_tables,
    pytest-bounded ≥ 0.9 vs brute force in tests/test_text_ops.py).
    The candidate join is an equi-join on (table, bucket) — never the
    O(n²) self-join.

    exact=True keeps the full self-join as the small-scale oracle flag
    (requires no dim; quadratic — never use at corpus scale)."""
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    if not exact:
        if dim is None:
            raise ValueError("dim is required for the LSH path (exact=False)")
        probes = make_lsh_probes_udf(dim, n_planes, n_tables, seed)
        probed = v.select(
            "vec_id", "_v",
            F.posexplode(probes(F.col("_v"))).alias("table", "bucket"),
        )
        a, b = probed.alias("a"), probed.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.table") == F.col("b.table"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            # one cosine per pair even when it collides in several tables
            .select(
                F.col("a.vec_id").alias("vec_a"), F.col("a._v").alias("_va"),
                F.col("b.vec_id").alias("vec_b"), F.col("b._v").alias("_vb"),
            )
            .distinct()
        )
    else:
        a, b = v.alias("a"), v.alias("b")
        pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
            F.col("a.vec_id").alias("vec_a"), F.col("a._v").alias("_va"),
            F.col("b.vec_id").alias("vec_b"), F.col("b._v").alias("_vb"),
        )
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.round(
                cosine_col(F.col("_va").cast("array<double>"), F.col("_vb").cast("array<double>")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# --------------------------------------------------------------------------
# IVF-Flat: spherical k-means coarse quantizer + inverted-list search.
# Training is a SAMPLE problem (FAISS trains its quantizers on a bounded
# sample too); ASSIGNMENT and SEARCH are the scale problems and stay
# distributed — one Arrow matmul per batch, one equi-join on list_id.


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    """L2-normalize rows; zero rows stay zero (cosine 0 to everything)."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(norms == 0.0, 1.0, norms)


def train_ivf_centroids(
    vectors: DataFrame,
    dim: int,
    n_list: int = 16,
    n_iters: int = 10,
    sample_limit: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means centroids ``(n_list, dim)`` from a bounded,
    DETERMINISTIC corpus sample — no RNG, no Date.now, reproducible
    across runs and partitionings:

    * sample membership = ``xxhash64(id) % ratio == 0`` with
      ratio = ceil(count / sample_limit) — a hash-bucket filter is a
      deterministic SET (unlike ``.limit`` after a scan), costs one
      column-pruned pass, and never sorts the corpus;
    * the collected sample (≈ sample_limit rows, hard-capped at
      2 × sample_limit driver-side after an md5 tie-break sort of the
      SAMPLE only) is the one bounded ``.collect()`` here — documented,
      config-sized, the same contract as the LSH plane closures;
    * init = every ⌊m/n_list⌋-th sample row in md5-of-id order (hash
      order ≈ random, stable); Lloyd iterations assign by max dot on
      unit rows (= cosine), empty clusters keep their previous centroid,
      centroids re-normalize each round (spherical k-means).

    n_list clamps to the sample size when the corpus is tiny."""
    if n_list < 1:
        raise ValueError(f"n_list must be >= 1, got {n_list}")
    n = vectors.count()
    if n == 0:
        raise ValueError("train_ivf_centroids: `vectors` is empty")
    ratio = max(1, -(-n // sample_limit))  # ceil div
    samp = (
        vectors.filter(F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(ratio)) == 0)
        .select(
            F.md5(F.col(id_col).cast("string")).alias("_ord"),
            F.col(vec_col).alias("_v"),
        )
        .collect()
    )
    samp.sort(key=lambda r: r["_ord"])
    X = np.asarray([r["_v"] for r in samp[: 2 * sample_limit]], dtype=np.float64)
    if X.shape[1] != dim:
        raise ValueError(f"vector dim {X.shape[1]} != declared dim {dim}")
    Xu = _unit_rows(X)
    m = len(Xu)
    k = min(n_list, m)
    C = _unit_rows(Xu[:: max(1, m // k)][:k].copy())
    k = len(C)  # stride rounding can undershoot on tiny samples
    for _ in range(n_iters):
        assign = np.argmax(Xu @ C.T, axis=1)  # first max wins ties — stable
        newC = np.zeros_like(C)
        np.add.at(newC, assign, Xu)
        counts = np.bincount(assign, minlength=k)
        empty = counts == 0
        newC[empty] = C[empty]
        C = _unit_rows(newC)
    return C


def make_ivf_assign_udf(centroids: np.ndarray, n_probe: int = 1):
    """Arrow-batched IVF assignment: ``array<int>`` of the ``n_probe``
    nearest centroid ids by cosine, similarity-descending (stable-sorted
    — deterministic under ties). One float64 matmul per batch; the
    centroid matrix folds into the closure (config-sized, like the LSH
    planes), so executors pay no lookup. ``n_probe=1`` indexes the
    corpus (each vector → exactly one inverted list); queries probe
    ``n_probe`` lists."""
    C = _unit_rows(np.asarray(centroids, dtype=np.float64))
    n_probe = min(n_probe, len(C))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(v: pd.Series) -> pd.Series:
        mat = _unit_rows(np.stack(v.to_numpy()).astype(np.float64))
        idx = np.argsort(-(mat @ C.T), axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(idx.astype(np.int32)))

    return assign


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_list: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    sample_limit: int = 100_000,
) -> DataFrame:
    """IVF-Flat approximate top-k: corpus vectors index into ONE
    inverted list each (nearest centroid); each query probes its
    ``n_probe`` nearest lists; exact cosine re-ranks the candidates.

    At 100 TB the search is one equi-join on ``list_id`` — the corpus
    side shuffles (or is bucketed) on list_id ONCE at index time and
    every later query batch broadcasts its probed list ids against it;
    candidate rows per query ≈ n_probe/n_list of the corpus, and unlike
    LSH multi-probe no ``distinct()`` is needed (one list per corpus
    vector ⇒ a (query, vector) pair can only arise once). Pass
    ``centroids`` to reuse a trained quantizer across query batches
    instead of re-training per call."""
    if centroids is None:
        centroids = train_ivf_centroids(
            vectors, dim, n_list, sample_limit=sample_limit,
            id_col=id_col, vec_col=vec_col,
        )
    index_udf = make_ivf_assign_udf(centroids, 1)
    probe_udf = make_ivf_assign_udf(centroids, n_probe)
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        F.element_at(index_udf(F.col(vec_col)), 1).alias("list_id"),
    )
    q = F.broadcast(
        queries.select(
            F.col(qid_col).alias("query_id"),
            F.col(qvec_col).alias("_qv"),
            F.explode(probe_udf(F.col(qvec_col))).alias("list_id"),
        )
    )
    scored = v.join(q, "list_id").select(
        "query_id", "vec_id",
        F.round(
            cosine_col(F.col("_v").cast("array<double>"), F.col("_qv").cast("array<double>")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rk").alias("rank"))
    )
