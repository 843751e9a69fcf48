"""ANN parameter tuning harness: sweep (n_planes, n_tables) against an
exact brute-force baseline and report recall@k + candidate cost.

Why this exists: sign-LSH recall is data-dependent (per-pair collision
probability p ≈ 1 - θ/π depends on the corpus' angular distribution), so
fixed parameters tuned on one corpus are a guess on another. At 100 TB
you tune on a SAMPLE — the per-pair recall formula
``1 - (1 - p^n_planes)^n_tables`` is distribution-free given p, so
recall measured on a uniform sample transfers to the full corpus, while
cost (candidate fraction) scales linearly with corpus size by design.

Outputs one row per parameter point:

* ``recall_at_k`` — |ANN∩exact| / k averaged over queries (ties broken
  identically in both paths: cosine desc, vec_id asc).
* ``candidates_per_query`` — distinct vectors the cosine re-rank scores
  per query (the real cost driver).
* ``cost_fraction`` — candidates / (|corpus|·|queries|): 1.0 would be
  brute force; the whole point is « 1 at equal recall.

Driver: scripts/ann_sweep.py (writes the curve the SCALE.md ANN section
documents). The bench JSON separately pins the shipped parameters'
latency ratio vs the exact twin (bench.py extra.ann_twin_ratio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import ann_candidate_pairs, ann_topk, brute_force_topk

#: default sweep grid: planes × tables — 2^planes buckets per table
DEFAULT_GRID: list[tuple[int, int]] = [
    (4, 1), (4, 2), (4, 4),
    (6, 2), (6, 4), (6, 8),
    (8, 2), (8, 4), (8, 8),
    (10, 4), (10, 8),
]


def sweep_ann_params(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    grid: list[tuple[int, int]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
    seed: int = 42,
) -> list[dict]:
    """Measure each grid point against the exact baseline. Sized for a
    SAMPLE (the baseline is the O(|corpus|·|queries|) cross join): at
    corpus scale pass .sample()d inputs — recall transfers, cost scales
    linearly."""
    grid = grid if grid is not None else DEFAULT_GRID
    n_vec = vectors.count()
    if n_vec == 0:
        raise ValueError("sweep_ann_params: `vectors` (the corpus) is empty")
    exact = brute_force_topk(
        vectors, queries, k, id_col, vec_col, qid_col, qvec_col
    ).collect()
    truth: dict = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    n_q = len(truth)
    if n_q == 0:
        raise ValueError("sweep_ann_params: `queries` is empty — nothing to score")
    out = []
    for n_planes, n_tables in grid:
        got: dict = {}
        ann = ann_topk(
            vectors, queries, dim, k, n_planes, n_tables,
            id_col, vec_col, qid_col, qvec_col, seed,
        ).collect()
        for r in ann:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        recall = (
            sum(len(got.get(q, set()) & t) / len(t) for q, t in truth.items()) / n_q
        )
        n_cand = ann_candidate_pairs(
            vectors, queries, dim, n_planes, n_tables,
            id_col, vec_col, qid_col, qvec_col, seed,
        ).count()
        out.append({
            "n_planes": n_planes,
            "n_tables": n_tables,
            "recall_at_k": round(recall, 4),
            "candidates_per_query": round(n_cand / n_q, 1),
            "cost_fraction": round(n_cand / (n_vec * n_q), 4),
        })
    return out


def best_params(
    sweep: list[dict], min_recall: float = 0.9
) -> dict | None:
    """Cheapest point meeting the recall floor (None if none does)."""
    ok = [r for r in sweep if r["recall_at_k"] >= min_recall]
    return min(ok, key=lambda r: r["cost_fraction"]) if ok else None


#: default IVF sweep grid: (n_list, n_probe) — cost_fraction ≈ n_probe/n_list
#: for a balanced quantizer, so the grid spans ~6%-50% of brute force
DEFAULT_IVF_GRID: list[tuple[int, int]] = [
    (8, 1), (8, 2), (8, 4),
    (16, 1), (16, 2), (16, 4), (16, 8),
    (32, 2), (32, 4), (32, 8),
]


def sweep_ivf_params(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    grid: list[tuple[int, int]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
) -> list[dict]:
    """The IVF-Flat twin of sweep_ann_params: measure each (n_list,
    n_probe) point against the same exact baseline. Same output row
    shape (``n_list``/``n_probe`` instead of ``n_planes``/``n_tables``)
    so best_params works on either family's sweep. Centroids train ONCE
    per n_list (deterministic, so reusable) and every n_probe point
    shares them — n_probe only changes the query-side probe width.
    Candidate count needs no second job: it is the exact size of the
    probed lists, ``Σ_q Σ_{probed list} |list|``, computed from one
    corpus-side list histogram."""
    from .similarity import ivf_topk, make_ivf_assign_udf, train_ivf_centroids

    grid = grid if grid is not None else DEFAULT_IVF_GRID
    n_vec = vectors.count()
    if n_vec == 0:
        raise ValueError("sweep_ivf_params: `vectors` (the corpus) is empty")
    exact = brute_force_topk(
        vectors, queries, k, id_col, vec_col, qid_col, qvec_col
    ).collect()
    truth: dict = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    n_q = len(truth)
    if n_q == 0:
        raise ValueError("sweep_ivf_params: `queries` is empty — nothing to score")

    out = []
    for n_list in sorted({nl for nl, _ in grid}):
        centroids = train_ivf_centroids(vectors, dim, n_list, id_col=id_col, vec_col=vec_col)
        index_udf = make_ivf_assign_udf(centroids, 1)
        sizes = dict(
            vectors.select(
                F.element_at(index_udf(F.col(vec_col)), 1).alias("list_id")
            ).groupBy("list_id").count().collect()
        )
        for nl, n_probe in grid:
            if nl != n_list:
                continue
            got: dict = {}
            for r in ivf_topk(
                vectors, queries, dim, k, n_list, n_probe,
                id_col, vec_col, qid_col, qvec_col, centroids=centroids,
            ).collect():
                got.setdefault(r["query_id"], set()).add(r["vec_id"])
            recall = (
                sum(len(got.get(q, set()) & t) / len(t) for q, t in truth.items()) / n_q
            )
            probe_udf = make_ivf_assign_udf(centroids, n_probe)
            probed = queries.select(
                F.explode(probe_udf(F.col(qvec_col))).alias("list_id")
            ).collect()
            n_cand = sum(sizes.get(r["list_id"], 0) for r in probed)
            out.append({
                "n_list": n_list,
                "n_probe": min(n_probe, len(centroids)),
                "recall_at_k": round(recall, 4),
                "candidates_per_query": round(n_cand / n_q, 1),
                "cost_fraction": round(n_cand / (n_vec * n_q), 4),
            })
    return out
