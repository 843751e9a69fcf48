"""ANN (n_planes, n_tables) sweep vs the exact baseline — produces the
recall/cost curve documented in SCALE.md's ANN section.

Usage: python scripts/ann_sweep.py [sf_dir] [n_queries]
       (defaults: /root/testdata/sf0.01, 8 queries)
       --ivf sweeps the IVF-Flat (n_list, n_probe) grid instead of LSH

Prints one JSON line per grid point plus a markdown table; prints the
cheapest point reaching recall 0.9, or null. Null is a MEASUREMENT, not
a failure: on angularly-uniform corpora (the sf* embeddings fixture is
~uniform random — LSH's worst case) no sign-LSH parameterization reaches
0.9 without approaching brute-force cost, and the harness shows exactly
that; clustered corpora (the production shape for near-dup retrieval,
tests/test_text_ops.py fixtures) qualify easily. Pass --clustered to
sweep a synthetic clustered corpus instead of sf embeddings.

At 100 TB the same harness runs over .sample()d inputs: recall measured
on a uniform sample transfers (the per-pair collision probability is a
property of the angular distribution, not the corpus size); cost_fraction
scales linearly by construction.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from loong_spark.session import get_spark  # noqa: E402
from loong_spark.text.ann_tuning import (  # noqa: E402
    best_params,
    sweep_ann_params,
    sweep_ivf_params,
)


def _clustered_corpus(n_base: int = 400, dups_per: int = 4, dim: int = 64, seed: int = 29):
    """Deterministic clustered corpus (near-dup retrieval shape): n_base
    anchors, each with dups_per slightly-perturbed members."""
    import random

    rnd = random.Random(seed)
    rows, vid = [], 0
    for _ in range(n_base):
        base = [rnd.uniform(-1, 1) for _ in range(dim)]
        rows.append((vid, base))
        vid += 1
        for _ in range(dups_per):
            rows.append((vid, [x + rnd.uniform(-0.01, 0.01) for x in base]))
            vid += 1
    return rows


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("--clustered", "--ivf")]
    clustered = "--clustered" in sys.argv[1:]
    ivf = "--ivf" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    n_queries = int(args[1]) if len(args) > 1 else 8
    spark = get_spark("ann-sweep", cores=8)
    from pyspark.sql import functions as F

    if clustered:
        rows_in = _clustered_corpus()
        e = spark.createDataFrame(rows_in, "vec_id int, embedding array<float>")
        q = e.filter(F.pmod(F.col("vec_id"), F.lit(len(rows_in) // n_queries)) == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
    else:
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = e.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
    sweep_fn = sweep_ivf_params if ivf else sweep_ann_params
    a_key, b_key = ("n_list", "n_probe") if ivf else ("n_planes", "n_tables")
    rows = sweep_fn(e, q, dim=64, k=5)
    for r in rows:
        print(json.dumps(r))
    print(f"\n| {a_key} | {b_key} | recall@5 | cand/query | cost fraction |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r[a_key]} | {r[b_key]} | {r['recall_at_k']} "
            f"| {r['candidates_per_query']} | {r['cost_fraction']} |"
        )
    best = best_params(rows, min_recall=0.9)
    print(f"\nbest (recall ≥ 0.9, cheapest): {json.dumps(best)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
