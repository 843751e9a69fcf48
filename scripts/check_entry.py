"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
at sf0.01, compare row-count + column names + order-insensitive value
hash. Usage: python scripts/check_entry.py [sf_dir] [only_query]"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from loong_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("check-entry", cores=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name != only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        ok_n = len(s_rows) == len(d_rows)
        ok_c = sorted(s_cols) == sorted(d_cols)
        ok_h = ok_n and ok_c and frame_hash(s_cols, s_rows) == frame_hash(d_cols, d_rows)
        status = "OK   " if (ok_n and ok_c and ok_h) else "FAIL "
        if not (ok_n and ok_c and ok_h):
            failures.append(name)
        print(
            f"{status}{name}: rows {len(s_rows)}/{len(d_rows)} cols_match={ok_c} "
            f"hash_match={ok_h} [{time.time()-t0:.1f}s]"
        )
        if not ok_h and ok_n and ok_c and len(s_rows) < 100000:
            si = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            di = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            s_set = sorted("|".join(norm_cell(r[i]) for i in si) for r in s_rows)
            d_set = sorted("|".join(norm_cell(r[i]) for i in di) for r in d_rows)
            diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
            for a, b in diffs:
                print(f"      spark={a}\n      duck ={b}")
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
