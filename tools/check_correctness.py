"""Local stand-in for the driver's correctness gate: run each queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB
(row count + column names + order-insensitive values).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"okNA {name}: {len(mine)} rows (no oracle) [{dt:.1f}s]")
            continue
        try:
            ref = canon(con.execute(sql).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(ref.columns)}")
            failures += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} != {len(ref)}")
            failures += 1
            continue
        if not mine.equals(ref):
            neq = (mine != ref).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(mine)} differing rows")
            print(pd.concat([mine[neq].head(3), ref[neq].head(3)]))
            failures += 1
            continue
        print(f"PASS {name}: {len(mine)} rows [{dt:.1f}s]")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
