"""Local stand-in for the driver's correctness gate: run each queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB
(row count + column names + order-insensitive values).

Usage: python tools/check_correctness.py [--json OUT] [--cpus N]
                                         [sf_dir] [query ...]

--cpus sets ray.init num_cpus (default 8).  Run the gate once at 32 to
catch parallelism-dependent failures (empty groupby partitions emit
zero-column blocks only at higher partition counts).

With --json, per-query results (status, rows, seconds) are also written
to OUT as a machine-readable record of the full local gate.
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
    argv = list(sys.argv[1:])
    json_out = None
    num_cpus = 8
    while argv and argv[0] in ("--json", "--cpus"):
        if argv[0] == "--json":
            json_out = argv[1]
        else:
            num_cpus = int(argv[1])
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    record = {}

    def rec(name, status, rows, dt):
        record[name] = {"status": status, "rows": rows,
                        "sec": round(dt, 2)}

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            rec(name, f"fail_query:{type(ex).__name__}", 0,
                time.perf_counter() - t0)
            failures += 1
            continue
        dt = time.perf_counter() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"okNA {name}: {len(mine)} rows (no oracle) [{dt:.1f}s]")
            rec(name, "rows_only", len(mine), dt)
            continue
        try:
            ref = canon(con.execute(sql).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            rec(name, f"fail_oracle:{type(ex).__name__}", len(mine), dt)
            failures += 1
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(ref.columns)}")
            rec(name, "fail_schema", len(mine), dt)
            failures += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} != {len(ref)}")
            rec(name, "fail_rows", len(mine), dt)
            failures += 1
            continue
        if not mine.equals(ref):
            neq = (mine != ref).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(mine)} differing rows")
            print(pd.concat([mine[neq].head(3), ref[neq].head(3)]))
            rec(name, "fail_values", len(mine), dt)
            failures += 1
            continue
        print(f"PASS {name}: {len(mine)} rows [{dt:.1f}s]")
        rec(name, "pass", len(mine), dt)
    print("failures:", failures)
    if json_out:
        import json
        summary = {"sf_dir": sf_dir, "n_queries": len(record),
                   "n_pass": sum(r["status"] == "pass"
                                 for r in record.values()),
                   "n_rows_only": sum(r["status"] == "rows_only"
                                      for r in record.values()),
                   "n_fail": failures, "queries": record}
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print("wrote", json_out)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
