#!/usr/bin/env python3
"""DuckDB timings for the oracle-comparable headline queries, for the
PERF.md engine-vs-DuckDB crossover table.

Usage: python3 dev/bench_duck.py <sfDir> <oracle_sql.json> [name ...]
Prints one JSON line {"queries": {name: sec}, "total": sec}.
Each query runs twice; the faster (steady-state) run is reported.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# headline queries whose oracle SQL performs the same computation the engine
# runs (excludes d_minhash: the oracle is exact all-pairs Jaccard while the
# engine runs banded LSH — not a like-for-like timing)
DEFAULT = ["m_agg_basic", "m_agg_twodim", "m_at_all_pct", "m_at_all_dim",
           "m_at_set_yoy", "m_countdistinct", "m_median", "m_rollup",
           "m_multifact", "q_tpch1", "q_join_agg", "q_window_fn", "q_cube",
           "d_exact", "s_knn", "t_tokens", "t_analysis"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet/*.parquet', union_by_name=false)"
            if __import__('os').path.isdir(f"{sf_dir}/{t}.parquet") and
               any(f.endswith('.parquet') for f in __import__('os').listdir(f"{sf_dir}/{t}.parquet"))
            else f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    out = {}
    for name in names:
        sql = oracle.get(name)
        if not sql:
            continue

        def once():
            t0 = time.time()
            con.execute(sql).fetchall()
            return time.time() - t0
        try:
            out[name] = round(min(once(), once()), 3)
        except Exception as e:
            print(f"FAIL {name}: {e}", file=sys.stderr)
            out[name] = -1.0
    total = round(sum(v for v in out.values() if v >= 0), 3)
    print(json.dumps({"queries": out, "total": total, "sf": sf_dir}))


if __name__ == "__main__":
    main()
