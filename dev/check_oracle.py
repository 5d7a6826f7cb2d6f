#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 dev/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out [name ...]

Registers the sf parquet tables in DuckDB, runs each oracle_sql.json entry,
and compares against the Spark parquet dump: row count, column names
(sorted), and cell values (doubles rounded to 9 significant digits, rows
sorted). Mirrors the driver's hash compare closely enough to pre-gate.
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return 0.0
        return float(f"{v:.9g}")
    if isinstance(v, (int, str)):
        return v
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(f"{float(v):.9g}")
    except Exception:
        pass
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [c for c in sorted(cols)], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            cur = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in cur.description]
            srows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark dump missing: {e}")
            n_fail += 1
            continue
        oc, orws = norm_rows(ocols, orows)
        sc, srws = norm_rows(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: schema {sc} vs oracle {oc}")
            n_fail += 1
        elif len(orws) != len(srws):
            print(f"FAIL {name}: rows {len(srws)} vs oracle {len(orws)}")
            n_fail += 1
        elif orws != srws:
            diffs = [(a, b) for a, b in zip(srws, orws) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs {diffs}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
