#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 dev/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out [name ...]

Registers the sf parquet tables in DuckDB, runs each oracle_sql.json entry,
and compares against the Spark parquet dump: row count, column names
(sorted), cell values (doubles rounded to 9 significant digits, rows
sorted), AND per-column result types. The driver's hash is type-sensitive
(round 8-10: DuckDB SUM(BIGINT) returns HUGEINT while Spark writes BIGINT,
red on the driver but invisible to a value-only local compare), so the
type check is what makes this gate faithful.
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# (spark_type, oracle_type) pairs beyond exact equality that the driver's
# hash demonstrably tolerates (entries green for multiple rounds). Keep
# this list SHORT and evidence-based; HUGEINT-vs-BIGINT is deliberately
# NOT here — that exact pair was the 3-round t_dashboard red family.
TYPE_ALLOW = set()


def norm_type(t):
    s = str(t).upper()
    # Parametrized types: compare the base name (DECIMAL(38,6) etc. keeps
    # its params — precision differences are real mismatches for hashing,
    # so only strip whitespace).
    return " ".join(s.split())


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
    # --types-only (r11 verdict task 8): compare schema + per-column types
    # WITHOUT executing either side — the oracle relation's types come from
    # DuckDB's bind (no fetchall) and the Spark side from a limit(0) parquet
    # dump. This is the sbt-test-adjacent gate (OracleTypeGateSuite) that
    # stops a future oracle edit from reintroducing a driver-only type red
    # (the 3-round t_dashboard family: SUM(BIGINT)->HUGEINT).
    args = [a for a in sys.argv[1:] if a != "--types-only"]
    types_only = "--types-only" in sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
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
            rel = con.sql(sql)
            ocols = list(rel.columns)
            otypes = {c: norm_type(t) for c, t in zip(rel.columns, rel.types)}
            orows = [] if types_only else rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = list(rel.columns)
            stypes = {c: norm_type(t) for c, t in zip(rel.columns, rel.types)}
            srows = [] if types_only else rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark dump missing: {e}")
            n_fail += 1
            continue
        oc, orws = norm_rows(ocols, orows)
        sc, srws = norm_rows(scols, srows)
        type_diffs = [
            (c, stypes[c], otypes[c]) for c in sorted(set(scols) & set(ocols))
            if stypes[c] != otypes[c]
            and (stypes[c], otypes[c]) not in TYPE_ALLOW]
        if oc != sc:
            print(f"FAIL {name}: schema {sc} vs oracle {oc}")
            n_fail += 1
        elif type_diffs:
            print(f"FAIL {name}: type mismatch (col, spark, oracle): {type_diffs}")
            n_fail += 1
        elif types_only:
            n_pass += 1
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
