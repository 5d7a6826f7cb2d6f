#!/usr/bin/env python3
"""Merge the r13 1000x engine/duck sides into dev/bench_pair_1000x_r13.json.

bench_pair.sh's merge step, reproduced standalone because the DuckDB side
of this window cannot finish inside one process: its c_kmeans replay is
OOM-killed by the OS (reproduced twice this session, memory_limit=64GB and
48GB — list-vector allocations outside the buffer pool, same failure the
r12 window recorded). The engine side ran to completion (saved via
SPARK_GRAFT_BENCH_OUT); the duck side re-ran with c_kmeans skipped and is
annotated here exactly like the r12 artifact (queries.c_kmeans = -1.0,
oom_failed, note), so every absent cell stays attributable from the
artifact alone.

Usage: merge_pair_1000x_r13.py <engine.json> <duck.json> <sfDir> <out.json>
"""
import json
import sys

eng = json.load(open(sys.argv[1]))
duck = json.load(open(sys.argv[2]))
sf_dir, out_path = sys.argv[3], sys.argv[4]

# r12-style annotation for the substrate-killed cell — applied ONLY when
# the duck input is actually missing/failed on c_kmeans (r13 advice: the
# unconditional stamp would clobber a real measurement)
if duck["queries"].get("c_kmeans", -1.0) <= 0:
    duck["queries"]["c_kmeans"] = -1.0
    duck["oom_failed"] = ["c_kmeans"]
    duck["note"] = (
        "c_kmeans replay OOM-killed the DuckDB process at the OS level "
        "(reproduced twice this session: memory_limit=64GB and 48GB; "
        "list-vector allocations outside the buffer pool — same failure as "
        "the r12 window); engine side: 10.234 s. d_minhash/d_simhash not "
        "run on the legacy-compounded corpus: engine-skipped at this scale "
        "(PERF.md 0i), their DuckDB twins die on disk / band-space OOM; "
        "both cells are instead measured on the bounded-duplicate "
        "corpus (r12 verdict task 2) — see PERF.md 0o.")

eq, dq = eng["queries"], duck["queries"]
ratios = {k: round(eq[k] / dq[k], 2)
          for k in eq if k in dq and eq[k] > 0 and dq[k] > 0}
# a headline cell missing or non-positive on either side would silently
# vanish from the totals — say so loudly in the artifact (r13 advice)
excluded = sorted(k for k in set(eq) | set(dq)
                  if not (eq.get(k, -1) > 0 and dq.get(k, -1) > 0))
if excluded:
    print(f"[merge] excluded from totals (missing/failed on a side): "
          f"{excluded}", file=sys.stderr)
PIPELINE = {"q_hll", "t_cms", "t_winnow_poly", "d_chunks", "t_subword",
            "t_bpe", "t_nb_score", "t_lm_score", "c_kmeans"}
EXTRAS = {"d_minhash", "d_simhash", "e_asof", "e_range",
          "e_sessions"} | PIPELINE
like = [k for k in ratios if k not in EXTRAS]
et = round(sum(eq[k] for k in like), 3)
dt = round(sum(dq[k] for k in like), 3)
out = {
    "sf": sf_dir,
    "engine": eng, "duckdb": duck,
    "like_for_like": {"engine_total": et, "duckdb_total": dt,
                      "ratio": round(et / dt, 2) if dt else None},
    "ratios": {k: v for k, v in ratios.items() if k not in EXTRAS},
}
if excluded:
    out["excluded_from_totals"] = excluded
if eng.get("skipped"):
    out["engine_skipped"] = eng["skipped"]
if duck.get("timeouts"):
    out["duck_timeouts"] = duck["timeouts"]
temporal = {k: {"engine": eq[k], "duckdb": dq[k], "ratio": ratios[k]}
            for k in ("e_asof", "e_range", "e_sessions") if k in ratios}
if temporal:
    out["temporal_pairs"] = temporal
pipe = {k: {"engine": eq[k], "duckdb": dq[k], "ratio": ratios[k]}
        for k in sorted(PIPELINE) if k in ratios}
if pipe:
    out["pipeline_pairs"] = pipe
with open(out_path, "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out["like_for_like"]))
print(json.dumps(out.get("pipeline_pairs", {}), indent=2))
