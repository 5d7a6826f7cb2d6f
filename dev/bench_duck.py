#!/usr/bin/env python3
"""DuckDB timings for the oracle-comparable headline queries, for the
PERF.md engine-vs-DuckDB crossover table.

Usage: python3 dev/bench_duck.py <sfDir> <oracle_sql.json> [name ...]
Prints one JSON line {"queries": {name: sec}, "total": sec}.
Each query runs twice; the faster (steady-state) run is reported.

Env (round-12, for the 1000x window where single DuckDB cells can run for
many minutes):
  BENCH_DUCK_RUNS      runs per cell (default 2; min is reported)
  BENCH_DUCK_TIMEOUT   per-cell seconds; a watchdog calls con.interrupt()
                       and the cell reports -2.0 ("timeout", excluded from
                       the total and from pair ratios, listed in
                       "timeouts")
  BENCH_DUCK_MEMLIMIT  duckdb SET memory_limit (e.g. "48GB"). Without it
                       DuckDB's default (80% of RAM) let a 1000x cell push
                       process RSS past the box and the OOM killer took
                       the whole run; a bounded limit trades spill for
                       survival.
  BENCH_DUCK_SKIP      comma-separated cells to skip (reported in
                       "skipped"). bench_pair.sh defaults it to
                       SPARK_GRAFT_SKIP so an engine-skipped cell's twin
                       is never attempted — at 1000x the d_minhash twin
                       filled the disk and d_simhash's 16-bit banding
                       OOMed before this guard existed.
"""
import json
import os
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# headline queries whose oracle SQL performs the same computation the engine
# runs. d_minhash's ORACLE is exact all-pairs Jaccard (not like-for-like),
# so its DuckDB side here is the LSH twin below instead — same work shape
# (shingle -> 32 minhashes -> 8 band buckets -> capped bucket self-join ->
# exact-Jaccard verify on candidates), DuckDB's native hash() as the hash.
DEFAULT = ["m_agg_basic", "m_agg_twodim", "m_at_all_pct", "m_at_all_dim",
           "m_at_set_yoy", "m_countdistinct", "m_median", "m_rollup",
           "m_multifact", "q_tpch1", "q_join_agg", "q_window_fn", "q_cube",
           "d_exact", "d_minhash", "s_knn", "t_tokens", "t_analysis",
           # paired-but-not-headline (round-9): temporal cells run their
           # oracle SQL (native ASOF JOIN / range join / window
           # sessionization — same work shape); d_simhash runs the banded
           # twin below; the pipeline cells run their fused-fence oracles
           # (exact arithmetic replays of the engine's computation).
           # t_pack is absent by disposition: its WITH RECURSIVE
           # sequential first-fit replay exceeds 300 s at 100x (probed).
           "e_asof", "e_range", "e_sessions", "d_simhash",
           "q_hll", "t_cms", "t_winnow_poly", "d_chunks", "t_subword",
           "t_bpe", "t_nb_score", "t_lm_score", "c_kmeans"]

# Banded MinHash-LSH twin of Dedup.minhashNearDuplicates (threshold=0.7,
# bands=8, rows=4, maxBucket=1000, w=3 word shingles). Hash chains differ
# (hash() vs xxhash64) so candidate sets can differ at the margin, but the
# stage structure, shuffle shape, and verify cost are the engine's — a fair
# performance pair. On the test corpora both report the same pair count.
_MINHASH_PREFIX = r"""
WITH norm AS (
  SELECT doc_id, string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
  FROM documents),
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(generate_series(1, greatest(len(ws) - 2, 1)),
      i -> hash(array_to_string(ws[i:least(i+2, len(ws))], ' ')))) AS fps
  FROM norm WHERE len(ws) > 0),
sig AS (
  SELECT doc_id, fps,
    list_transform(generate_series(0, 31),
      s -> list_min(list_transform(fps, f -> hash(f + s)))) AS mh
  FROM sh),
bands AS (
  SELECT doc_id, b, hash(mh[b*4+1], mh[b*4+2], mh[b*4+3], mh[b*4+4]) AS bucket
  FROM sig, generate_series(0, 7) AS g(b)),
caps AS (SELECT b, bucket FROM bands GROUP BY 1, 2 HAVING count(*) <= 1000),
bucketed AS (SELECT bands.doc_id, bands.b, bands.bucket FROM bands JOIN caps USING (b, bucket)),
cand AS (
  SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb
  FROM bucketed x JOIN bucketed y USING (b, bucket)
  WHERE x.doc_id < y.doc_id),
verify AS (
  SELECT ida, idb,
    CAST(len(list_intersect(sa.fps, sb.fps)) AS DOUBLE)
      / len(list_distinct(list_concat(sa.fps, sb.fps))) AS j
  FROM cand JOIN sh sa ON sa.doc_id = cand.ida JOIN sh sb ON sb.doc_id = cand.idb)"""

LSH_TWIN = {"d_minhash": _MINHASH_PREFIX + r"""
SELECT ida, idb, round(j, 6) AS jaccard FROM verify WHERE j >= 0.7
"""}

# PageRank-over-LSH twin (NOT in DEFAULT — run explicitly): the engine's
# g_pagerank_lsh scale cell is pageRankUndirected(iters=2) over the
# minhash near-dup pair list; this replays the identical work — the LSH
# chain above, both edge directions, then TWO unrolled integer pagerank
# rounds (scale 1e6, base = scale*15//100, 85% damping, floor division)
# matching GraphRank's exact integer arithmetic.
LSH_TWIN["g_pagerank_lsh"] = _MINHASH_PREFIX + r""",
pairs AS MATERIALIZED (SELECT ida, idb FROM verify WHERE j >= 0.7),
e AS MATERIALIZED (SELECT ida AS src, idb AS dst FROM pairs
      UNION ALL SELECT idb AS src, ida AS dst FROM pairs),
nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
c1 AS (SELECT e.dst AS id, SUM(CAST(1000000 AS BIGINT) // d.deg) AS s
       FROM e JOIN deg d ON e.src = d.src GROUP BY e.dst),
pr1 AS MATERIALIZED (SELECT n.id, CAST(150000 AS BIGINT) + (85 * COALESCE(c1.s, 0)) // 100 AS pr
        FROM nodes n LEFT JOIN c1 USING (id)),
c2 AS (SELECT e.dst AS id, SUM(p.pr // d.deg) AS s
       FROM e JOIN pr1 p ON e.src = p.id JOIN deg d ON e.src = d.src GROUP BY e.dst),
pr2 AS (SELECT n.id, CAST(150000 AS BIGINT) + (85 * COALESCE(c2.s, 0)) // 100 AS pr
        FROM nodes n LEFT JOIN c2 USING (id))
SELECT id, pr FROM pr2 ORDER BY id
"""
# AS MATERIALIZED on the multi-referenced CTEs is load-bearing: without
# it DuckDB inlines the ENTIRE LSH chain into every reference of
# e/deg/pr1 and the re-evaluated joins spilled >78 GB of temp at 100x
# before dying on disk. With it the chain runs once, like the engine's
# persisted edge projection.

# Banded SimHash twin of Dedup.simhashNearDuplicates (maxHamming=12,
# 4x16-bit bands, maxBucket=1000, 2-word shingles): same stage structure —
# shingle -> per-gram hash -> 63-bit majority signature -> 4 band buckets ->
# capped bucket self-join -> exact-hamming verify. Hash chains differ
# (hash() vs the engine's fused xxhash64 kernel) so pair sets can differ at
# the margin; the work shape and shuffle shape are the engine's.
LSH_TWIN["d_simhash"] = r"""
WITH n AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
  FROM documents),
w1 AS (SELECT doc_id, string_split(norm, ' ') AS words FROM n),
sh AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(0, greatest(len(words) - 2, 0)),
    i -> hash(array_to_string(words[i+1:i+2], ' ')))) AS hh
  FROM w1),
sg AS (
  SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 62),
    b -> CASE WHEN list_sum(list_transform(hh,
                h -> CAST((h >> b) & 1 AS BIGINT) * 2 - 1)) >= 0
              THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))
    AS BIGINT) AS sig
  FROM sh),
bands AS (
  SELECT doc_id, sig, c, (sig >> (c * 16)) & 65535 AS key
  FROM sg, generate_series(0, 3) AS g(c)),
caps AS (SELECT c, key FROM bands GROUP BY 1, 2 HAVING count(*) <= 1000),
bucketed AS (SELECT bands.doc_id, bands.sig, bands.c, bands.key
             FROM bands JOIN caps USING (c, key)),
cand AS (
  SELECT DISTINCT x.doc_id AS ida, x.sig AS siga, y.doc_id AS idb, y.sig AS sigb
  FROM bucketed x JOIN bucketed y USING (c, key)
  WHERE x.doc_id < y.doc_id)
SELECT ida AS doc_id_a, idb AS doc_id_b,
       CAST(bit_count(xor(siga, sigb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(siga, sigb)) <= 12
ORDER BY doc_id_a, doc_id_b
"""


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    con.execute("SET threads TO " + os.environ.get("BENCH_DUCK_THREADS", "32"))
    ml = os.environ.get("BENCH_DUCK_MEMLIMIT")
    if ml:
        con.execute(f"SET memory_limit = '{ml}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet/*.parquet', union_by_name=false)"
            if __import__('os').path.isdir(f"{sf_dir}/{t}.parquet") and
               any(f.endswith('.parquet') for f in __import__('os').listdir(f"{sf_dir}/{t}.parquet"))
            else f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    runs = max(1, int(os.environ.get("BENCH_DUCK_RUNS", "2")))
    timeout = float(os.environ.get("BENCH_DUCK_TIMEOUT", "0"))
    skip = {s.strip() for s in os.environ.get("BENCH_DUCK_SKIP", "").split(",") if s.strip()}
    out = {}
    timeouts = []
    skipped = sorted(skip & set(names))
    for name in names:
        if name in skip:
            continue
        sql = LSH_TWIN.get(name) or oracle.get(name)
        if not sql:
            continue

        def once():
            # done-flag guards the interrupt (r12 ADVICE): if the query
            # finishes just before the Timer fires, timer.cancel() can lose
            # the race and con.interrupt() would land on an idle connection,
            # leaving a pending interrupt that aborts the NEXT run — which
            # would then be misclassified as that cell's timeout.
            timer = None
            done = threading.Event()
            fired = [False]
            gate = threading.Lock()

            def fire():
                with gate:
                    if not done.is_set():
                        fired[0] = True
                        con.interrupt()
            if timeout > 0:
                timer = threading.Timer(timeout, fire)
                timer.daemon = True
                timer.start()
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
            finally:
                with gate:
                    done.set()
                if timer:
                    timer.cancel()
                if fired[0]:
                    # the interrupt may have landed after completion; drain
                    # any pending flag so it cannot abort the NEXT run
                    try:
                        con.execute("SELECT 1").fetchall()
                    except Exception:
                        pass
            return time.time() - t0
        print(f"START {name}", file=sys.stderr, flush=True)
        try:
            out[name] = round(min(once() for _ in range(runs)), 3)
            print(f"DONE {name}: {out[name]}s", file=sys.stderr, flush=True)
        except duckdb.InterruptException:
            print(f"TIMEOUT {name}: > {timeout}s", file=sys.stderr)
            out[name] = -2.0
            timeouts.append(name)
        except Exception as e:
            # an interrupt can also surface as a generic Exception depending
            # on where it lands; classify by message so a timed-out cell is
            # never mistaken for a correctness failure
            if timeout > 0 and "INTERRUPT" in str(e).upper():
                print(f"TIMEOUT {name}: > {timeout}s", file=sys.stderr)
                out[name] = -2.0
                timeouts.append(name)
            else:
                print(f"FAIL {name}: {e}", file=sys.stderr)
                out[name] = -1.0
    total = round(sum(v for v in out.values() if v >= 0), 3)
    print(json.dumps({"queries": out, "total": total, "sf": sf_dir,
                      "timeouts": timeouts, "skipped": skipped}))


if __name__ == "__main__":
    main()
