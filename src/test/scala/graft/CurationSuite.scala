package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Sampling}

class CurationSuite extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String, String, Long)*) =
    rows.toDF("doc_id", "text", "source", "n_chars")

  // ------------------------------------------------------------ gram sets

  test("gramHashSet: fewer than n tokens yields empty; grams are distinct") {
    val df = Seq(
      (1L, "one two"),            // 2 tokens < 3 -> empty
      (2L, "a b c"),              // exactly one 3-gram
      (3L, "x y x y x y x y"),    // repeated grams collapse: distinct grams
      (4L, "  spaced   out   tokens   here  ") // whitespace runs are one split
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", size(Curation.gramHashSet($"text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) == 0)
    assert(got(2L) == 1)
    // "x y x y x y x y": 6 positions but only 2 distinct grams (xyx, yxy)
    assert(got(3L) == 2)
    assert(got(4L) == 2) // 4 tokens -> 2 grams
  }

  // ------------------------------------------------------------ contamination

  test("contaminationCheck: exact overlap counts on hand-built docs") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),      // identical: all 3 grams shared
      (2L, "the quick brown dog sleeps"),     // shares only "the quick brown"
      (3L, "completely different text here"), // nothing shared
      (4L, "ab")                              // < 3 tokens: 0 grams
    ).toDF("doc_id", "text")
    val got = Curation.contaminationCheck(corpus, bench, flagAt = 0.2)
      .orderBy("doc_id").collect()
    val byId = got.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(byId(1L) == ((3L, 3L, 1.0, true)))
    assert(byId(2L) == ((3L, 1L, 0.333333, true)))
    assert(byId(3L) == ((2L, 0L, 0.0, false))) // 4 tokens -> 2 grams
    assert(byId(4L) == ((0L, 0L, 0.0, false)))
  }

  test("contaminationCheck: benchmark side is broadcast, corpus not shuffled by gram") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Curation.contaminationCheck(
        d.filter($"doc_id" % 37 =!= 0), d.filter($"doc_id" % 37 === 0))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark gram set should broadcast:\n$plan")
  }

  // ------------------------------------------------------------ mixture

  test("rebalanceToMixture: kept rows replay the exact threshold arithmetic") {
    // 40/20/10 rows across three sources, weights 2:1:1 (W=4)
    val df = (0L until 70L).map { i =>
      val src = if (i < 40) "a" else if (i < 60) "b" else "c"
      (i, s"text $i", src, 10L)
    }.toDF("doc_id", "text", "source", "n_chars")
    val kept = Curation.rebalanceToMixture(df,
        Map("a" -> 2L, "b" -> 1L, "c" -> 1L), seed = 7)
      .select("doc_id").as[Long].collect().toSet

    // replay in plain Scala: N* = min(count*W/w) = min(40*4/2, 20*4/1, 10*4/1)
    //                           = min(80, 80, 40) = 40
    // thresholds: a: 40*2*P2/(4*40) = P2/4; b: 40*P2/80 = P2/2; c: 40*P2/40 = P2
    val P2 = 1000000007L
    def bucket(k: Long, seed: Long): Long = {
      val b = ((k & ((1L << 30) - 1)) * 2654435761L + (k >> 30) * 976369L) % P2
      (b * b + seed * b) % P2
    }
    val nStar = Seq(BigInt(40) * 4 / 2, BigInt(20) * 4 / 1, BigInt(10) * 4 / 1).min
    def thr(w: Long, n: Long): Long = (nStar * w * P2 / (BigInt(4) * n)).toLong
    val expect = (0L until 70L).filter { i =>
      val (w, n) = if (i < 40) (2L, 40L) else if (i < 60) (1L, 20L) else (1L, 10L)
      bucket(i, 7) < thr(w, n)
    }.toSet
    assert(kept == expect)
    // source c keeps everything (threshold = P2)
    assert((60L until 70L).forall(kept.contains))
  }

  test("rebalanceToTokenMixture: thresholds run on token mass, not row count") {
    // two sources, equal ROW counts but 4:1 token mass; weights 1:1.
    // Row-mixture would keep everything (already balanced); token-mixture
    // must keep ~1/4 of the heavy source's mass.
    val df = (0L until 40L).map { i =>
      val src = if (i < 20) "heavy" else "light"
      val toks = if (i < 20) 40L else 10L
      (i, src, toks)
    }.toDF("doc_id", "source", "n_tokens")
    val kept = Curation.rebalanceToTokenMixture(df,
        Map("heavy" -> 1L, "light" -> 1L), massCol = "n_tokens", seed = 7)
      .select("doc_id").as[Long].collect().toSet
    // replay: masses heavy=800, light=200, W=2;
    // M* = min(800*2/1, 200*2/1) = 400
    // thr(heavy) = 400*1*P2/(2*800) = P2/4; thr(light) = 400*P2/400 = P2
    val P2 = 1000000007L
    def bucket(k: Long, seed: Long): Long = {
      val b = ((k & ((1L << 30) - 1)) * 2654435761L + (k >> 30) * 976369L) % P2
      (b * b + seed * b) % P2
    }
    val expect = (0L until 40L).filter { i =>
      val t = if (i < 20) P2 / 4 else P2
      bucket(i, 7) < t
    }.toSet
    assert(kept == expect)
    // light keeps all rows; heavy keeps a strict subset
    assert((20L until 40L).forall(kept.contains))
    assert((0L until 20L).count(kept.contains) < 20)
  }

  test("rebalanceToMixture: unlisted sources dropped; absent source errors") {
    val df = docsDf((1L, "t", "a", 1L), (2L, "t", "zzz", 1L))
    val kept = Curation.rebalanceToMixture(df, Map("a" -> 1L))
      .select("source").as[String].collect().toSet
    assert(kept == Set("a"))
    val e = intercept[IllegalArgumentException] {
      Curation.rebalanceToMixture(df, Map("a" -> 1L, "missing" -> 1L))
    }
    assert(e.getMessage.contains("missing"))
  }

  test("rebalanceToMixture: selection nests under Sampling's scheme (same seed)") {
    val df = (0L until 100L).map(i => (i, "t", "a", 1L))
      .toDF("doc_id", "text", "source", "n_chars")
    // single source, weight arbitrary -> threshold P2 (keeps all);
    // a plain deterministicSample at 0.3 must be a subset of one at 0.7
    val lo = Sampling.deterministicSample(df, "doc_id", 0.3, seed = 5)
      .select("doc_id").as[Long].collect().toSet
    val hi = Sampling.deterministicSample(df, "doc_id", 0.7, seed = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(lo.subsetOf(hi))
  }

  // ------------------------------------------------------------ cap

  test("capPerSource: cap respected, priority by (n_chars DESC, doc_id)") {
    val df = docsDf(
      (1L, "t", "a", 100L), (2L, "t", "a", 300L), (3L, "t", "a", 200L),
      (4L, "t", "a", 300L), // ties with 2 on n_chars; doc_id breaks
      (5L, "t", "b", 50L))
    val got = Curation.capPerSource(df, cap = 3)
      .select("doc_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(2L -> 1, 4L -> 2, 3L -> 3, 5L -> 1)) // doc 1 cut by cap
  }

  test("capPerSource: rank filter triggers WindowGroupLimit map-side top-K") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Curation.capPerSource(d, cap = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pushdown of rank<=cap:\n$plan")
  }

  // ------------------------------------------------------------ pipeline

  test("curate: stage composition is monotone and lands on weighted sources") {
    import graft.ops.{CuratePipeline, Dedup}
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = d.filter($"doc_id" % 37 =!= 0)
    val bench = d.filter($"doc_id" % 37 === 0)
    val weights = Map("src0" -> 2L, "src1" -> 1L, "src2" -> 1L, "src3" -> 1L)
    val out = CuratePipeline.curate(corpus, bench, weights, seed = 7)
    val rows = out.select("doc_id", "source").collect()
    assert(rows.nonEmpty, "curated corpus must not be empty")
    // only weighted sources survive the mixture stage
    assert(rows.map(_.getString(1)).toSet.subsetOf(weights.keySet))
    // the output is a subset of the exact-dedup survivors (stage order)
    val exactIds = Dedup.exactDedup(corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet.subsetOf(exactIds))
    // quality floor holds on every surviving row
    assert(out.filter($"quality_score" < 0.5).count() == 0)
  }

  // the COMPOSED incremental invariant, mirroring the per-stage ones: when
  // every id of batch 2 sorts after every id of batch 1, two incremental
  // runs with index/state carry-over between them are row-identical to one
  // shot over the concatenation
  test("curateIncremental: two batches == one shot when ids are ordered") {
    import graft.ops.{CuratePipeline, Dedup}
    import spark.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val history = d.filter($"doc_id" % 3 === 0)
    val bench = d.filter($"doc_id" % 37 === 0)
    // ordered disjoint batches, with cross-batch and vs-history duplicates:
    // re-id the non-history docs into two blocks, then clone some history
    // texts into each block so the anti-join and the in-batch window both
    // have work to do
    val rest = d.filter($"doc_id" % 3 =!= 0).select("doc_id", "source", "text")
    val offset = 1000000L
    val b1 = rest.filter($"doc_id" % 2 === 1)
      .withColumn("doc_id", $"doc_id" + offset)
      .unionByName(history.orderBy("doc_id").limit(20).select(
        ($"doc_id" + offset + 500000L).as("doc_id"), $"source", $"text"))
    val b2 = rest.filter($"doc_id" % 2 === 0)
      .withColumn("doc_id", $"doc_id" + 3L * offset)
      .unionByName(b1.orderBy("doc_id").limit(15).select(
        ($"doc_id" + 3L * offset).as("doc_id"), $"source", $"text"))
    val index0 = Dedup.fingerprintIndex(history)
    val st0 = Seq((0L, 1L, 40L), (1L, 0L, 0L), (2L, 2L, 300L), (3L, 1L, 500L))
      .toDF("shard", "pack_idx", "used")
    def run(batch: org.apache.spark.sql.DataFrame, idx: org.apache.spark.sql.DataFrame,
            st: org.apache.spark.sql.DataFrame) =
      CuratePipeline.curateIncremental(batch, idx, bench, st,
        budget = 512, nShards = 4, seed = 3)
    val oneShot = run(b1.unionByName(b2), index0, st0)
    val r1 = run(b1, index0, st0)
    val index1 = Dedup.updateFingerprintIndex(index0, b1)
    val st1 = CuratePipeline.mergeShardStates(st0,
      r1.select("doc_id", "n_tokens", "shard", "pack_idx", "pack_offset"))
    val r2 = run(b2, index1, st1)
    val cols = Seq("doc_id", "source", "quality_score", "n_tokens", "shard",
      "pack_idx", "pack_offset")
    val got = r1.unionByName(r2).select(cols.map(col): _*)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val want = oneShot.select(cols.map(col): _*)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(got.length == want.length && got.nonEmpty,
      s"row counts differ: ${got.length} vs ${want.length}")
    assert(got.toSeq == want.toSeq, "incremental composition diverged from one-shot")
  }
}
