package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

class PackingSuite extends SparkSpec {
  import spark.implicits._

  private def toks(rows: (Long, Long)*) = rows.toDF("doc_id", "n_tokens")

  test("packGreedy: hand-built shard replays the greedy recurrence exactly") {
    // single shard (nShards = 1) isolates the recurrence from hashing
    val df = toks(1L -> 100L, 2L -> 300L, 3L -> 200L, 4L -> 600L, 5L -> 10L,
      6L -> 0L, 7L -> 502L)
    val got = Packing.packGreedy(df, "n_tokens", budget = 512, nShards = 1)
      .orderBy("doc_id")
      .select("doc_id", "pack_idx", "pack_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 100+300 fit pack0; 200 overflows -> pack1; 600 oversize -> own pack2
    // (placed at offset 0); 10 -> pack3; 0-token doc stays (10+0 fits);
    // 502 would exceed 512-10? 10+502=512 == budget -> fits (strict >)
    assert(got.toSeq == Seq(
      (1L, 0L, 0L), (2L, 0L, 100L), (3L, 1L, 0L), (4L, 2L, 0L),
      (5L, 3L, 0L), (6L, 3L, 10L), (7L, 3L, 10L)))
  }

  test("packGreedy: no multi-doc pack exceeds budget; oversize packs are singletons") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", (length($"text") / 4).cast("long").as("n_tokens"))
    val packed = Packing.packGreedy(docs, "n_tokens", budget = 256, nShards = 4)
    val stats = Packing.packStats(packed, budget = 256)
    val bad = stats.filter($"n_docs" > 1 && $"tokens" > 256).count()
    assert(bad == 0, "a multi-doc pack exceeded the budget")
    // every doc appears exactly once
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
    // shards stay inside [0, nShards)
    assert(packed.filter($"shard" < 0 || $"shard" >= 4).count() == 0)
  }

  test("packGreedy: offsets are the running sum of prior docs in the pack") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", (length($"text") / 4).cast("long").as("n_tokens"))
    val packed = Packing.packGreedy(docs, "n_tokens", budget = 256, nShards = 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard", "pack_idx").orderBy("doc_id")
    val mismatches = packed
      .withColumn("expect",
        coalesce(sum("n_tokens").over(w) - col("n_tokens"), lit(0L)))
      .filter(col("pack_offset") =!= col("expect")).count()
    assert(mismatches == 0)
  }

  test("packGreedy: output is invariant to input partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", (length($"text") / 4).cast("long").as("n_tokens"))
    def run(parts: Int) =
      Packing.packGreedy(docs.repartition(parts), "n_tokens",
          budget = 256, nShards = 8, seed = 3)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
    assert(run(1) == run(13))
  }

  test("incremental packing equals from-scratch repack when new ids sort last") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", (length($"text") / 4).cast("long").as("n_tokens"))
    val cut = 300L
    val prior = all.filter($"doc_id" < cut)
    val batch = all.filter($"doc_id" >= cut)
    assert(prior.count() > 0 && batch.count() > 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val full = Packing.packGreedy(all, "n_tokens", budget = 256, nShards = 4)
    val p1 = Packing.packGreedy(prior, "n_tokens", budget = 256, nShards = 4)
    val p2 = Packing.packGreedyIncremental(batch, "n_tokens", budget = 256,
      nShards = 4, prior = Packing.shardStates(p1))
    assert(key(full) == (key(p1) ++ key(p2)),
      "incremental pack must be bit-identical to a from-scratch repack")
  }

  test("packGreedy: plan has exactly one exchange (the shard shuffle)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", (length($"text") / 4).cast("long").as("n_tokens"))
    val plan = Packing.packGreedy(docs, "n_tokens", budget = 256, nShards = 4)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
