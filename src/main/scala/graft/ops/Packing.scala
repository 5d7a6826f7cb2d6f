package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences ("packs"), the step every LLM pipeline runs between
  * tokenization and batching. Greedy sequential packing — walk the docs
  * in a deterministic order, append to the current pack, cut a new pack
  * when the next doc would overflow the budget — is the industry-standard
  * approximation (concat-and-split with document boundaries respected).
  *
  * Packing is inherently sequential (each doc's pack depends on the full
  * prefix), so the scale design shards first: every doc lands in one of
  * `nShards` shards by a deterministic engine-portable hash of its id
  * ([[Sampling.hashBucket]] mod nShards), and each shard packs
  * independently. That turns a global sequential scan into
  * embarrassingly-parallel per-shard scans: ONE shuffle on the shard key,
  * a secondary sort (shard, id) inside each partition, then a single
  * streaming pass with O(1) state (current pack index + tokens used) per
  * shard. At 100 TB you raise nShards with the data (packs-per-shard
  * stays bounded); no stage ever materializes a shard in memory.
  *
  * Greedy rule (total and deterministic):
  *   - docs visit in ascending id order within their shard;
  *   - if the pack already holds >0 tokens and adding the doc would
  *     exceed `budget`, close the pack (pack_idx += 1, used = 0);
  *   - the doc is placed at pack_offset = used; used += n_tokens.
  * An oversize doc (n_tokens > budget) therefore always occupies a pack
  * of its own (callers split or truncate downstream); zero-token docs
  * never force a cut.
  *
  * The whole recurrence is replayed exactly by the driver's DuckDB oracle
  * as a recursive CTE over row_number() within shard — every output cell
  * (shard, pack_idx, pack_offset) is integer-exact across engines.
  */
object Packing {

  /** Greedy per-shard sequence packing.
    *
    * @param docs     input with a non-negative integer id and a token count
    * @param budget   max tokens per pack (>= 1)
    * @param nShards  number of independent packing shards (>= 1); scale
    *                 this with the corpus so packs-per-shard stays bounded
    * @param seed     shard-hash seed in [0, 1e9] (see Sampling.hashBucket)
    * @return one row per input doc:
    *         (idCol, n_tokens, shard, pack_idx, pack_offset), all bigint —
    *         a pack is globally identified by (shard, pack_idx)
    */
  def packGreedy(docs: DataFrame, tokenCol: String, budget: Long,
                 nShards: Int, idCol: String = "doc_id",
                 seed: Long = 0L): DataFrame = {
    require(budget >= 1, s"budget $budget must be >= 1")
    require(nShards >= 1, s"nShards $nShards must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val withShard = docs.select(
      col(idCol).cast("bigint"),
      col(tokenCol).cast("bigint"),
      (Sampling.hashBucket(col(idCol), seed) % nShards).as("shard"))
      .as[(Long, Long, Long)]
    // hash-repartition on shard, secondary-sort (shard, id): each partition
    // holds whole shards in id order, so one lazy sequential map with two
    // longs of carried state packs every shard it sees — no per-shard
    // buffering, no groupBy, memory O(1) regardless of shard size
    withShard
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .mapPartitions { it =>
        var curShard = -1L
        var pack = 0L
        var used = 0L
        it.map { case (id, n, sh) =>
          if (sh != curShard) { curShard = sh; pack = 0L; used = 0L }
          if (used > 0 && used + n > budget) { pack += 1; used = 0L }
          val off = used
          used += n
          (id, n, sh, pack, off)
        }
      }
      .toDF(idCol, "n_tokens", "shard", "pack_idx", "pack_offset")
  }

  /** Per-pack summary (pack sizes, fill rate vs budget) — the QA view a
    * pipeline reports after packing. Pure re-aggregation of packGreedy
    * output: one shuffle on the (shard, pack_idx) key.
    */
  def packStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy("shard", "pack_idx")
      .agg(count("*").as("n_docs"),
        sum("n_tokens").as("tokens"),
        round(sum("n_tokens") / lit(budget.toDouble), 6).as("fill"))

  /** Terminal packing state per shard — the open pack's index and fill —
    * from packGreedy output. Persist this tiny table (one row per shard)
    * between pipeline runs to keep packing incremental.
    */
  def shardStates(packed: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard")
    packed
      .withColumn("__maxp", max("pack_idx").over(w))
      .filter(col("pack_idx") === col("__maxp"))
      .groupBy("shard")
      .agg(max("pack_idx").as("pack_idx"), sum("n_tokens").as("used"))
  }

  /** Incremental packGreedy: continue from a prior run's [[shardStates]],
    * so a daily batch appends to the open packs instead of restarting
    * numbering. The state is O(nShards) rows — broadcast into the same
    * single-shuffle streaming scan.
    *
    * Invariant (asserted in the suite): if every new id sorts after every
    * prior id, pack(prior ++ batch) == pack(prior) ++ packIncremental(
    * batch, shardStates(pack(prior))) — incremental output is
    * bit-identical to a from-scratch repack.
    */
  def packGreedyIncremental(docs: DataFrame, tokenCol: String, budget: Long,
                            nShards: Int, prior: DataFrame,
                            idCol: String = "doc_id",
                            seed: Long = 0L): DataFrame = {
    require(budget >= 1, s"budget $budget must be >= 1")
    require(nShards >= 1, s"nShards $nShards must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val priorMap: Map[Long, (Long, Long)] = prior
      .select(col("shard").cast("bigint"), col("pack_idx").cast("bigint"),
        col("used").cast("bigint"))
      .as[(Long, Long, Long)].collect()
      .map { case (s, p, u) => s -> (p, u) }.toMap
    val bc = spark.sparkContext.broadcast(priorMap)
    val withShard = docs.select(
      col(idCol).cast("bigint"),
      col(tokenCol).cast("bigint"),
      (Sampling.hashBucket(col(idCol), seed) % nShards).as("shard"))
      .as[(Long, Long, Long)]
    withShard
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .mapPartitions { it =>
        var curShard = -1L
        var pack = 0L
        var used = 0L
        it.map { case (id, n, sh) =>
          if (sh != curShard) {
            curShard = sh
            val (p0, u0) = bc.value.getOrElse(sh, (0L, 0L))
            pack = p0; used = u0
          }
          if (used > 0 && used + n > budget) { pack += 1; used = 0L }
          val off = used
          used += n
          (id, n, sh, pack, off)
        }
      }
      .toDF(idCol, "n_tokens", "shard", "pack_idx", "pack_offset")
  }
}
