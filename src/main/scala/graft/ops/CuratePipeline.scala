package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full curation pass composed from the proven stages, in production
  * order — what a training-data team actually runs between "raw crawl" and
  * "tokenize":
  *
  *   1. exact dedup            (fingerprint window, keep min-id)
  *   2. near-dup removal       (exact n-gram Jaccard pairs → connected
  *                              components → one keeper per cluster)
  *   3. contamination screen   (benchmark n-gram overlap, broadcast side)
  *   4. quality filter         (cheap signal score ≥ threshold)
  *   5. mixture rebalance      (deterministic hash thresholds to target
  *                              source proportions)
  *
  * Every stage is individually oracle-gated (d_exact, d_cluster_dedup,
  * t_contam, t_analysis, t_mixture); `t_curate` gates the COMPOSITION —
  * the end-to-end row set is hash-compared against a DuckDB replay of all
  * five stages, so stage wiring (which set feeds which filter) is pinned,
  * not just stage internals.
  *
  * Scale shape is the sum of its parts: no stage shuffles raw text except
  * the near-dup index (MinHash-LSH by default — bucketed and capped; the
  * exact n-gram inverted index is available via `nearDupExact` but its
  * Σ df² work is quadratic in duplicate-group size, see
  * [[Dedup.ngramJaccardPairs]]), the contamination side is broadcast, and
  * stages 4–5 are pure per-row predicates — the whole pass is a handful
  * of bounded shuffles over fingerprints/ids at 100 TB. (Measured: the
  * exact path OOMs a single 8 GB JVM on the 99%-dup 100x corpus; the LSH
  * default completes, see PERF.md.)
  */
object CuratePipeline {

  /** Run the five-stage curation pass over `docs`.
    *
    * NEAR-DUP DEFAULT (behavior note): stage 2 uses MinHash-LSH
    * ([[Dedup.minhashNearDuplicates]]) by default — a probabilistic
    * candidate generator whose recall at `jaccardThreshold` depends on the
    * corpus' similarity spectrum. On corpora with pairs NEAR the threshold
    * it can keep documents the exact inverted-index path would remove. Pass
    * `nearDupExact = true` for exact n-gram Jaccard semantics; that path is
    * quadratic in duplicate-group size (Σ df²) and is only tractable when
    * the duplicate groups are small relative to executor memory — at crawl
    * scale prefer the LSH default and tune `bands`/`rows` via
    * [[Dedup.minhashNearDuplicates]] directly if recall matters more than
    * cost. (On the driver's test corpus the two paths coincide — recall is
    * exactly 1 at 0.7 because the pair-similarity spectrum is empty between
    * 0.3 and 0.9, gate-asserted in PipelineGatesSuite — which is why the
    * oracle accepts the default; that argument is corpus-specific, not a
    * property of LSH.)
    */
  def curate(docs: DataFrame, benchmark: DataFrame, weights: Map[String, Long],
             jaccardThreshold: Double = 0.7, flagAt: Double = 0.2,
             minQuality: Double = 0.5, seed: Long = 0L,
             textCol: String = "text", idCol: String = "doc_id",
             nearDupExact: Boolean = false): DataFrame = {
    val afterExact = Dedup.exactDedup(docs, textCol, idCol)
    // the driver oracle replays the EXACT pair set; the LSH default stays
    // oracle-valid because recall at the 0.7 threshold is exactly 1 on the
    // test corpus (pair-similarity spectrum empty between 0.3 and 0.9 —
    // the same argument the d_minhash entry rests on, gate-asserted in
    // PipelineGatesSuite)
    val pairs =
      if (nearDupExact)
        Dedup.ngramJaccardPairs(afterExact, textCol = textCol,
          idCol = idCol, threshold = jaccardThreshold)
      else
        Dedup.minhashNearDuplicates(afterExact, textCol = textCol,
          idCol = idCol, threshold = jaccardThreshold)
    val afterNear = Dedup.dedupByPairs(afterExact, pairs, idCol = idCol)
    val contam = Curation.contaminationCheck(afterNear, benchmark,
      flagAt = flagAt, textCol = textCol, idCol = idCol)
    val clean = afterNear.join(
      contam.filter(!col("contaminated")).select(col("doc_id").as(idCol)), idCol)
    val scored = clean
      .withColumn("quality_score", TextAnalysis.qualityScore(col(textCol)))
      .filter(col("quality_score") >= minQuality)
    Curation.rebalanceToMixture(scored, weights, keyCol = idCol, seed = seed)
  }

  /** The incremental (daily-crawl) curation cycle: the stages of [[curate]]
    * that carry state between batches, composed end-to-end against that
    * state —
    *
    *   1. exact dedup vs history    ([[Dedup.incrementalDedup]]: first-of-
    *                                 fingerprint within the batch, novel
    *                                 against the persistent index)
    *   2. contamination screen      (benchmark n-grams, broadcast side)
    *   3. quality filter            (signal score >= `minQuality`)
    *   4. incremental packing       ([[Packing.packGreedyIncremental]]:
    *                                 appends to the prior run's open packs)
    *
    * Near-dup clustering and mixture rebalancing stay batch-level in
    * [[curate]] — their state is corpus-sized (shingle index) or global
    * (source counts), not the O(index)+O(nShards) state a daily loop keeps.
    *
    * Two-batch ≡ one-shot invariant (suite-gated, mirroring the per-stage
    * invariants): when every id of batch N+1 sorts after every id of batch
    * N, running batches through `curateIncremental` with
    * [[Dedup.updateFingerprintIndex]] / [[mergeShardStates]] between them
    * is row-identical to one shot over the concatenation. Driver entry
    * `t_curate_incr` replays the whole composition in DuckDB.
    *
    * @param priorStates one row per shard: (shard, pack_idx, used) — the
    *                    open-pack state from the previous run
    * @return one row per surviving batch doc:
    *         (idCol, n_tokens, shard, pack_idx, pack_offset, source,
    *         quality_score)
    */
  def curateIncremental(batch: DataFrame, index: DataFrame, benchmark: DataFrame,
                        priorStates: DataFrame, budget: Long, nShards: Int,
                        flagAt: Double = 0.2, minQuality: Double = 0.5,
                        seed: Long = 0L,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val novel = Dedup.incrementalDedup(batch, index, textCol, idCol)
    val contam = Curation.contaminationCheck(novel, benchmark,
      flagAt = flagAt, textCol = textCol, idCol = idCol)
    val clean = novel.join(
      contam.filter(!col("contaminated")).select(col("doc_id").as(idCol)), Seq(idCol))
    val scored = clean
      .withColumn("quality_score", TextAnalysis.qualityScore(col(textCol)))
      .filter(col("quality_score") >= minQuality)
    val withTok = scored.withColumn("n_tokens",
      graft.functions.TextStatsExpr.textStats(col(textCol))
        .getField("n_tokens").cast("long"))
    val packed = Packing.packGreedyIncremental(
      withTok.select(col(idCol), col("n_tokens")), "n_tokens", budget,
      nShards, priorStates, idCol, seed)
    packed.join(withTok.drop(textCol, "n_tokens"), Seq(idCol))
  }

  /** Carry packing state across batches: shards the new batch touched take
    * their terminal [[Packing.shardStates]]; untouched shards keep the
    * prior row. O(nShards) rows either way.
    */
  def mergeShardStates(prior: DataFrame, packed: DataFrame): DataFrame = {
    val cur = Packing.shardStates(packed)
    cur.unionByName(
      prior.select("shard", "pack_idx", "used")
        .join(cur.select("shard"), Seq("shard"), "left_anti"))
  }
}
