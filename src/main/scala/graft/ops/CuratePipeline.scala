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
  * the n-gram inverted index (df-capped), the contamination side is
  * broadcast, and stages 4–5 are pure per-row predicates — the whole pass
  * is a handful of bounded shuffles over fingerprints/ids at 100 TB.
  */
object CuratePipeline {

  def curate(docs: DataFrame, benchmark: DataFrame, weights: Map[String, Long],
             jaccardThreshold: Double = 0.7, flagAt: Double = 0.2,
             minQuality: Double = 0.5, seed: Long = 0L,
             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val afterExact = Dedup.exactDedup(docs, textCol, idCol)
    val pairs = Dedup.ngramJaccardPairs(afterExact, textCol = textCol,
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
}
