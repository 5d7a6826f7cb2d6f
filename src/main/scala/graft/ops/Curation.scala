package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a production training-data pipeline runs
  * between dedup and tokenization: benchmark-contamination screening,
  * source-mixture rebalancing, and per-source capping.
  *
  * Scale shapes (100 TB):
  *   - Contamination: the benchmark side of the gram join is a BENCHMARK
  *     (MBs, not TBs) — its distinct gram-hash set is broadcast, so the
  *     corpus is scanned once and never shuffled. Gram sets are per-row
  *     distinct 64-bit hashes; nothing string-typed crosses the join.
  *   - Mixture rebalance: per-source thresholds are computed once from a
  *     source-count aggregate (rows = distinct sources, i.e. thousands at
  *     web scale) in exact BigInt arithmetic, then applied as a pure
  *     per-row hash predicate (`Sampling.hashBucket`) — scan speed, no
  *     shuffle, reproducible across engines and executor counts.
  *   - Per-source cap: rank-per-source is a window with a `rank <= cap`
  *     filter, which Spark's WindowGroupLimit rewrites into a map-side
  *     partial top-K before the one source-keyed shuffle (the same
  *     optimization PlanAuditSuite asserts for q_topk).
  */
object Curation {

  /** Distinct 64-bit hashes of the word `n`-grams of `lower(trim(text))`.
    * Tokens and the gram array are bound once per row (Cols.bindOnce) so
    * nothing re-evaluates per element. Docs with fewer than `n` tokens
    * yield an EMPTY set.
    */
  def gramHashSet(text: Column, n: Int = 3): Column =
    Cols.bindOnce(filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)) { toks =>
      when(size(toks) < n, array().cast("array<bigint>")).otherwise(
        array_distinct(transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => xxhash64(concat_ws(" ",
            (0 until n).map(j => element_at(toks, i + j)): _*)))))
    }

  /** Benchmark-contamination screen: for every corpus document, how many of
    * its distinct word `n`-grams also appear in the benchmark set
    * (decontamination before training — the PaLM/GPT-3 appendix-style
    * n-gram overlap check). Returns one row per corpus doc:
    * (id, n_grams, n_shared, contam_frac, contaminated).
    *
    * The benchmark's distinct gram hashes are broadcast — a real benchmark
    * is MBs against a 100 TB corpus — so this is one corpus scan, one
    * gram-explode, one broadcast semi-side aggregate; the corpus is never
    * shuffled by gram.
    */
  def contaminationCheck(corpus: DataFrame, benchmark: DataFrame,
                         n: Int = 3, flagAt: Double = 0.2,
                         textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val corp = corpus.select(col(idCol).as("doc_id"),
      gramHashSet(col(textCol), n).as("grams"))
    val benchGrams = benchmark
      .select(explode(gramHashSet(col(textCol), n)).as("g")).distinct()
    val shared = corp.select(col("doc_id"), explode(col("grams")).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    corp.select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(col("n_grams") > 0,
          round(coalesce(col("n_shared"), lit(0L)).cast("double") /
            col("n_grams").cast("double"), 6)).otherwise(lit(0.0)).as("contam_frac"),
        (col("n_grams") > 0 &&
          coalesce(col("n_shared"), lit(0L)).cast("double") >=
            lit(flagAt) * col("n_grams").cast("double")).as("contaminated"))
  }

  /** Rebalance a corpus to a target source mixture, keeping as much data as
    * the mixture allows: with integer weights w_s (target proportions
    * w_s / W), the largest feasible total is N* = min_s floor(count_s·W/w_s)
    * and each source keeps ~N*·w_s/W rows via the deterministic
    * `Sampling.hashBucket` predicate — same rows every run, every executor
    * count, every engine. Sources not in `weights` are dropped.
    *
    * Thresholds are exact BigInt arithmetic over the per-source counts (a
    * distinct-sources-sized aggregate, collected once at plan time — the
    * same k-row driver constant as a broadcast dim), so the oracle can
    * replay them bit-for-bit in HUGEINT SQL.
    */
  def rebalanceToMixture(df: DataFrame, weights: Map[String, Long],
                         stratumCol: String = "source", keyCol: String = "doc_id",
                         seed: Long = 0L): DataFrame =
    rebalanceByMass(df, weights, lit(1L), stratumCol, keyCol, seed)

  /** Token-budget mixture: same target proportions, but measured in TOKENS
    * (`massCol`), not rows — what a training recipe actually specifies
    * ("30% code tokens, 10% web tokens"). The per-row hash selection is
    * unchanged; only the per-source mass totals feeding the threshold
    * arithmetic switch from COUNT(*) to SUM(mass), so each source's kept
    * rows carry ~M*·w_s/W expected tokens. Deterministic and
    * oracle-replayable exactly like the row version.
    */
  def rebalanceToTokenMixture(df: DataFrame, weights: Map[String, Long],
                              massCol: String,
                              stratumCol: String = "source",
                              keyCol: String = "doc_id",
                              seed: Long = 0L): DataFrame =
    rebalanceByMass(df, weights, col(massCol).cast("bigint"), stratumCol, keyCol, seed)

  private def rebalanceByMass(df: DataFrame, weights: Map[String, Long],
                              mass: Column, stratumCol: String, keyCol: String,
                              seed: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "rebalanceToMixture: weights must be positive")
    val P2 = 1000000007L
    val masses: Map[String, Long] = df
      .filter(col(stratumCol).isin(weights.keySet.toSeq: _*))
      .groupBy(stratumCol).agg(sum(mass).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = weights.keySet -- masses.keySet
    require(missing.isEmpty, s"rebalanceToMixture: no rows for source(s) $missing")
    require(masses.values.forall(_ > 0),
      s"rebalanceToMixture: non-positive mass for some source in $masses")
    val bigW = BigInt(weights.values.sum)
    val mStar = weights.map { case (s, w) => BigInt(masses(s)) * bigW / w }.min
    val thresholds: Map[String, Long] = weights.map { case (s, w) =>
      // keep-fraction = M*·w / (W·mass_s) ≤ 1, scaled onto [0, P2]
      s -> (mStar * w * P2 / (bigW * masses(s))).toLong
    }
    val thr = thresholds.foldLeft(lit(-1L)) { case (acc, (s, t)) =>
      when(col(stratumCol) === lit(s), lit(t)).otherwise(acc)
    }
    df.where(Sampling.hashBucket(col(keyCol), seed) < thr)
  }

  /** Keep at most `cap` rows per source, priority by (`orderCol` DESC, id) —
    * the per-domain cap every web-scale corpus applies so no single site
    * dominates training. The `rank <= cap` filter triggers Spark's
    * WindowGroupLimit map-side partial top-K, so the shuffle carries at
    * most cap rows per source per input partition, not the whole corpus.
    */
  def capPerSource(df: DataFrame, cap: Int,
                   stratumCol: String = "source", orderCol: String = "n_chars",
                   idCol: String = "doc_id"): DataFrame = {
    require(cap > 0, "capPerSource: cap must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratumCol)
      .orderBy(col(orderCol).desc, col(idCol))
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= cap)
  }
}
