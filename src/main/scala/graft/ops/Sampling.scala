package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data mixing.
  *
  * A training-data pipeline needs REPRODUCIBLE sampling: the same corpus,
  * fractions, and seed must select the same rows on every run, every
  * executor count, and every engine — `rand()` gives none of that. These
  * operators hash a stable key column through a multiplicative-congruential
  * scheme written in plain integer SQL arithmetic, so the selection is a
  * pure per-row predicate: narrow, pushdown-friendly, runs at scan speed at
  * 100 TB, and independently computable by any SQL engine (the driver's
  * DuckDB oracle evaluates the identical expression).
  *
  * Scheme over the FULL 63-bit key (split so no product overflows BIGINT):
  *   b(k) = ((k & (2^30−1)) · A + (k >> 30) · B) mod P2
  *   h(k) = (b² + seed·b) mod P2,          keep when h < frac · P2
  * with A = 2654435761 (Knuth's 2^32 golden-ratio multiplier), B = 976369,
  * P2 = 1e9+7. The low/high split (not a `k mod small-prime` pre-reduction,
  * which would make the selection PERIODIC in the key — ids congruent mod
  * the prime would always share their fate) keeps every key bit live.
  * The seed multiplies b (quadratic, not affine): an affine `+ seed` would
  * rotate every bucket uniformly, so two seeds would select nearly
  * identical row sets — here the shift is key-dependent and seed changes
  * decorrelate the selection (measured: seed 7 vs 8 overlap ≈ the
  * independent-sampling expectation). All intermediates stay under 3e18
  * for 0 ≤ seed ≤ 1e9, inside BIGINT for engines that check overflow
  * (DuckDB raises; Spark wraps — identical here because nothing wraps).
  * Keys must be non-negative (`>>` sign-extends).
  */
object Sampling {

  private val A = 2654435761L
  private val B = 976369L
  private val P2 = 1000000007L
  private val LowMask = (1L << 30) - 1

  /** The bucket expression: uniform-ish in [0, P2) for integer keys ≥ 0.
    * `seed` must be in [0, 1e9] to keep b² + seed·b inside BIGINT.
    */
  def hashBucket(key: Column, seed: Long = 0L): Column = {
    require(seed >= 0 && seed <= 1000000000L, s"seed $seed outside [0, 1e9]")
    // a negative key would sign-extend through >> into a negative bucket
    // that compares below every threshold (always sampled) — fail loudly
    // instead of silently breaking the rate
    val k = when(key.cast("bigint") < 0,
      raise_error(concat(lit("Sampling.hashBucket: negative key "), key.cast("string"))))
      .otherwise(key.cast("bigint"))
    val b = (k.bitwiseAND(lit(LowMask)) * lit(A) + shiftright(k, 30) * lit(B)) % lit(P2)
    (b * b + lit(seed) * b) % lit(P2)
  }

  /** Keep ~`fraction` of rows, selected by the key hash — same rows every
    * run and every engine. `fraction` in [0, 1].
    */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          seed: Long = 0L): DataFrame =
    df.where(hashBucket(col(keyCol), seed) < lit((fraction * P2).toLong))

  /** Weighted priority sample (Duffield/Lund/Thorup priority sampling):
    * keep the k rows with the largest priority w/u, u a per-row uniform
    * derived from the key hash — inclusion probability grows ∝ weight, so
    * "sample 50k documents weighted by token count" is one call. All
    * arithmetic is INTEGER (priority = (w << 30) DIV u with u in
    * [1, P2] and w ≤ 2^32, so the product stays inside BIGINT), which
    * makes the selection deterministic, engine-replayable (exact DuckDB
    * oracle), and nested the same way on every executor count.
    *
    * Scale shape: a narrow map computes the priority, then top-k runs as
    * TakeOrdered (per-partition partial top-k, one k-row merge at the
    * driver) — no global sort, no full shuffle.
    */
  def weightedPrioritySample(df: DataFrame, k: Int, weightCol: Column,
                             keyCol: String, seed: Long = 0L): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val w = when(weightCol.cast("bigint") < 0 || weightCol.cast("bigint") > (1L << 32),
        raise_error(concat(lit("weightedPrioritySample: weight outside [0, 2^32]: "),
          weightCol.cast("string"))))
      .otherwise(weightCol.cast("bigint"))
    df.withColumn("__wps_u", hashBucket(col(keyCol), seed) + lit(1L))
      .withColumn("__wps_w", w)
      .withColumn("priority", expr(s"(__wps_w * ${1L << 30}) DIV __wps_u"))
      .orderBy(col("priority").desc, col(keyCol))
      .limit(k)
      .drop("__wps_u", "__wps_w")
  }

  /** Per-stratum fractions (domain balancing / data mixing): strata listed
    * in `fractions` keep their own rate; unlisted strata keep `default`.
    *
    * Selections under one seed are NESTED across fraction maps: raising a
    * stratum's rate keeps every previously selected row and adds more
    * (h < t1 ⊆ h < t2 for t1 ≤ t2). That monotonicity is intentional — it
    * is what lets a mixing recipe be scaled up incrementally without
    * reshuffling the rows already in the training set. For an independent
    * re-draw, change the seed.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       fractions: Map[String, Double], default: Double = 0.0,
                       seed: Long = 0L): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (acc, (s, f)) =>
      when(col(stratumCol) === lit(s), lit(f)).otherwise(acc)
    }
    // explicit floor: a bare double->bigint CAST truncates in Spark but
    // ROUNDS in DuckDB — floor-then-cast is the cross-engine-stable form
    df.where(hashBucket(col(keyCol), seed) <
      floor(frac * lit(P2.toDouble)).cast("bigint"))
  }

  /** Reproducible training-order shuffle: assign every row a position
    * 1..N in hash order of its key — the corpus permutation step between
    * packing and batching. Same corpus + seed => the same order on every
    * run, executor count, and engine (semantically it IS
    * `row_number() OVER (ORDER BY hashBucket(key, seed), key)`, which is
    * what the DuckDB oracle runs).
    *
    * Computed WITHOUT a global single-partition window: hash space is cut
    * into `nBuckets` contiguous ranges, so enumeration is (1) per-bucket
    * counts — one map-side-combined shuffle of at most nBuckets rows, (2)
    * a prefix-sum window over those counts (bucket rows, not data rows —
    * driver-trivial like the Histogram cumulative), broadcast back, (3)
    * per-bucket row_number, a window PARTITIONED by bucket. At 100 TB,
    * raise nBuckets so buckets fit in executor memory; hash uniformity
    * keeps them balanced.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String, seed: Long = 0L,
                           nBuckets: Int = 1024): DataFrame = {
    require(nBuckets >= 1, s"nBuckets >= 1: $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val bucketWidth = (P2 + nBuckets - 1) / nBuckets
    val withH = df
      .withColumn("__h", hashBucket(col(keyCol), seed))
      .withColumn("__b", (col("__h") / lit(bucketWidth)).cast("long"))
    val offsets = withH.groupBy("__b").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum("__n").over(Window.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__b", "__off")
    val rn = row_number().over(
      Window.partitionBy("__b").orderBy(col("__h"), col(keyCol)))
    withH.join(broadcast(offsets), Seq("__b"))
      .withColumn("position", col("__off") + rn.cast("long"))
      .drop("__h", "__b", "__off")
  }
}
