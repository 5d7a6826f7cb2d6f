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
  * Scheme: b(k) = ((k mod P1) * A) mod P2, h(k) = (b² + seed·b) mod P2,
  * keep when h < frac * P2, with P1 = 1e6+3, A = 2654435761 (Knuth's 2^32
  * golden-ratio multiplier), P2 = 1e9+7. The seed multiplies b (quadratic,
  * not affine): an affine `+ seed` would rotate every bucket uniformly, so
  * two seeds would select nearly identical row sets — here the shift is
  * key-dependent and seed changes decorrelate the selection (measured:
  * seed 7 vs 8 overlap ≈ the independent-sampling expectation). All
  * intermediates stay under 2e18 for |seed| ≤ 1e9, inside BIGINT for
  * engines that check overflow (DuckDB raises; Spark wraps — identical
  * here because nothing wraps).
  */
object Sampling {

  private val P1 = 1000003L
  private val A = 2654435761L
  private val P2 = 1000000007L

  /** The bucket expression: uniform-ish in [0, P2) for integer keys.
    * `seed` must be in [0, 1e9] to keep b² + seed·b inside BIGINT.
    */
  def hashBucket(key: Column, seed: Long = 0L): Column = {
    require(seed >= 0 && seed <= 1000000000L, s"seed $seed outside [0, 1e9]")
    val b = (pmod(key.cast("bigint"), lit(P1)) * lit(A)) % lit(P2)
    (b * b + lit(seed) * b) % lit(P2)
  }

  /** Keep ~`fraction` of rows, selected by the key hash — same rows every
    * run and every engine. `fraction` in [0, 1].
    */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          seed: Long = 0L): DataFrame =
    df.where(hashBucket(col(keyCol), seed) < lit((fraction * P2).toLong))

  /** Per-stratum fractions (domain balancing / data mixing): strata listed
    * in `fractions` keep their own rate; unlisted strata keep `default`.
    * The hash is salted per-stratum key so a row's fate in one stratum is
    * independent of its fate under another fraction map.
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
}
