package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{BigramNllExpr, LmProbe}

/** Language-model perplexity filtering — the CCNet-lineage quality pass
  * (Wenzek et al., arXiv:1911.00359) that scores every corpus document by
  * how surprising its token sequence is under an n-gram model trained on
  * the corpus itself, then drops the high-perplexity tail. Production
  * pipelines run this with a KenLM model; the statistical core is the same
  * add-one-smoothed bigram model implemented here as pure Spark SQL plans.
  *
  * Determinism discipline (same as [[Classifier]]): every count is an
  * exact BIGINT; each conditional probability is ONE libm `ln` of an
  * exactly-represented rational (all integer operands stay far below 2^53,
  * so the quotient is the same IEEE double on any engine), micro-scaled to
  * a BIGINT negative-log-likelihood (`round(ln(...)*1e6)`). Per-document
  * scores are SUMS OF INTEGERS — addition-order-free — and the mean NLL is
  * integer division, so the whole operator hash-gates against a DuckDB
  * replay (entries t_lm_model / t_lm_score) with no float-summation
  * caveats.
  *
  * Scale shape (100 TB): training is one bigram-keyed shuffle with
  * map-side partial counts; `minCount` prunes the model to the Zipf head,
  * and unseen n-grams are handled by the smoothing backoff rather than by
  * keeping the tail. Scoring joins the exploded corpus against the model
  * with a `shuffle_hash` hint (a bigram table can exceed broadcast size —
  * it must never be elected the build side of a broadcast by stale stats)
  * and against the minCount-pruned unigram vocabulary by broadcast (a
  * Zipf-pruned vocabulary is millions of rows and fits every executor).
  * No corpus-sized side ever broadcasts; no driver-side loops.
  */
object LangModel {

  /** Shared tokenization convention (same as TextAnalysis/Classifier):
    * whitespace split of `lower(trim(text))`. Java's `\s` is exactly
    * `[ \t\n\x0B\f\r]`; the DuckDB oracles spell that class out explicitly
    * because RE2's `\s` omits `\x0B` (vertical tab) — with the explicit
    * class both sides tokenize identically even on `\x0B`-bearing text. */
  private def toks(textCol: String): Column =
    split(lower(trim(col(textCol))), "\\s+")

  /** Adjacent-pair array: `[(w1,w2), ...]` — empty for 1-token docs. Both
    * slices have length `size-1`, so `zip_with` never pads with nulls. */
  private def bigramPairs(t: Column): Column =
    zip_with(
      slice(t, lit(1), size(t) - 1),
      slice(t, lit(2), size(t) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))

  /** Kept unigram vocabulary: `(token, c_uni)` with corpus frequency >=
    * `minCount`. The vocabulary size `V = count(*)` of this frame is the
    * smoothing denominator everywhere below. */
  def unigramCounts(docs: DataFrame, textCol: String = "text",
                    minCount: Int = 2): DataFrame =
    docs.select(explode(toks(textCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c_uni"))
      .filter(col("c_uni") >= minCount)

  /** Train the bigram model over the kept vocabulary.
    *
    * Returns one row per retained bigram (both words kept, pair frequency
    * >= `minCount`): `(w1, w2, c_big, c_uni, w_micro)` where
    *
    *   w_micro = round( ln( (c_big + 1) / (c_uni + V) ) * 1e6 )  (<= 0)
    *
    * is the add-one-smoothed conditional log-probability of `w2` given
    * `w1` in integer micronats. `c_uni` is `w1`'s unigram frequency and
    * `V` the kept-vocabulary size, so the model is self-contained and
    * exactly replayable from its own counts.
    */
  def trainBigramLm(docs: DataFrame, unigrams: DataFrame,
                    textCol: String = "text",
                    minCount: Int = 2): DataFrame = {
    val v = unigrams.agg(count(lit(1)).as("v"))
    docs.select(explode(bigramPairs(toks(textCol))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_big"))
      .filter(col("c_big") >= minCount)
      .join(broadcast(unigrams.select(col("token").as("w1"),
        col("c_uni"))), Seq("w1"))
      .join(broadcast(unigrams.select(col("token").as("w2"))), Seq("w2"))
      .crossJoin(broadcast(v))
      .select(col("w1"), col("w2"), col("c_big"), col("c_uni"),
        round(log((col("c_big") + lit(1.0)) / (col("c_uni") + col("v"))) * lit(1e6))
          .cast("bigint").as("w_micro"))
  }

  /** Score every document: `(id, n_bigrams, nll_micro, avg_nll_micro)`.
    *
    * Each adjacent token pair contributes a non-negative micronat NLL:
    * a model bigram contributes `-w_micro`; an unseen pair whose first
    * word is in-vocabulary contributes the smoothing floor
    * `round(ln(c_uni + V) * 1e6)` (probability `1/(c_uni+V)`); a pair
    * starting with an out-of-vocabulary word contributes
    * `round(ln(V) * 1e6)` (probability `1/V`). `avg_nll_micro` is the
    * integer-division mean — the perplexity proxy a filter thresholds on —
    * and is NULL for documents with no bigram. Every document appears in
    * the output.
    */
  def scoreBigramLm(docs: DataFrame, model: DataFrame, unigrams: DataFrame,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    // Precondition V >= 2: with V = 0 the OOV floor ln(V) is -Infinity
    // (Spark would cast it to Long.MinValue while the DuckDB replay errors
    // — a silent engine/oracle divergence), and V = 1 makes OOV pairs
    // cost 0 micronats. The 1-row guard errors loudly instead; it never
    // fires on a non-degenerate corpus.
    val v = unigrams.agg(count(lit(1)).as("v"))
      .select(when(col("v") >= 2L, col("v"))
        .otherwise(raise_error(concat(
          lit("scoreBigramLm: kept vocabulary size V = "),
          col("v").cast("string"),
          lit(" but the ln(V) out-of-vocab floor needs V >= 2"))))
        .as("v"))
    val perPair = docs
      .select(col(idCol).as("__id"), explode(bigramPairs(toks(textCol))).as("bg"))
      .select(col("__id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .join(model.select(col("w1"), col("w2"), col("w_micro")).hint("shuffle_hash"),
        Seq("w1", "w2"), "left")
      .join(broadcast(unigrams.select(col("token").as("w1"), col("c_uni"))),
        Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col("__id"),
        when(col("w_micro").isNotNull, -col("w_micro"))
          .when(col("c_uni").isNotNull,
            round(log(col("c_uni") + col("v")) * lit(1e6)).cast("bigint"))
          .otherwise(round(log(col("v")) * lit(1e6)).cast("bigint"))
          .as("nll"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_bigrams"), sum("nll").as("nll_micro"))
    docs.select(col(idCol).as("__id"))
      .join(perPair, Seq("__id"), "left")
      .select(
        col("__id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"),
        when(col("n_bigrams") > 0L,
          expr("nll_micro div n_bigrams")).as("avg_nll_micro"))
  }

  /** Zero-exchange scorer: folds the minCount-pruned model into a
    * broadcast [[LmProbe]] and computes every document's score in ONE
    * projection over its token array ([[BigramNllExpr]]) — no explode, no
    * model join, no doc-keyed re-aggregation. Same output as
    * [[scoreBigramLm]], bit-identical (LangModelSuite fence): every
    * micronat constant in the probe is computed BY SPARK with the same
    * `round(log(...) * 1e6)` tree the composed path evaluates, so no
    * Scala-side rounding can diverge.
    *
    * Scale shape (100 TB): the pruned model is the Zipf head — vocabulary-
    * not corpus-sized — and ships once per executor as a broadcast. The
    * corpus is touched exactly once, with zero shuffles. Callers gate on
    * model cardinality ([[scoreBigramLmAuto]]) because a pathological
    * vocabulary could exceed the broadcast budget; the composed join path
    * remains the fallback there.
    */
  def scoreBigramLmBroadcast(docs: DataFrame, model: DataFrame,
                             unigrams: DataFrame,
                             textCol: String = "text",
                             idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    // V and both floors are SPARK-computed (bit-identity with the composed
    // path's round(log(..)*1e6) — see scaladoc); V >= 2 guard as in
    // scoreBigramLm, raised driver-side since V is materialized here anyway
    val vRow = unigrams.agg(count(lit(1)).as("v"))
      .select(col("v"),
        round(log(col("v")) * lit(1e6)).cast("bigint").as("oov"))
      .collect()(0)
    val v = vRow.getLong(0)
    if (v < 2) throw new IllegalArgumentException(
      s"scoreBigramLm: kept vocabulary size V = $v but the ln(V) " +
        "out-of-vocab floor needs V >= 2")
    val oovMicro = vRow.getLong(1)
    val uniRows = unigrams.select(col("token"),
        round(log(col("c_uni") + lit(v)) * lit(1e6)).cast("bigint").as("fl"))
      .collect()
    val tokens = new Array[String](uniRows.length)
    val floors = new Array[Long](uniRows.length)
    val idOf = new java.util.HashMap[String, Int](uniRows.length * 2)
    var i = 0
    while (i < uniRows.length) {
      tokens(i) = uniRows(i).getString(0)
      floors(i) = uniRows(i).getLong(1)
      idOf.put(tokens(i), i)
      i += 1
    }
    val modelRows = model
      .select(col("w1"), col("w2"), (-col("w_micro")).as("contrib"))
      .collect()
    val bigramIds = new Array[(Int, Int)](modelRows.length)
    val contribs = new Array[Long](modelRows.length)
    i = 0
    while (i < modelRows.length) {
      // both words are in the kept vocabulary by model construction
      bigramIds(i) = (idOf.get(modelRows(i).getString(0)),
        idOf.get(modelRows(i).getString(1)))
      contribs(i) = modelRows(i).getLong(2)
      i += 1
    }
    val probe = spark.sparkContext.broadcast(
      LmProbe(tokens, floors, oovMicro, bigramIds, contribs))
    docs.select(col(idCol).as("__id"),
        BigramNllExpr.bigramNll(toks(textCol), probe).as("s"))
      .select(
        col("__id").as(idCol),
        coalesce(col("s.n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("s.nll_micro"), lit(0L)).as("nll_micro"),
        when(col("s.n_bigrams") > 0L,
          expr("s.nll_micro div s.n_bigrams")).as("avg_nll_micro"))
  }

  /** One-shuffle trainer + zero-exchange scorer (r13): the whole
    * train-and-score pipeline with a SINGLE corpus-sized exchange.
    *
    * The composed formulation tokenizes and explodes the corpus TWICE
    * (unigram counts, then bigram counts) — two corpus explodes, two
    * corpus-sized shuffles — before scoring. This path explodes once:
    * each document contributes its adjacent pairs PLUS one terminator row
    * `(lastToken, NULL)`, so a token's unigram frequency is exactly the
    * sum of pair counts over its `w1` slot (every token position starts
    * exactly one pair-or-terminator). One pair-keyed groupBy with map-side
    * combine is the only corpus-sized shuffle; the persisted pair-count
    * frame is vocabulary²-bounded (Zipf-small), and unigrams, the model
    * and the broadcast probe all derive from it without touching the
    * corpus again. Scoring is the [[scoreBigramLmBroadcast]] projection.
    *
    * Bit-identity: unigram counts are the same exact integers (sum of
    * disjoint position counts), the model formula is literally
    * [[trainBigramLm]]'s, and the scorer is the fenced broadcast path —
    * LangModelSuite fences this end-to-end against the composed
    * unigramCounts + trainBigramLm + scoreBigramLm chain.
    */
  def scoreBigramLmFused(docs: DataFrame, textCol: String = "text",
                         idCol: String = "doc_id",
                         minCount: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    val maxRows = spark.conf.getOption("graft.lm.broadcastMaxRows")
      .map(_.toLong).getOrElse(8000000L)
    // Token array PRE-PROJECTED under the Generate: inlining `toks` into
    // the generator expression re-evaluates the regex split per reference
    // (5x per row measured — ProbeLmPlan; the optimizer does not collapse
    // a Project into a generator), while the pre-projection plans exactly
    // one split per row (2.82 -> 1.77 s for the training stage at 100x).
    val stream = docs.select(toks(textCol).as("__t"))
      .select(explode(concat(
        bigramPairs(col("__t")),
        // (lastToken, NULL) terminator; null/absent text contributes
        // nothing (concat of a null array is null, explode emits no rows)
        array(struct(try_element_at(col("__t"), lit(-1)).as("w1"),
          lit(null).cast("string").as("w2"))))).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    // Cache at full shuffle width, THEN (r14, size-aware) read it through a
    // narrow coalesce(1) only when the pair-type cardinality is known to be
    // vocabulary-small. The r13 unconditional coalesce(1)-before-persist
    // made the half-dozen downstream vocabulary-sized actions (model count,
    // V, unigram/model collects) 1-task jobs instead of 64-reducer stage
    // floors — but it also pinned the WHOLE pair-count cache in ONE
    // partition before its size was known, which at web-corpus scale
    // (billions of distinct bigram types) is a single-node OOM and a
    // 1-task unigram stage. Persisting at full width first keeps the cache
    // distributed; the count() below (needed anyway to build the cache in
    // one pass) yields the exact cardinality for free, and only a frame
    // under `graft.lm.coalesceMaxRows` is then READ single-task (narrow
    // coalesce on top of the cache — the blocks stay where they were built).
    // sf0.1/100x behavior is unchanged: the stage-floor win was always the
    // 1-task downstream reads, not the cache layout.
    val pairCountsCache = stream.groupBy("w1", "w2")
      .agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the cache NOW, in one pass: the model plan references
    // pairCounts four times (main scan + two unigram broadcasts + V), and
    // broadcast-exchange jobs launch first and RACE to build a cold cache —
    // measured as the corpus explode running 2-3x inside model.count()
    val nPairTypes = pairCountsCache.count()
    val coalesceMax = spark.conf.getOption("graft.lm.coalesceMaxRows")
      .map(_.toLong).getOrElse(8000000L)
    val pairCounts =
      if (nPairTypes <= coalesceMax) pairCountsCache.coalesce(1)
      else pairCountsCache
    try {
      val unigrams = pairCounts.groupBy("w1").agg(sum("c").as("c_uni"))
        .filter(col("c_uni") >= minCount)
        .select(col("w1").as("token"), col("c_uni"))
      val v = unigrams.agg(count(lit(1)).as("v"))
      val model = pairCounts.filter(col("w2").isNotNull)
        .filter(col("c") >= minCount)
        .select(col("w1"), col("w2"), col("c").as("c_big"))
        .join(broadcast(unigrams.select(col("token").as("w1"), col("c_uni"))), Seq("w1"))
        .join(broadcast(unigrams.select(col("token").as("w2"))), Seq("w2"))
        .crossJoin(broadcast(v))
        .select(col("w1"), col("w2"), col("c_big"), col("c_uni"),
          round(log((col("c_big") + lit(1.0)) / (col("c_uni") + col("v"))) * lit(1e6))
            .cast("bigint").as("w_micro"))
      if (model.count() <= maxRows)
        scoreBigramLmBroadcast(docs, model, unigrams, textCol, idCol)
      else scoreBigramLm(docs, model, unigrams, textCol, idCol)
    } finally pairCountsCache.unpersist(false)
  }

  /** Scorer dispatch: broadcast-probe when the pruned model fits the
    * broadcast budget (`graft.lm.broadcastMaxRows`, default 8M bigrams —
    * ~256 MB of probe tables at load 0.5, well under a production
    * executor's broadcast headroom), composed join path otherwise. The
    * model and vocabulary frames are persisted across the cardinality
    * check and probe build so the corpus-sized training passes run once.
    */
  def scoreBigramLmAuto(docs: DataFrame, model: DataFrame,
                        unigrams: DataFrame,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val maxRows = spark.conf.getOption("graft.lm.broadcastMaxRows")
      .map(_.toLong).getOrElse(8000000L)
    val uniP = unigrams.persist(StorageLevel.MEMORY_AND_DISK)
    val modelP = model.persist(StorageLevel.MEMORY_AND_DISK)
    // build the unigram cache in one pass first — the model plan references
    // it three times and its broadcast jobs would race a cold cache (same
    // hazard as the fused path's pairCounts; see scoreBigramLmFused)
    uniP.count()
    val rows = modelP.count()
    if (rows <= maxRows) {
      try scoreBigramLmBroadcast(docs, modelP, uniP, textCol, idCol)
      finally { modelP.unpersist(false); uniP.unpersist(false) }
    } else {
      // fallback = the composed path exactly as before (plus the one
      // cardinality pass); drop the cache so an over-budget model's blocks
      // don't pin executor memory across the scoring job
      modelP.unpersist(false)
      uniP.unpersist(false)
      scoreBigramLm(docs, modelP, uniP, textCol, idCol)
    }
  }
}
