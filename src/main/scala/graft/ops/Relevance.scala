package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relevance scoring for training-data curation: BM25 ranking against a
  * fixed query and per-document TF-IDF top terms — the standard signals for
  * "is this document about X" filtering and quality-weighted sampling over
  * a web-scale corpus.
  *
  * Scale shape (100 TB): everything is one narrow scan over the corpus plus
  * broadcast joins of query-sized or 1-row statistics frames.
  *   - BM25: tokenization and per-term tf are per-row expressions (no
  *     explode shuffle — tf comes from a filtered array, so only docs
  *     matching >=1 query term survive the scan); N/avgdl and per-term df
  *     are tiny aggregates cross-joined back (broadcast by AQE since both
  *     sides are 1 row); the final top-k is a TakeOrdered, never a full
  *     sort.
  *   - TF-IDF: one token-keyed shuffle to build the document-frequency
  *     table (vocabulary-sized, NOT corpus-sized after the min-df cut) and
  *     one join from per-doc term counts to it.
  *
  * Float determinism: scores are IEEE doubles computed with a literally
  * mirrored expression tree in the SQL oracle (same literals, same
  * association), so hash comparison is exact — the same discipline as
  * `TextAnalysis.qualityColumns`.
  */
object Relevance {

  /** Okapi BM25 over whitespace tokens of `lower(trim(text))`.
    *
    * score(d) = sum over query terms t of
    *   ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    *     * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    *
    * The per-term contributions are summed in FIXED term order (explicit
    * `+` chain, not a SUM aggregate) so the double result is reproducible
    * bit-for-bit across engines.
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75,
           textCol: String = "text", idCol: String = "doc_id",
           topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    val toks = split(lower(trim(col(textCol))), "\\s+")
    // per-row: document length + one tf column per query term — a single
    // narrow projection, no explode
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).cast("long").as(s"tf_$i")
    }
    val base = docs.select(
      (col(idCol).as("doc_id") +: size(toks).cast("long").as("dl") +: tfCols): _*)
    // only docs matching at least one term can score > 0
    val matched = base.filter(
      queryTerms.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _))
    // global stats and per-term dfs: 1-row frames, broadcast via cross join
    val global = base.agg(
      count(lit(1)).cast("double").as("n"),
      sum("dl").cast("double").as("sumdl"))
    val dfs = matched.agg(
      queryTerms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1).otherwise(0)).cast("double").as(s"df_$i")).head,
      queryTerms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1).otherwise(0)).cast("double").as(s"df_$i")).tail: _*)
    val joined = matched.crossJoin(broadcast(global)).crossJoin(broadcast(dfs))
    // contribution of term i, mirrored literally in the oracle SQL:
    //   ln(1 + (n - df + 0.5) / (df + 0.5))
    //     * (tf * (k1+1)) / (tf + k1 * ((1-b) + b * dl / (sumdl / n)))
    def contrib(i: Int): Column = {
      val tf = col(s"tf_$i").cast("double")
      val df = col(s"df_$i")
      log(lit(1.0) + (col("n") - df + lit(0.5)) / (df + lit(0.5))) *
        (tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / (col("sumdl") / col("n"))))
    }
    val score = queryTerms.indices.map(contrib).reduce(_ + _)
    joined.select(col("doc_id"), score.as("__score"))
      .orderBy(col("__score").desc, col("doc_id"))
      .limit(topK)
      .select(col("doc_id"), round(col("__score"), 6).as("bm25"))
  }

  /** Per-document top-`perDoc` TF-IDF terms:
    * tfidf(t, d) = tf * ln((1 + N) / (1 + df_t)), ties broken by term.
    * One token shuffle for (doc, term) counts, one vocabulary-sized
    * aggregate for df, one join between them. `minDf` drops hapax noise
    * AND bounds the df table at scale.
    */
  def tfidfTopTerms(docs: DataFrame, perDoc: Int = 3, minDf: Long = 2,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n")) // 1 row, broadcast
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val scored = tf.join(df, "term").crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") *
          log((lit(1.0) + col("n")) / (lit(1.0) + col("df").cast("double"))))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perDoc)
      .select(col("doc_id"), col("rank"), col("term"),
        round(col("tfidf"), 6).as("tfidf"))
  }
}
