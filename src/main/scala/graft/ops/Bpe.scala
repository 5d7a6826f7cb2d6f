package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary induction — learning
  * the merge table that [[graft.functions.SubwordTokenizeExpr]] consumes.
  * Completes the tokenizer story: induce merges from the corpus here,
  * tokenize with them, pack with [[Packing]].
  *
  * Classic BPE (Sennrich et al. 2016, arXiv:1508.07909): start from
  * per-character symbols, repeatedly find the most frequent adjacent
  * symbol pair (weighted by word frequency) and fuse it, one simultaneous
  * left-to-right pass per step.
  *
  * Scale shape: the only corpus-sized stage is the word count — one
  * shuffle, map-side combined. Everything after runs on the WORD
  * VOCABULARY (capped at `topWords` rows), which is millions of rows at
  * 100 TB, not terabytes: each merge step is a pair-count aggregation
  * plus a top-1 reduction over that small table. The driver pulls ONE row
  * per step (the argmax pair) — BPE training is inherently a
  * driver-coordinated iteration; the per-step plan is kept O(1) with an
  * eager localCheckpoint (the connected-components lesson). Ties break
  * deterministically by (count DESC, left ASC, right ASC) in binary
  * string order, identical in Spark and DuckDB (UTF-8 byte order =
  * codepoint order).
  *
  * Every step's winning pair and its count are integer-exact, so the
  * driver oracle replays the full recurrence: the greedy one-pass merge
  * is expressed non-recursively in SQL by grouping consecutive
  * match-position runs and keeping odd ranks (greedy takes the 1st, 3rd,
  * ... of each overlap run).
  */
object Bpe {

  /** Learn `nMerges` merges from the corpus; returns the merge table
    * (step, lft, rgt, n) in learning order — step and n are bigint, n is
    * the frequency-weighted count of the pair when it won.
    */
  def learnMerges(docs: DataFrame, textCol: String = "text", nMerges: Int = 10,
                  maxWordLen: Int = 20, topWords: Int = 2000): DataFrame = {
    require(nMerges >= 1, s"nMerges $nMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    // corpus -> word frequencies: the ONE full-data pass; deterministic
    // top-K by (freq DESC, word ASC) bounds all later work
    val words = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")).between(1, maxWordLen))
      .groupBy("word").agg(count("*").as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(topWords)
    var vocab: Dataset[(String, Long, Seq[String])] = words
      .select(col("word"), col("freq"),
        // split('') leaves a trailing empty match in Spark (limit -1) —
        // drop empties so symbols are exactly the word's codepoints
        expr("filter(split(word, ''), x -> x != '')").as("syms"))
      .as[(String, Long, Seq[String])]
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val best = vocab.toDF("word", "freq", "syms")
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms)-2), i -> struct(syms[i] AS l, syms[i+1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step.toLong, a, b, n))
        vocab = vocab.map { case (w, f, syms) => (w, f, mergeOnce(syms, a, b)) }
          .localCheckpoint(true)
        step += 1
      }
    }
    merges.result().toDF("step", "lft", "rgt", "n")
  }

  /** One simultaneous greedy left-to-right merge pass (a BPE "apply"):
    * fuse non-overlapping (a,b) occurrences, leftmost first.
    */
  def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }
}
