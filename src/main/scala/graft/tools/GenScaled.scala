package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generate an N× scaled copy of an sf directory for the PERF.md crossover
  * measurement: lineitem/orders/customer are replicated with shifted join
  * keys (so join fan-out and key cardinalities scale with the data), the
  * small dimension tables and the text/embedding corpora are copied as-is.
  *
  * Usage: runMain graft.tools.GenScaled [srcDir] [dstDir] [copies] [docMode]
  *
  * docMode (r12 verdict task 2):
  *   legacy       (default) every doc copy is a suffix-only near-duplicate
  *                — families grow with `copies` (and compound across
  *                chained runs), which at 1000x yields 1000-member
  *                families and a ~2.5B-row true pair set. Kept for
  *                reproducing the existing bench_sf10/bench_sf100 dirs.
  *   bounded      realistic duplicate structure: every 10th base doc gets
  *                a bounded family (5 suffix near-dup copies); all other
  *                copies are content-shifted (a marker token spliced every
  *                4th word breaks ~3/4 of the 3-word shingles, Jaccard
  *                ~0.14 « 0.7) so they are near-dups of NOTHING. True-pair
  *                cardinality grows LINEARLY in corpus size — the web-crawl
  *                shape, not the compounding artifact.
  *   bounded-docs-only   bounded, but writes ONLY documents.parquet (for a
  *                dedup-probe dir whose other tables are symlinked).
  */
object GenScaled {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/bench_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val docMode = args.lift(3).getOrElse("legacy")
    val docsOnly = docMode == "bounded-docs-only"
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[16]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (docsOnly) {
      writeDocs(spark, src, dst, copies, bounded = true)
      println(s"scaled $copies x (docs only, bounded families) from $src to $dst")
      spark.stop()
      return
    }

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val cust = spark.read.parquet(s"$src/customer.parquet")
    val ordOff = ord.agg(max("o_orderkey")).head().getLong(0) + 1
    val custOff = cust.agg(max("c_custkey")).head().getLong(0) + 1

    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame =
      (0 until copies).map { i =>
        shifts.foldLeft(df) { case (d, (c, off)) => d.withColumn(c, col(c) + lit(i * off)) }
      }.reduce(_ union _)

    replicate(li, Map("l_orderkey" -> ordOff))
      .repartition(32).write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    replicate(ord, Map("o_orderkey" -> ordOff, "o_custkey" -> custOff))
      .repartition(8).write.mode("overwrite").parquet(s"$dst/orders.parquet")
    replicate(cust, Map("c_custkey" -> custOff))
      .repartition(4).write.mode("overwrite").parquet(s"$dst/customer.parquet")

    // the pipeline corpora scale too (r5 verdict: leaving them at sf0.1
    // made the 100x d_*/t_*/s_* numbers measure scheduling floor, not
    // scaling). See docMode scaladoc for the two duplicate structures.
    writeDocs(spark, src, dst, copies, bounded = docMode == "bounded")

    // embeddings: shifted ids + deterministic per-dimension jitter (breaks
    // exact-duplicate ties without moving vectors off their label cluster)
    val emb0 = spark.read.parquet(s"$src/embeddings.parquet")
    val embOff = emb0.agg(max("vec_id")).head().getLong(0) + 1
    (0 until copies).map { i =>
      emb0.withColumn("vec_id", col("vec_id") + lit(i * embOff))
        .withColumn("embedding", expr(
          s"transform(embedding, (x, d) -> x + ((vec_id * 31 + d * 7 + $i) % 101 - 50) * 1e-4)"))
    }.reduce(_ union _)
      .repartition(32).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // events scale along the realistic axis — MORE USERS, same per-user
    // event density (shifted user_id + event_id per copy; timestamps stay):
    // as-of/range/session state is per-user, so this grows the key space
    // the way a larger deployment would, without inflating any one user's
    // timeline past its real density
    val ev0 = spark.read.parquet(s"$src/events.parquet")
    val evOff = ev0.agg(max("event_id")).head().getLong(0) + 1
    val userOff = ev0.agg(max("user_id")).head().getLong(0) + 1
    (0 until copies).map { i =>
      ev0.withColumn("event_id", col("event_id") + lit(i * evOff))
        .withColumn("user_id", col("user_id") + lit(i * userOff))
    }.reduce(_ union _)
      .repartition(32).write.mode("overwrite").parquet(s"$dst/events.parquet")

    for (t <- Seq("region", "nation", "supplier", "part")) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    println(s"scaled $copies x from $src to $dst")
    spark.stop()
  }

  /** Scale documents.parquet by `copies`. Legacy: every copy is a suffix
    * near-dup (families of `copies`, compounding). Bounded (r14, per the
    * r13 advice — the old bounded mode only ever formed families on copies
    * 1-4, so true-pair cardinality was CONSTANT in the copies factor):
    * every 10th base doc seeds one near-dup family PER 10-COPY BLOCK —
    * block 0 keeps the old shape (the verbatim copy-0 original + copies
    * 1-4 as suffix near-dups, family of 5), every later block b forms its
    * own 4-member family (copies 10b+1..10b+4 share a block-keyed marker
    * splice plus a copy-unique suffix, so they match each other and
    * NOTHING outside the block). Every remaining copy splices a
    * (doc, copy)-unique marker after every 4th word — 3-shingle Jaccard vs
    * any sibling ~0.14, far below the 0.7 near-dup threshold. True-pair
    * cardinality therefore grows LINEARLY in corpus size — the web-crawl
    * shape. Built with a crossJoin against the copy range (a `copies`-way
    * union plan stops planning around a few hundred branches).
    */
  private def writeDocs(spark: SparkSession, src: String, dst: String,
                        copies: Int, bounded: Boolean): Unit = {
    val docs0 = spark.read.parquet(s"$src/documents.parquet")
    val docOff = docs0.agg(max("doc_id")).head().getLong(0) + 1
    val out =
      if (!bounded)
        (0 until copies).map { i =>
          docs0.withColumn("doc_id", col("doc_id") + lit(i * docOff))
            .withColumn("text", concat(col("text"), lit(s" copytag$i")))
            .withColumn("n_chars", col("n_chars") + lit(s" copytag$i".length.toLong))
        }.reduce(_ union _)
      else {
        val base = docs0.crossJoin(spark.range(copies.toLong).toDF("__copy"))
          .withColumn("doc_id", col("doc_id") + col("__copy") * lit(docOff))
        val famDup = col("doc_id") % lit(docOff) % 10 === 0 &&
          col("__copy") % 10 >= 1 && col("__copy") % 10 <= 4
        // markers spliced after every 4th word: family members share the
        // block-keyed marker (so they match each other), everyone else
        // gets a (doc, copy)-unique one (so they match nothing)
        val famMarker =
          s"concat(' b', CAST(CAST(__copy DIV 10 AS BIGINT) AS STRING), " +
            s"'f', CAST(doc_id % $docOff AS STRING))"
        val uniqMarker =
          s"concat(' u', CAST(doc_id % $docOff AS STRING), " +
            "'x', CAST(__copy AS STRING))"
        def splice(markerSql: String) = expr(
          "array_join(transform(split(text, ' '), (w, j) -> " +
            s"IF(j % 4 = 3, concat(w, $markerSql), w)), ' ')")
        val copyTag = concat(lit(" copytag"), col("__copy").cast("string"))
        val famText =
          when(col("__copy") < 10, concat(col("text"), copyTag)) // block 0: old shape
            .otherwise(concat(splice(famMarker), copyTag))
        base
          .withColumn("text",
            when(col("__copy") === 0, col("text"))
              .when(famDup, famText)
              .otherwise(splice(uniqMarker)))
          .withColumn("n_chars",
            when(col("__copy") === 0, col("n_chars"))
              .otherwise(length(col("text")).cast(docs0.schema("n_chars").dataType)))
          .drop("__copy")
      }
    out.repartition(math.max(32, copies / 16))
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
  }
}
