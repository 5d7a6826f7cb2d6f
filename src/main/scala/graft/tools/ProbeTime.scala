package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time the named SparkEntry queries (args after the first) on
  * `args(0)` with the same session shape as ProbeSweep (fresh JVM, noop
  * sink), so a single sweep cell can be re-measured without the full run.
  */
object ProbeTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      // default 64 keeps continuity with the r8/r9 sweep tables; at 1000x
      // set SPARK_GRAFT_SHUFFLE (Bench sizes ~8 MB of input per partition,
      // cap 256 — the fixed width was the suspected cause of the
      // superlinear temporal cells in PERF.md §0i)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF="k=v;k=v" — arbitrary session confs for A/B probes
    // (e.g. graft.lsh.cappedMaxKeys=0 forces the joined+grouped LSH path)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    graft.SparkEntry.engineFor(spark, dir)
    // scale-path aliases with no driver entry (same shapes ProbeSweep times
    // at the end of its run)
    val aliases: Map[String, org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame] = Map(
      "d_semdedup_auto" -> (s => graft.ops.Dedup.semanticDedup(
        s.read.parquet(s"$dir/embeddings.parquet")
          .withColumn("embedding", org.apache.spark.sql.functions.col("embedding").cast("array<double>")),
        minCosine = 0.3)),
      // the pre-r11 t_cms shape (occurrence-level sketch, tokenize runs
      // twice) — kept for the A/B against the shipped weighted-sketch plan
      "t_cms_occ" -> { s =>
        import org.apache.spark.sql.functions._
        val toks = s.read.parquet(s"$dir/documents.parquet")
          .select(explode(split(
            lower(regexp_replace(trim(col("text")), "\\s+", " ")), " ")).as("tok"))
          .filter(length(col("tok")) >= 1)
        val sketch = graft.ops.Sketches.cmsSketch(toks, "tok", depth = 3, width = 512)
        val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
        exact.join(
            graft.ops.Sketches.cmsEstimate(sketch, exact.select("tok"), "tok",
              depth = 3, width = 512),
            Seq("tok"))
          .orderBy("tok")
      })
    for (name <- names) {
      graft.SparkEntry.queries.get(name)
        .orElse(aliases.get(name).map(f => (s: org.apache.spark.sql.SparkSession, _: String) => f(s))) match {
        case None => println(s"TIME $name: no such entry")
        case Some(fn) =>
          try {
            val t0 = System.nanoTime()
            fn(spark, dir).write.format("noop").mode("overwrite").save()
            println(f"TIME $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
          } catch {
            case e: Throwable =>
              println(s"TIME $name FAILED: ${String.valueOf(e.getMessage).take(140).replace('\n', ' ')}")
          }
          spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
