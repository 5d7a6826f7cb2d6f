package graft

/** Smoke-runs every SparkEntry query at sf0.001 (the driver runs them at
  * sf0.01 against the DuckDB oracle). Catches SQL/typo/type errors before
  * the correctness gate.
  */
class EntrySuite extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // queries that may legitimately return few/zero rows (near-dup search on
  // a corpus with no near-duplicates)
  private val mayBeEmpty = Set("d_minhash", "d_simhash", "d_embed_neardup", "d_embed_exact")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"entry: $name") {
      val df = fn(spark, dir)
      val n = df.count()
      info(s"$name -> $n rows")
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  // round-10 hardening fence: the dashboard's explicit rank-interpolation
  // median must equal Spark's own median() on the same grouped data — the
  // hardening changed the COMPUTATION PATH (no median() call on either
  // engine), never the semantics. Checked at both test scales so odd AND
  // even group sizes are exercised.
  test("t_dashboard med_tokens == median() on the same engine") {
    import org.apache.spark.sql.functions._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val dash = SparkEntry.queries("t_dashboard")(spark, d)
        .select("source", "lang", "med_tokens")
      val ref = spark.read.parquet(s"$d/documents.parquet")
        .select(col("source"), col("lang"),
          size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).cast("long").as("ntok"))
        .groupBy("source", "lang")
        .agg(expr("median(CAST(ntok AS DOUBLE))").as("med_ref"))
      val diff = dash.join(ref, Seq("source", "lang"))
        .filter(col("med_tokens") =!= col("med_ref"))
        .count()
      assert(diff == 0, s"$d: rank-interpolated median diverged on $diff groups")
    }
  }

  // the oracle pins the warning text as a literal; both sides are runnable
  // here, so the hash-equality the driver will check is asserted locally
  test("m_warnings matches its oracle literal exactly") {
    val got = SparkEntry.queries("m_warnings")(spark, dir).collect().map(_.toString).toSeq
    val want = spark.sql(SparkEntry.oracleSql("m_warnings")).collect().map(_.toString).toSeq
    assert(got == want, s"engine=$got oracle=$want")
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
