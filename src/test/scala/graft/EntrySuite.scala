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
