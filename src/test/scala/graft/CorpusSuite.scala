package graft

/** Runs the reference's own sqllogictest corpora end-to-end through the
  * engine (read in place from the read-only reference checkout — test DATA,
  * not code). Pass-rate gates ratchet up as coverage widens; genuine
  * mismatches on queries that executed are reported individually.
  */
class CorpusSuite extends SparkSpec {

  private def runCorpus(file: String): SqlLogicRunner#Summary = {
    // sqllogictest semantics: each file runs against a fresh database — drop
    // the managed tables the previous file's CTAS batches left behind (the
    // suites share one SparkSession)
    for (r <- spark.sql("SHOW TABLES IN default").collect() if !r.getBoolean(2))
      spark.sql(s"DROP TABLE IF EXISTS default.`${r.getString(1)}`")
    val engine = GraftEngine(spark)
    val runner = new SqlLogicRunner(spark, engine)
    runner.run(file)
  }

  // Ratchets: pass floors ratchet UP as coverage widens; the error-skip
  // ceilings pin the known-irrecoverable set (Spark capability limits:
  // setseed, lag-without-ORDER-BY under random(), correlated-scalar and
  // IN-subqueries in ORDER BY position) so a regression that turns passing
  // queries into runtime errors cannot hide among setup skips.
  test("reference corpus: measures.test") {
    val s = runCorpus("/root/reference/test/sql/measures.test")
    info(s"statements ok=${s.statementsOk} errOk=${s.statementErrOk} " +
      s"queries passed=${s.queriesPassed} failed=${s.queriesFailed} " +
      s"skipped=${s.skipped} errorSkips=${s.errorSkips}")
    info(s"skip census: ${s.skipCensus.toSeq.sortBy(_._1).mkString(", ")}")
    s.failures.take(80).foreach(f => info("  " + f))
    assert(s.queriesFailed == 0, s"corpus mismatches: ${s.failures.mkString("; ")}")
    assert(s.queriesPassed >= 191, s"expected >=191 corpus queries green, got ${s.queriesPassed}")
    // exact skip census — a NEW skip of any category is a failure, not
    // drift. Round-5 recoveries: main.-qualified batch views (permanent
    // resolution under temp shadowing) and DuckDB-convention
    // kurtosis/skewness both pass now. Remaining residue: 2 runtime errors
    // (setseed/random()-dependent lag-without-ORDER directives,
    // legitimately engine-defined).
    assert(s.skipCensus == Map(
      "setup-untranslatable" -> 0, "poisoned-reference" -> 0,
      "engine-defined" -> 0, "execution-error" -> 2),
      s"skip census drifted: ${s.skipCensus}")
  }

  test("reference corpus: no_semantic_prefix.test") {
    val s = runCorpus("/root/reference/test/sql/no_semantic_prefix.test")
    info(s"statements ok=${s.statementsOk} errOk=${s.statementErrOk} " +
      s"queries passed=${s.queriesPassed} failed=${s.queriesFailed} " +
      s"skipped=${s.skipped} errorSkips=${s.errorSkips}")
    info(s"skip census: ${s.skipCensus.toSeq.sortBy(_._1).mkString(", ")}")
    s.failures.take(80).foreach(f => info("  " + f))
    assert(s.queriesFailed == 0, s"corpus mismatches: ${s.failures.mkString("; ")}")
    assert(s.queriesPassed >= 147, s"expected >=147 corpus queries green, got ${s.queriesPassed}")
    assert(s.errorSkips == 0, s"query-execution errors appeared: ${s.errorSkips}")
    assert(s.skipped == 0, s"skip count drifted: ${s.skipped} (census ${s.skipCensus})")
  }

  // third and final reference corpus file: parser-swap guard (override path
  // with/without SEMANTIC prefix, AT expansion, plain-SQL passthrough, and
  // the decline-to-rewrite error fallback)
  test("reference corpus: peg_parser.test") {
    val s = runCorpus("/root/reference/test/sql/peg_parser.test")
    info(s"statements ok=${s.statementsOk} errOk=${s.statementErrOk} " +
      s"queries passed=${s.queriesPassed} failed=${s.queriesFailed} " +
      s"skipped=${s.skipped} errorSkips=${s.errorSkips}")
    s.failures.take(20).foreach(f => info("  " + f))
    assert(s.queriesFailed == 0, s"corpus mismatches: ${s.failures.mkString("; ")}")
    assert(s.queriesPassed == 4, s"expected 4 corpus queries green, got ${s.queriesPassed}")
    assert(s.statementErrOk == 1, s"expected 1 statement-error expectation, got ${s.statementErrOk}")
    assert(s.skipped == 0, s"skip count drifted: ${s.skipped} (census ${s.skipCensus})")
  }
}
