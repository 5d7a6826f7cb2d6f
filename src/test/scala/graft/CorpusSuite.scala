package graft

/** Runs the reference's own sqllogictest corpora end-to-end through the
  * engine (read in place from the read-only reference checkout — test DATA,
  * not code). Pass-rate gates ratchet up as coverage widens; genuine
  * mismatches on queries that executed are reported individually.
  */
class CorpusSuite extends SparkSpec {

  private def runCorpus(file: String): SqlLogicRunner#Summary = {
    val engine = GraftEngine(spark)
    val runner = new SqlLogicRunner(spark, engine)
    runner.run(file)
  }

  test("reference corpus: measures.test") {
    val s = runCorpus("/root/reference/test/sql/measures.test")
    info(s"statements ok=${s.statementsOk} errOk=${s.statementErrOk} " +
      s"queries passed=${s.queriesPassed} failed=${s.queriesFailed} skipped=${s.skipped}")
    s.failures.take(40).foreach(f => info("  " + f))
    assert(s.queriesFailed == 0, s"corpus mismatches: ${s.failures.mkString("; ")}")
    assert(s.queriesPassed >= 150, s"expected >=150 corpus queries green, got ${s.queriesPassed}")
  }

  test("reference corpus: no_semantic_prefix.test") {
    val s = runCorpus("/root/reference/test/sql/no_semantic_prefix.test")
    info(s"statements ok=${s.statementsOk} errOk=${s.statementErrOk} " +
      s"queries passed=${s.queriesPassed} failed=${s.queriesFailed} skipped=${s.skipped}")
    s.failures.take(40).foreach(f => info("  " + f))
    assert(s.queriesFailed == 0, s"corpus mismatches: ${s.failures.mkString("; ")}")
    assert(s.queriesPassed >= 110, s"expected >=110 corpus queries green, got ${s.queriesPassed}")
  }
}
