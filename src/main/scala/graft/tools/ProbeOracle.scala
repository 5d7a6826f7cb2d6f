package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev probe: run a SparkEntry query AND its oracle SQL (when the oracle is
  * Spark-dialect-compatible) in the same session and diff the results. The
  * real gate runs the oracle in DuckDB; this catches semantic mismatches
  * before the driver does.
  *
  * Usage: runMain graft.tools.ProbeOracle <queryName> [sfDir]
  */
object ProbeOracle {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ProbeOracle <queryName> [sfDir]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("probe-oracle").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val engineResult = SparkEntry.queries(name)(spark, dir)
    println(s"=== engine: $name ===")
    engineResult.show(50, truncate = false)

    SparkEntry.oracleSql.get(name) match {
      case None => println(s"(no oracle for $name)")
      case Some(sql) =>
        // SparkEntry.queries registered the raw parquet temp views already
        val oracle = spark.sql(sql)
        println(s"=== oracle (Spark dialect) ===")
        oracle.show(50, truncate = false)
        val a = engineResult.collect().map(_.toSeq.map(String.valueOf)).toSeq
        val b = oracle.collect().map(_.toSeq.map(String.valueOf)).toSeq
        if (a == b) println(s"MATCH: ${a.size} rows identical")
        else {
          println(s"MISMATCH: engine=${a.size} rows, oracle=${b.size} rows")
          (a.diff(b) ++ b.diff(a)).take(10).foreach(r => println(s"  diff: $r"))
          sys.exit(1)
        }
    }
    spark.stop()
  }
}
