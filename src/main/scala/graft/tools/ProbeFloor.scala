package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/repo/bench_sf10"
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")
    def time(label: String, sql: String): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: median ${ts.sorted.apply(1)}%.3f (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    time("count_star", "SELECT COUNT(*) FROM lineitem")
    time("scan_1col_agg", "SELECT SUM(l_quantity) FROM lineitem")
    time("grouped_2col", "SELECT l_returnflag, SUM(l_extendedprice * (1 - l_discount)) FROM lineitem GROUP BY l_returnflag")
    spark.stop()
  }
}
