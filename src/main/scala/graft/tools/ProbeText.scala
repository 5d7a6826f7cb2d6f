package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

object ProbeText {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[2]").config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // known string: 40 chars, 4 digits, 2 punct, 3 uppercase
    val df = Seq((1L, "The Quick fox, 2024! Jumps over 42 dogs.")).toDF("doc_id", "text")
    TextAnalysis.analyze(df)
      .select("n_chars", "n_tokens", "punct_ratio", "digit_ratio", "upper_ratio", "quality_score", "lang_pred")
      .show(truncate = false)
    spark.stop()
  }
}
