package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r14): measure the DRIVER cost of BPE's local merge rounds at
  * the collect budget — retained heap growth while holding the collected
  * (freq, symbol-array) vocabulary, and wall time of 10 merge passes — at
  * 100k and 1M words, so `graft.bpe.localMaxWords`'s default is a
  * measurement, not a guess. Words are synthetic (9–17 codepoints), the
  * size shape the capped top-K yields on a web corpus.
  */
object ProbeBpeHeap {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def heapMb(): Double = {
      System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(300)
      (Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()) / 1e6
    }

    for (n <- Seq(100000, 1000000)) {
      val words = spark.range(n.toLong).select(
          concat(lit("w"), col("id").cast("string"),
            lit("abcdefgh").substr(lit(1), (col("id") % 8 + 1).cast("int"))).as("word"),
          (lit(1000000L) / (col("id") + 1L)).cast("bigint").as("freq"))
      val before = heapMb()
      val t0 = System.nanoTime()
      val merges = graft.ops.Bpe.learnMergesLocal(spark, words, nMerges = 10)
      val nMerges = merges.count()
      val secs = (System.nanoTime() - t0) / 1e9
      // replicate learnMergesLocal's working set (freq + per-codepoint
      // symbol arrays) and hold it live to measure the retained heap the
      // merge rounds actually carry
      val vocab: Array[(Long, Array[String])] = words.collect().map { r =>
        val w = r.getString(0)
        val syms = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          syms += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        (r.getLong(1), syms.toArray)
      }
      val during = heapMb()
      println(f"[bpe-heap] n=$n%d merges=$nMerges%d local_wall=$secs%.1f s " +
        f"vocab_retained=${during - before}%.0f MB")
      require(vocab.length == n) // keep the structure live past heapMb()
    }
    spark.stop()
  }
}
