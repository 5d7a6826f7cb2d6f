package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.SubwordExpr

class SubwordSuite extends SparkSpec {
  import spark.implicits._

  private def pieces(text: String, vocab: Seq[String]): Seq[String] =
    Seq(text).toDF("t")
      .select(SubwordExpr.subwordPieces(col("t"), vocab).as("p"))
      .collect()(0).getSeq[String](0)

  test("greedy longest match wins over shorter pieces") {
    // "tab" and "table" both match; max-munch takes "table"
    assert(pieces("table", Seq("tab", "table", "le")) == Seq("table"))
    // after "tab" the rest must re-match from scratch
    assert(pieces("tables", Seq("tab", "le", "s")) == Seq("tab", "le", "s"))
  }

  test("unknown characters fall back to <unk> one code point at a time") {
    assert(pieces("xy", Seq("z")) == Seq("<unk>", "<unk>"))
    assert(pieces("axb", Seq("a", "b")) == Seq("a", "<unk>", "b"))
    // a non-BMP char (surrogate pair) is ONE unknown, not two
    assert(pieces("a😀b", Seq("a", "b")) == Seq("a", "<unk>", "b"))
  }

  test("whitespace segments words; pieces never span a boundary") {
    assert(pieces("ab ab", Seq("ab", "b")) == Seq("ab", "ab"))
    // "b a" across the space must NOT match piece "ba"
    assert(pieces("b a", Seq("ba", "a", "b")) == Seq("b", "a"))
    assert(pieces("  a \t b \n", Seq("a", "b")) == Seq("a", "b"))
    assert(pieces("", Seq("a")) == Seq())
  }

  test("matches a brute-force reference on random strings") {
    val vocab = Seq("ab", "abc", "bc", "c", "aa", "ba")
    def brute(text: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      for (word <- text.split("[ \t\n\f\r]+").filter(_.nonEmpty)) {
        var p = 0
        while (p < word.length) {
          val best = vocab.filter(v => word.startsWith(v, p)).map(_.length)
            .sorted.lastOption.getOrElse(0)
          if (best > 0) { out += word.substring(p, p + best); p += best }
          else { out += "<unk>"; p += 1 }
        }
      }
      out.toSeq
    }
    val rnd = new Random(7)
    val texts = Seq.fill(60)(
      Seq.fill(rnd.nextInt(6))(
        Seq.fill(1 + rnd.nextInt(7))("abcd".charAt(rnd.nextInt(4))).mkString)
        .mkString(" "))
    // run through a DataFrame so whole-stage codegen executes the expression
    val got = texts.toDF("t")
      .select(SubwordExpr.subwordPieces(col("t"), vocab).as("p"))
      .collect().map(_.getSeq[String](0))
    texts.zip(got).foreach { case (t, g) =>
      assert(g == brute(t), s"mismatch on '$t'")
    }
  }

  test("rejects empty vocab and whitespace-bearing pieces at analysis") {
    val df = Seq("x").toDF("t")
    intercept[Exception] {
      df.select(SubwordExpr.subwordPieces(col("t"), Seq.empty)).collect()
    }
    intercept[Exception] {
      df.select(SubwordExpr.subwordPieces(col("t"), Seq("a b"))).collect()
    }
  }

  test("stays inside whole-stage codegen") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = d.select(SubwordExpr.subwordPieces(lower(trim(col("text"))),
        Seq("table", "scan", "a")).as("p"))
      .queryExecution.executedPlan.toString()
    // the "*(n)" operator prefix is the WholeStageCodegen marker
    assert(plan.contains("*(1) Project [subword_pieces"),
      s"expected the projection inside a codegen stage:\n$plan")
  }
}
