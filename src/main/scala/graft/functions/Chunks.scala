package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass k-word chunking: the text's words (split on \s+ after a
  * 0x20-trim, empty edge tokens kept — Java split(-1) semantics) grouped
  * into consecutive k-word chunks joined by single spaces. STRING-IDENTICAL
  * to the composed formulation it replaces
  * (`transform(sequence(...), i -> array_join(slice(split(trim(t),'\s+'),
  * i*k+1, k), ' '))` — fenced in PipelineGatesSuite): after whitespace
  * squeeze, every chunk is a byte-substring of the squeezed text, so the
  * pass allocates one normalized buffer and slices it — no regex split
  * array, no per-chunk join through interpreted higher-order functions.
  * This is the per-row cost of C4-style chunk-level dedup.
  */
case class ChunkWordsExpr(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"chunk_words requires a string argument and k >= 1, got ${child.dataType.sql}, k=$k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chunk_words"

  override def nullSafeEval(input: Any): Any =
    ChunkWordsExpr.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ChunkWordsExpr.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ChunkWordsExpr =
    copy(child = newChild)
}

object ChunkWordsExpr {

  def chunkWords(text: Column, k: Int): Column =
    GraftSqlBridge.column(ChunkWordsExpr(GraftSqlBridge.expression(text), k))

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(u: UTF8String, k: Int): ArrayData = {
    val s0 = u.trim().toString
    val n0 = s0.length
    var changed = false
    var i = 0
    while (i < n0 && !changed) {
      val c = s0.charAt(i)
      if (isWs(c) && (c != ' ' || (i + 1 < n0 && isWs(s0.charAt(i + 1))))) changed = true
      i += 1
    }
    val squeezed =
      if (!changed) s0
      else {
        val sb = new java.lang.StringBuilder(n0)
        var j = 0
        var inRun = false
        while (j < n0) {
          val c = s0.charAt(j)
          if (isWs(c)) { if (!inRun) sb.append(' '); inRun = true }
          else { sb.append(c); inRun = false }
          j += 1
        }
        sb.toString
      }
    val norm = UTF8String.fromString(squeezed)
    val bytes = norm.getBytes
    val n = bytes.length

    var spaces = 0
    i = 0
    while (i < n) { if (bytes(i) == ' '.toByte) spaces += 1; i += 1 }
    val nw = spaces + 1
    val starts = new Array[Int](nw)
    val ends = new Array[Int](nw)
    var word = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' '.toByte) { ends(word) = i; word += 1; starts(word) = i + 1 }
      i += 1
    }
    ends(word) = n

    val nChunks = (nw + k - 1) / k
    val out = new Array[Any](nChunks)
    var c = 0
    while (c < nChunks) {
      val from = starts(c * k)
      val to = ends(math.min(c * k + k - 1, nw - 1))
      out(c) = UTF8String.fromBytes(bytes, from, to - from)
      c += 1
    }
    new GenericArrayData(out)
  }
}
