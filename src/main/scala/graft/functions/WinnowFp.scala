package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing fingerprints (Schleimer/Wilkerson/Aiken): char-k-gram
  * xxhash64 values of the normalized text, window-minimized, first-
  * occurrence-distinct — BIT-IDENTICAL (values AND order) to the composed
  * formulation in `TextAnalysis.winnowFingerprintsComposed` (fenced in
  * TextStatsSuite), in ONE pass:
  *
  *  - every k-code-point gram of the normalized (trim/\s+-squeeze/lower)
  *    text is a byte-substring, so gram hashes are XXH64 over byte ranges
  *    between code-point boundaries — no substr materialization, no
  *    interpreted transform per position;
  *  - the sliding window minimum runs on the local gram array;
  *  - distinct keeps first-occurrence order, matching array_distinct.
  *
  * Text shorter than k code points yields an EMPTY set.
  */
case class WinnowFpExpr(child: Expression, k: Int, window: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && window >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fp requires a string argument, k >= 1, window >= 1; got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override def nullSafeEval(input: Any): Any =
    WinnowFpExpr.compute(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFpExpr.compute($c, $k, $window)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpExpr =
    copy(child = newChild)
}

object WinnowFpExpr {

  def winnowFp(text: Column, k: Int, window: Int): Column =
    GraftSqlBridge.column(WinnowFpExpr(GraftSqlBridge.expression(text), k, window))

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(u: UTF8String, k: Int, window: Int): ArrayData = {
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
    val lowered = UTF8String.fromString(squeezed).toLowerCase
    val bytes = lowered.getBytes
    val n = bytes.length

    // code-point boundaries (byte offset of each code point, plus end)
    val offs = new Array[Int](n + 1)
    var cp = 0
    i = 0
    while (i < n) {
      offs(cp) = i
      val b = bytes(i) & 0xFF
      i += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
      cp += 1
    }
    offs(cp) = n
    if (cp < k) return new GenericArrayData(Array.emptyLongArray)

    val g = cp - k + 1
    val grams = new Array[Long](g)
    var p = 0
    while (p < g) {
      grams(p) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + offs(p), offs(p + k) - offs(p), 42L)
      p += 1
    }

    // sliding window minimum; positions 0..max(g-window, 0), truncating
    // slices at the end exactly as slice()+array_min did
    val wCount = math.max(g - window, 0) + 1
    val mins = new Array[Long](wCount)
    var wpos = 0
    while (wpos < wCount) {
      var m = Long.MaxValue
      var q = wpos
      val lim = math.min(wpos + window, g)
      while (q < lim) { if (grams(q) < m) m = grams(q); q += 1 }
      mins(wpos) = m
      wpos += 1
    }

    // first-occurrence distinct (array_distinct order)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var r = 0
    while (r < wCount) { seen.add(mins(r)); r += 1 }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
