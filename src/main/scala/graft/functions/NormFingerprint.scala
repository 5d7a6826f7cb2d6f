package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused document fingerprint: xxhash64 (seed 42, Spark's `xxhash64`
  * seed) of the whitespace-normalized lowercase text, BIT-IDENTICAL to
  * the composed formulation it replaces:
  *
  *   xxhash64(lower(regexp_replace(trim(text), "\\s+", " ")))
  *
  * but in one pass: the composed form runs a java.util.regex NFA over
  * every document and materializes three intermediate strings (trim
  * copy, regex-replaced copy, lowercase copy) per row; the fused scan
  * writes the normalized text once and hashes its bytes. This is the
  * per-row cost of exact dedup and the fingerprint index, i.e. the first
  * pass every 100 TB ingest makes over raw text.
  *
  * Semantics replicated exactly (fenced in TextStatsSuite):
  *  - trim strips 0x20 only (Spark's StringTrim default);
  *  - \s is java.util.regex's default class [ \t\n\x0B\f\r];
  *  - lower matches Spark's Lower = UTF8String.toLowerCase (ASCII fast
  *    path, else JVM toLowerCase on the decoded string) — applied AFTER
  *    whitespace-squeeze, as in the composed form;
  *  - hash = XXH64 over the normalized UTF-8 bytes, seed 42.
  */
case class NormFingerprintExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"norm_fingerprint requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "norm_fingerprint"

  override def nullSafeEval(input: Any): Any =
    NormFingerprintExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormFingerprintExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormFingerprintExpr =
    copy(child = newChild)
}

object NormFingerprintExpr {

  def normFingerprint(text: Column): Column =
    GraftSqlBridge.column(NormFingerprintExpr(GraftSqlBridge.expression(text)))

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** One pass; called per row from generated code. */
  def compute(u: UTF8String): Long = {
    // trim = 0x20 only, exactly StringTrim's default charset
    val s = u.trim().toString
    val n = s.length
    // whitespace-squeeze without regex; skip the copy when nothing changes
    var changed = false
    var i = 0
    while (i < n && !changed) {
      val c = s.charAt(i)
      if (isWs(c) && (c != ' ' || (i + 1 < n && isWs(s.charAt(i + 1))))) changed = true
      i += 1
    }
    val squeezed =
      if (!changed) s
      else {
        val sb = new java.lang.StringBuilder(n)
        var j = 0
        var inRun = false
        while (j < n) {
          val c = s.charAt(j)
          if (isWs(c)) { if (!inRun) sb.append(' '); inRun = true }
          else { sb.append(c); inRun = false }
          j += 1
        }
        sb.toString
      }
    // lower AFTER squeeze, via UTF8String.toLowerCase — the same code
    // path Spark's Lower expression runs, so non-ASCII case mapping is
    // bit-identical to the composed formulation
    val lowered = UTF8String.fromString(squeezed).toLowerCase
    XXH64.hashUnsafeBytes(lowered.getBaseObject, lowered.getBaseOffset,
      lowered.numBytes, 42L)
  }
}
