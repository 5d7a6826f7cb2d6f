package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused 53-bit polynomial string hash — the codegen twin of
  * [[graft.ops.Dedup.polyStringHash]] (which stays as the
  * oracle-readable composed spec): fold per code point
  * `acc = (acc * 31 + codepoint) % 9007199254740881`, empty string → 0.
  * BIT-IDENTICAL to the composed aggregate/transform/ascii formulation
  * (`substr(i,1)` slices UTF-8 characters and `ascii` returns
  * `codePointAt(0)`; fenced in SketchesSuite), replayable by any SQL
  * engine with the same fold. One pass, no per-row array allocation —
  * the composed HOF version costs two array builds per input string,
  * which dominated the count-min sketch scan at 100×.
  */
case class PolyHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHashExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

object PolyHashExpr {

  private val P = 9007199254740881L // < 2^53

  def polyHash(value: Column): Column =
    GraftSqlBridge.column(PolyHashExpr(GraftSqlBridge.expression(value)))

  def compute(u: UTF8String): Long = {
    val s = u.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % P // acc < 2^53, so acc*31 + cp < 2^59
      i += Character.charCount(cp)
    }
    acc
  }
}
