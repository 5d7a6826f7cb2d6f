package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused HLL register key: (register index, geometric statistic) of one
  * value's 53-bit polynomial hash, in one pass over the string.
  *
  * Replaces the composed pipeline in [[graft.ops.Sketches.hllRegisters]]
  *   h   = aggregate(transform(sequence(1, len), i -> ascii(substr(i,1))), ...)
  *   idx = pmod(h, m)
  *   rho = least(coalesce(get(filter(sequence(1,46), bit-scan), 0), 46), maxRho)
  * — three interpreted higher-order functions allocating two arrays per
  * input row — with a single codegen call. BIT-IDENTICAL to the composed
  * formulation (fenced in SketchesSuite): the hash folds per CODE POINT
  * (`substr(i,1)` slices UTF-8 characters and `ascii` returns
  * `codePointAt(0)`), empty strings hash to 0, and rho is the 1-based
  * position of the lowest set bit of h/m scanned over positions 1..46
  * (absent → 46), capped at `maxRho` — exactly the arithmetic the DuckDB
  * oracle replays.
  */
case class HllIdxRhoExpr(child: Expression, p: Int, maxRho: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && p >= 4 && p <= 14 && maxRho >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_idx_rho requires a string argument, p in [4,14], maxRho >= 1; " +
        s"got ${child.dataType.sql}, p=$p, maxRho=$maxRho")
  override def dataType: DataType = StructType(Seq(
    StructField("idx", LongType, nullable = false),
    StructField("rho", LongType, nullable = false)))
  override def prettyName: String = "hll_idx_rho"

  override def nullSafeEval(input: Any): Any =
    HllIdxRhoExpr.compute(input.asInstanceOf[UTF8String], p, maxRho)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HllIdxRhoExpr.compute($c, $p, $maxRho)")

  override protected def withNewChildInternal(newChild: Expression): HllIdxRhoExpr =
    copy(child = newChild)
}

object HllIdxRhoExpr {

  def hllIdxRho(value: Column, p: Int, maxRho: Int): Column =
    GraftSqlBridge.column(HllIdxRhoExpr(GraftSqlBridge.expression(value), p, maxRho))

  def compute(u: UTF8String, p: Int, maxRho: Int): InternalRow = {
    // shared fused 53-bit polynomial fold (empty string -> 0, matching
    // ascii('') = 0 over the composed path's 1-element sequence)
    val acc = PolyHashExpr.compute(u)
    val m = 1L << p
    val idx = acc % m // acc >= 0, so % == pmod
    val rest = acc / m
    // 1-based position of the lowest set bit, scanned over 1..46 like the
    // composed filter(sequence(1,46), ...); no hit (rest == 0 or lowest
    // set bit past 46) -> 46; then the maxRho cap
    val tz = java.lang.Long.numberOfTrailingZeros(rest) // 64 when rest == 0
    val r0 = if (tz < 46) tz + 1 else 46
    val rho = math.min(r0, maxRho)
    new GenericInternalRow(Array[Any](idx, rho.toLong))
  }
}
