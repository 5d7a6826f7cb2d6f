package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Naive Bayes token-weight sum over a document's token array,
  * probing a broadcast model — the zero-exchange formulation of
  * [[graft.ops.Classifier.scoreNaiveBayes]]'s explode + join + re-group.
  *
  * The composed formulation explodes every corpus token, broadcast-joins
  * the exploded stream against the model, re-groups by document, and joins
  * the per-doc sums back to the doc list — one corpus-sized Generate plus
  * TWO doc-keyed exchanges for what is per-document-local integer
  * arithmetic. This expression probes the model (token -> w_micro) per
  * array element and returns the exact integer sum in a single projection:
  * no explode, no join, no re-aggregation, and the join-back disappears
  * because every doc row computes its own sum. The same shape as
  * [[BigramNllExpr]] (whose probe construction notes apply here too).
  *
  * Bit-identity with the composed path: integer addition is
  * order-insensitive, so folding the array left-to-right yields exactly the
  * groupBy SUM of the exploded stream; unknown tokens contribute 0, which
  * is exactly the composed inner join dropping them. The w_micro values in
  * [[NbProbe]] are collected from the model DataFrame unchanged (computed
  * BY SPARK with the model's own `round(log(...)*1e6)` tree — the probe
  * build never re-derives them). Fenced in ClassifierSuite.
  */
case class NbTokenSumExpr(child: Expression, probe: Broadcast[NbProbe])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nb_token_sum requires array<string> tokens, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "nb_token_sum"

  def computeSum(arr: ArrayData): Long = {
    val p = probe.value
    val n = arr.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      s += p.weight(arr.getUTF8String(i))
      i += 1
    }
    s
  }

  override def nullSafeEval(input: Any): Any =
    computeSum(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nbTokenSum", this, classOf[NbTokenSumExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.computeSum($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NbTokenSumExpr =
    copy(child = newChild)
}

object NbTokenSumExpr {
  /** Column wrapper: integer w_micro sum for a token array. */
  def nbTokenSum(tokens: Column, probe: Broadcast[NbProbe]): Column =
    GraftSqlBridge.column(NbTokenSumExpr(GraftSqlBridge.expression(tokens), probe))
}

/** Broadcast probe for [[NbTokenSumExpr]]: token -> w_micro, UTF8String-
  * keyed so lookups against array elements are zero-copy. Weights are the
  * model DataFrame's own BIGINTs, collected verbatim.
  */
final class NbProbe private (
    weights: java.util.HashMap[UTF8String, java.lang.Long]) extends Serializable {

  /** w_micro for a token, or 0 when out of the model vocabulary (the
    * composed inner join drops unknown tokens — same contribution). */
  def weight(u: UTF8String): Long = {
    val v = weights.get(u)
    if (v eq null) 0L else v.longValue()
  }

  def size: Int = weights.size()
}

object NbProbe {
  def apply(tokens: Array[String], ws: Array[Long]): NbProbe = {
    require(tokens.length == ws.length)
    val m = new java.util.HashMap[UTF8String, java.lang.Long](tokens.length * 2)
    var i = 0
    while (i < tokens.length) {
      m.put(UTF8String.fromString(tokens(i)), java.lang.Long.valueOf(ws(i)))
      i += 1
    }
    new NbProbe(m)
  }
}
