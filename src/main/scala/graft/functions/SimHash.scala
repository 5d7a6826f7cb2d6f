package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused 63-bit SimHash over word shingles: shingle fingerprints via the
  * same one-pass scan as [[ShingleFpExpr]] (bit-identical to hashing the
  * shingle strings), then the per-bit +1/-1 vote and sign fold in a local
  * loop — BIT-IDENTICAL to the composed `Dedup.simhash` formulation it
  * replaces (fenced in PipelineGatesSuite), which ran shingles x 63 bit
  * extractions through interpreted higher-order functions with double
  * `pow`/division arithmetic per bit.
  */
case class SimHashExpr(child: Expression, w: Int, salt: Long = 0L) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && w >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash requires a string argument and w >= 1, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[UTF8String], w, salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpr.compute($c, $w, ${salt}L)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {

  def simhash64(text: Column, w: Int): Column =
    GraftSqlBridge.column(SimHashExpr(GraftSqlBridge.expression(text), w))

  /** Salted signature for the wide-band (128-bit) scale path: each shingle
    * fingerprint is remixed through the murmur3 64-bit finalizer XORed
    * with the salt — a bijection of the xxhash64 values, so the salted
    * vote is an independent-family signature of the SAME shingle set.
    * salt = 0 bypasses the remix and is bit-identical to [[simhash64]].
    */
  def simhash64Salted(text: Column, w: Int, salt: Long): Column =
    GraftSqlBridge.column(SimHashExpr(GraftSqlBridge.expression(text), w, salt))

  /** murmur3 fmix64 finalizer (public-domain bit mixer). */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  def compute(u: UTF8String, w: Int): Long = compute(u, w, 0L)

  def compute(u: UTF8String, w: Int, salt: Long): Long = {
    // distinct shingle fingerprints — same hashes as xxhash64 over the
    // shingle strings (dedup by hash == dedup by string absent a 64-bit
    // collision, which the composed array_distinct-then-hash tolerated
    // identically in the vote multiset)
    val arr = ShingleFpExpr.compute(u, w)
    val n = arr.numElements()
    val counts = new Array[Int](63)
    var i = 0
    while (i < n) {
      val h0 = arr.getLong(i)
      val h = if (salt == 0L) h0 else fmix64(h0 ^ salt)
      val lo = h & 0xFFFFFFFFL
      val hi = (h >> 32) & 0x7FFFFFFFL
      var b = 0
      while (b < 63) {
        val bit = if (b < 32) (lo >>> b) & 1L else (hi >>> (b - 32)) & 1L
        counts(b) += (2 * bit - 1).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 63) {
      if (counts(b) >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
