package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
  private[functions] def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Byte-sliced vote tables: LANES(v) spreads byte v's 8 bits into 8
    * one-byte lanes of a long, so one table add counts 8 bit positions —
    * the per-shingle vote drops from 63 shift/mask/add iterations to 8
    * table adds (SWAR popcount-by-position; r14 session 2, measured in
    * PipelineGatesSuite-fenced bit identity with the composed fold).
    */
  private val LANES: Array[Long] = Array.tabulate(256) { v =>
    var acc = 0L
    var j = 0
    while (j < 8) { acc |= ((v >> j) & 1).toLong << (8 * j); j += 1 }
    acc
  }

  /** Ones-count per bit position (0..63) of the (optionally salted) shingle
    * fingerprints, via the byte-sliced lanes. The ±1 vote of the original
    * fold is recovered arithmetically: sum(2·bit − 1) = 2·ones − n, so the
    * sign test `counts(b) >= 0` is exactly `2·ones(b) >= n`.
    */
  private def onesPerBit(arr: ArrayData, salt: Long): Array[Int] = {
    val n = arr.numElements()
    val c1 = new Array[Int](64)
    val acc = new Array[Long](8)
    var pending = 0
    var i = 0
    while (i < n) {
      val h0 = arr.getLong(i)
      val h = if (salt == 0L) h0 else fmix64(h0 ^ salt)
      acc(0) += LANES((h & 0xFF).toInt)
      acc(1) += LANES(((h >>> 8) & 0xFF).toInt)
      acc(2) += LANES(((h >>> 16) & 0xFF).toInt)
      acc(3) += LANES(((h >>> 24) & 0xFF).toInt)
      acc(4) += LANES(((h >>> 32) & 0xFF).toInt)
      acc(5) += LANES(((h >>> 40) & 0xFF).toInt)
      acc(6) += LANES(((h >>> 48) & 0xFF).toInt)
      acc(7) += LANES(((h >>> 56) & 0xFF).toInt)
      pending += 1
      if (pending == 255) { flushLanes(acc, c1); pending = 0 } // 8-bit lane headroom
      i += 1
    }
    if (pending > 0) flushLanes(acc, c1)
    c1
  }

  private def flushLanes(acc: Array[Long], c1: Array[Int]): Unit = {
    var g = 0
    while (g < 8) {
      var v = acc(g)
      var j = 0
      while (j < 8) {
        c1(8 * g + j) += (v & 0xFFL).toInt
        v >>>= 8
        j += 1
      }
      acc(g) = 0L
      g += 1
    }
  }

  /** Sign fold over bits 0..62 (bit 63 is never set — the composed fold
    * reads only 31 bits of the high half). Ties (2·ones == n, including
    * the empty-shingle case n = 0) set the bit, exactly as `counts >= 0`.
    */
  private[functions] def signFold(c1: Array[Int], n: Int): Long = {
    var sig = 0L
    var b = 0
    while (b < 63) {
      if (2 * c1(b) >= n) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Vote + sign over an existing fingerprint array (shared with
    * [[SimHashWideBandsExpr]], which computes the shingle scan once for
    * both signature families).
    */
  private[functions] def signatureFromFps(arr: ArrayData, salt: Long): Long =
    signFold(onesPerBit(arr, salt), arr.numElements())

  def compute(u: UTF8String, w: Int): Long = compute(u, w, 0L)

  def compute(u: UTF8String, w: Int, salt: Long): Long = {
    // distinct shingle fingerprints — same hashes as xxhash64 over the
    // shingle strings (dedup by hash == dedup by string absent a 64-bit
    // collision, which the composed array_distinct-then-hash tolerated
    // identically in the vote multiset)
    signatureFromFps(ShingleFpExpr.compute(u, w), salt)
  }
}

/** Fused wide-band SimHash entries: the 4 (chunk, key) LSH band rows of
  * [[graft.ops.Dedup.simhashNearDuplicatesWide]]'s fused path, carrying
  * both 63-bit signatures, from ONE shingle scan.
  *
  * The composed shape evaluated TWO [[SimHashExpr]] columns per row — and
  * each evaluation re-runs the whole shingle fingerprint scan, the
  * dominant per-row cost (the vote is cheap next to the normalize +
  * tokenize + hash pass). Because the two signature columns live in one
  * collapsed Project, no aliasing protects against the double scan; this
  * expression computes the fingerprints once and both vote folds over
  * them, and is consumed through `explode(...)` so the Generate boundary
  * pins exactly one evaluation per row. Keys are bit-identical to the
  * composed formulation (fenced in PipelineGatesSuite):
  *   chunk 0: sa & 0x7FFFFFFF     chunk 1: sa >> 31
  *   chunk 2: sb & 0x7FFFFFFF     chunk 3: sb >> 31
  * (sa, sb are 63-bit non-negative, so arithmetic >> equals logical >>>).
  */
case class SimHashWideBandsExpr(child: Expression, w: Int, salt: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && w >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_wide_bands requires a string argument and w >= 1, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk", IntegerType, nullable = false),
    StructField("key", LongType, nullable = false),
    StructField("sa", LongType, nullable = false),
    StructField("sb", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "simhash_wide_bands"

  override def nullSafeEval(input: Any): Any =
    SimHashWideBandsExpr.compute(input.asInstanceOf[UTF8String], w, salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashWideBandsExpr.compute($c, $w, ${salt}L)")

  override protected def withNewChildInternal(newChild: Expression): SimHashWideBandsExpr =
    copy(child = newChild)
}

object SimHashWideBandsExpr {

  def simhashWideBands(text: Column, w: Int, salt: Long): Column =
    GraftSqlBridge.column(SimHashWideBandsExpr(GraftSqlBridge.expression(text), w, salt))

  def compute(u: UTF8String, w: Int, salt: Long): ArrayData = {
    val fps = ShingleFpExpr.compute(u, w) // once, for both families
    val sa = SimHashExpr.signatureFromFps(fps, 0L)
    val sb = SimHashExpr.signatureFromFps(fps, salt)
    val out = new Array[Any](4)
    out(0) = new GenericInternalRow(Array[Any](0, sa & 0x7FFFFFFFL, sa, sb))
    out(1) = new GenericInternalRow(Array[Any](1, sa >> 31, sa, sb))
    out(2) = new GenericInternalRow(Array[Any](2, sb & 0x7FFFFFFFL, sa, sb))
    out(3) = new GenericInternalRow(Array[Any](3, sb >> 31, sa, sb))
    new GenericArrayData(out)
  }
}
