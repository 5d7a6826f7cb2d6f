package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-shingle fingerprints: the SORTED DISTINCT xxhash64 values of
  * the w-word shingles of the normalized text, in one pass.
  *
  * Replaces the composed pipeline
  *   array_distinct(transform(shingles(text, w), s => xxhash64(s)))
  * (regex normalize, split, per-position `concat_ws(slice(...))` through
  * THREE interpreted higher-order functions, then a per-element hash
  * lambda) with a single scan: after whitespace-squeeze + lowercase, every
  * shingle string IS a byte-substring of the normalized text (words are
  * single-space separated), so each fingerprint is XXH64 over that byte
  * range — BIT-IDENTICAL to xxhash64 of the concatenated shingle string
  * (fenced in PipelineGatesSuite), with zero per-position allocation.
  *
  * The output is sorted, which [[SortedJaccardExpr]] exploits to verify
  * candidate pairs with an allocation-free merge instead of
  * array_intersect's per-pair hash set — the hot loop of MinHash-LSH
  * verification (24.7M pairs on the 100x corpus).
  */
case class ShingleFpExpr(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && w >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_fp requires a string argument and w >= 1, got ${child.dataType.sql}, w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_fp"

  override def nullSafeEval(input: Any): Any =
    ShingleFpExpr.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleFpExpr.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): ShingleFpExpr =
    copy(child = newChild)
}

object ShingleFpExpr {

  def shingleFp(text: Column, w: Int): Column =
    GraftSqlBridge.column(ShingleFpExpr(GraftSqlBridge.expression(text), w))

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** One pass per row from generated code. Normalization is the same
    * trim(0x20)/\s+-squeeze/lower chain as [[NormFingerprintExpr]].
    */
  def compute(u: UTF8String, w: Int): ArrayData = {
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

    // word boundaries: split-on-single-space with empty edge tokens kept
    // (split(s, " ", -1) semantics — squeeze guarantees no double spaces)
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

    // positions 0 .. max(nw - w, 0): shingle = bytes[start(i), end(min(i+w-1, nw-1)))
    val count = math.max(nw - w, 0) + 1
    val out = new Array[Long](count)
    var p = 0
    while (p < count) {
      val from = starts(p)
      val to = ends(math.min(p + w - 1, nw - 1))
      out(p) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, to - from, 42L)
      p += 1
    }
    java.util.Arrays.sort(out)
    // dedup in place (array_distinct semantics over the hash values)
    var m = 0
    var q = 0
    while (q < count) {
      if (m == 0 || out(q) != out(m - 1)) { out(m) = out(q); m += 1 }
      q += 1
    }
    new GenericArrayData(if (m == count) out else java.util.Arrays.copyOf(out, m))
  }
}

/** Jaccard similarity of two SORTED DISTINCT long arrays via linear merge —
  * no per-pair hash set, no intermediate arrays. Bit-identical to
  * `size(array_intersect(a,b)) / size(array_union(a,b))` cast to double on
  * sorted-distinct inputs. NULL if either input is null or the union is
  * empty (both arrays empty).
  */
case class SortedJaccardExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard requires two array<bigint> arguments, got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedJaccardExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.SortedJaccardExpr.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedJaccardExpr =
    copy(left = newLeft, right = newRight)
}

object SortedJaccardExpr {

  def sortedJaccard(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedJaccardExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) null
    else java.lang.Double.valueOf(inter.toDouble / union.toDouble)
  }
}

/** Per-document MinHash band buckets in one pass: for each of `bands*rows`
  * seeds, the minimum over the shingle fingerprints of
  * `xxhash64(fp, seed)` (replicated exactly: h = hashInt(seed,
  * hashLong(fp, 42)) — Spark's multi-argument xxhash64 chains child
  * hashes), then per band the xxhash64 (seed 42) of the
  * comma-joined decimal minima — byte-identical to
  * `xxhash64(concat_ws(",", __m...))`. Replaces the 100M-row
  * explode + 32-column groupBy-min + concat stage with a narrow map:
  * the signature never leaves the row, and the only shuffle left in
  * candidate generation is the slim (doc, band, bucket) exchange.
  */
case class MinHashBandsExpr(child: Expression, bands: Int, rows: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bands >= 1 && rows >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<bigint>, bands/rows >= 1; got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashBandsExpr.compute(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashBandsExpr.compute($c, $bands, $rows)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

object MinHashBandsExpr {

  def minhashBands(sh: Column, bands: Int, rows: Int): Column =
    GraftSqlBridge.column(MinHashBandsExpr(GraftSqlBridge.expression(sh), bands, rows))

  def compute(arr: ArrayData, bands: Int, rows: Int): ArrayData = {
    val k = bands * rows
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val base = XXH64.hashLong(arr.getLong(i), 42L)
      var s = 0
      while (s < k) {
        val h = XXH64.hashInt(s, base)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    val sb = new java.lang.StringBuilder(rows * 21)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append(',')
        sb.append(mins(b * rows + r))
        r += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out(b) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      b += 1
    }
    new GenericArrayData(out)
  }
}
