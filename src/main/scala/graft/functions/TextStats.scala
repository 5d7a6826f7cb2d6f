package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass fused text statistics: a native Catalyst expression computing
  * every per-character counter `TextAnalysis.qualityColumns` needs in a
  * SINGLE scan of the document, replacing three `translate` passes, a
  * regex whitespace split and a regex stopword count (five independent
  * scans, two of them java.util.regex) with one branchy loop and zero
  * regex. Stays inside whole-stage codegen via `defineCodeGen` (the
  * generated code is one static call per row), so the scan remains
  * pipeline-fused with the parquet reader at 100 TB.
  *
  * Each field replicates the EXACT semantics of the Spark SQL expression
  * it replaces (property-fenced in TextStatsSuite against the original
  * formulations, and driver-checked against the DuckDB oracle):
  *
  *   - n_chars  = length(text)                      (code points)
  *   - n_punct  = length - length(translate(text, PUNCT, ''))
  *   - n_digit  = length - length(translate(text, '0'..'9', ''))
  *   - n_upper  = length - length(translate(text, 'A'..'Z', ''))
  *   - n_tokens = size(split(trim(text), '\s+'))    (trim = 0x20 only;
  *                leading/trailing non-space whitespace yields the same
  *                empty segments Java's Pattern.split(-1) produces)
  *   - n_subwords = regexp_count(text, '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]')
  *                — the BPE-ish pre-tokenizer piece count: each unicode
  *                letter run (\p{L} = categories L*) counts 1, each
  *                number run (\p{N} = Nd|Nl|No) counts 1, every other
  *                non-ASCII-whitespace code point counts 1 on its own
  *                (\s is ASCII in both java.util.regex's default and
  *                RE2, so the two engines agree here)
  *   - stop_hits = regexp_count(lower(text), '\b(the|a|of|and|to|in|is|
  *                that|it|for)\b') — every alternative is \b-fenced, so a
  *                match is exactly a maximal [a-zA-Z0-9_] run equal to a
  *                stopword; the scan compares runs instead of running the
  *                NFA. Word chars are ASCII, i.e. RE2/DuckDB \b semantics
  *                — java.util.regex's \b is unicode-aware (the JDK \b/\w
  *                inconsistency) and silently disagreed with the DuckDB
  *                oracle on stopwords adjacent to non-ASCII letters; the
  *                scan fixes that (fenced in TextStatsSuite). Lowering
  *                matches Spark's Lower: ASCII fast path, else
  *                String.toLowerCase(Locale.ROOT).
  */
case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = TextStatsExpr.schema
  override def prettyName: String = "text_stats"

  override def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false)))

  /** Column wrapper: `text_stats(text)` as a struct column. */
  def textStats(text: Column): Column =
    GraftSqlBridge.column(TextStatsExpr(GraftSqlBridge.expression(text)))

  // ASCII punctuation class used by qualityColumns' translate pass.
  private val isPunct: Array[Boolean] = {
    val t = new Array[Boolean](128)
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".foreach(c => t(c) = true)
    t
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_' ||
      (c >= 'A' && c <= 'Z')

  // Maximal word-char run [from, from+len) equals one of the ten stopwords?
  private def isStopword(s: String, from: Int, len: Int): Boolean = {
    @inline def c(i: Int) = s.charAt(from + i)
    len match {
      case 1 => c(0) == 'a'
      case 2 =>
        val c0 = c(0); val c1 = c(1)
        (c0 == 'o' && c1 == 'f') || (c0 == 't' && c1 == 'o') ||
        (c0 == 'i' && (c1 == 'n' || c1 == 's' || c1 == 't'))
      case 3 =>
        val c0 = c(0); val c1 = c(1); val c2 = c(2)
        (c0 == 't' && c1 == 'h' && c2 == 'e') ||
        (c0 == 'a' && c1 == 'n' && c2 == 'd') ||
        (c0 == 'f' && c1 == 'o' && c2 == 'r')
      case 4 =>
        c(0) == 't' && c(1) == 'h' && c(2) == 'a' && c(3) == 't'
      case _ => false
    }
  }

  /** Single pass over the document; called once per row from generated
    * code. Allocation-free except the lowercase copy, and that only when
    * the text contains uppercase or non-ASCII characters.
    */
  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length

    var nChars = 0; var nPunct = 0; var nDigit = 0; var nUpper = 0
    var nSub = 0
    var allAsciiLower = true
    var prevCls = 0 // 1 = letter run, 2 = number run, 0 = neither
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var cp: Int = c
      var width = 1
      if (Character.isHighSurrogate(c) && i + 1 < n &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
        // surrogate pair = one code point, like length()/translate()
        cp = Character.toCodePoint(c, s.charAt(i + 1))
        width = 2
      }
      nChars += 1
      if (cp < 128) {
        val a = cp.toChar
        if (isPunct(a)) nPunct += 1
        else if (a >= '0' && a <= '9') nDigit += 1
        else if (a >= 'A' && a <= 'Z') { nUpper += 1; allAsciiLower = false }
      } else allAsciiLower = false
      // subword pieces: letter runs / number runs / single non-ws marks
      val cls =
        if (Character.isLetter(cp)) 1
        else {
          val t = Character.getType(cp)
          if (t == Character.DECIMAL_DIGIT_NUMBER ||
              t == Character.LETTER_NUMBER ||
              t == Character.OTHER_NUMBER) 2
          else 0
        }
      if (cls == 0) {
        if (!(cp < 128 && isWs(cp.toChar))) nSub += 1
      } else if (cls != prevCls) nSub += 1
      prevCls = cls
      i += width
    }

    // size(split(trim(text), "\\s+")): trim strips 0x20 only; then the
    // segment count is 1 + (maximal \s+ runs), which reproduces Pattern
    // .split(-1)'s leading/trailing empty segments for \t/\n edges.
    var lo = 0; var hi = n
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    var nTokens = 1
    var inRun = false
    var j = lo
    while (j < hi) {
      val ws = isWs(s.charAt(j))
      if (ws && !inRun) nTokens += 1
      inRun = ws
      j += 1
    }

    // stopword hits on lower(text)
    val lower = if (allAsciiLower) s else s.toLowerCase(java.util.Locale.ROOT)
    val m = lower.length
    var hits = 0
    var runStart = -1
    var k = 0
    while (k <= m) {
      val w = k < m && isWordChar(lower.charAt(k))
      if (w) { if (runStart < 0) runStart = k }
      else if (runStart >= 0) {
        if (isStopword(lower, runStart, k - runStart)) hits += 1
        runStart = -1
      }
      k += 1
    }

    new GenericInternalRow(Array[Any](nChars, nPunct, nDigit, nUpper, nTokens, nSub, hits))
  }
}
