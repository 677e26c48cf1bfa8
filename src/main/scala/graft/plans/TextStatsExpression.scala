package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.util.regex.Pattern

/** Single-pass text statistics.
  *
  * The text-quality/lang-id surface needs token count, word-list
  * hits, punctuation count and digit count per document. Composed
  * from `split`/`filter`/`regexp_replace` those re-tokenize the text
  * once PER OUTPUT COLUMN (the q_quality_score projection repeated
  * `split(trim(lower(text)))` twelve times, with the stopword lambda
  * interpreted per element). This expression computes all counts in
  * ONE pass and is deterministic, so whole-stage codegen's common
  * subexpression elimination evaluates it once per row however many
  * derived columns reference it.
  *
  * Semantics mirror the composed-expression versions exactly (and
  * therefore the DuckDB oracles):
  *  - trim = strip leading/trailing spaces (0x20), like Spark/DuckDB
  *    `trim`;
  *  - tokens = Java `split("\\s+", -1)` of the lowercased trimmed
  *    text (identical engine to Spark's `split`);
  *  - n_tokens = 0 for whitespace-only text;
  *  - hits = tokens contained in the literal `words` array (child 2);
  *  - punct = chars in .,!?;:'"()- ; digit = 0-9; chars counted on
  *    the ORIGINAL text as code points, matching `length`.
  */
case class TextStats(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = TextStats.schema

  override def inputTypes = Seq(StringType, ArrayType(StringType))

  override def prettyName: String = "graft_text_stats"

  @transient private lazy val compute: TextStatsCompute = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val words = new java.util.HashSet[String]()
    (0 until arr.numElements()).foreach(i => words.add(arr.getUTF8String(i).toString))
    new TextStatsCompute(words)
  }

  override def nullSafeEval(text: Any, words: Any): Any =
    compute.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStatsCompute", compute,
      classOf[TextStatsCompute].getName)
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"${ev.value} = $ref.compute($text);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_hits", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false)))
}

/** The per-row worker: one String materialization, one regex split,
  * one code-point scan. Instantiated once per expression instance
  * (word set prebuilt), shared across rows.
  */
final class TextStatsCompute(words: java.util.HashSet[String]) extends Serializable {

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    var punct = 0L
    var digit = 0L
    var chars = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      chars += 1
      if (cp < 128) {
        val c = cp.toChar
        if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' ||
          c == ':' || c == '\'' || c == '"' || c == '(' || c == ')' ||
          c == '-') punct += 1
        else if (c >= '0' && c <= '9') digit += 1
      }
      i += Character.charCount(cp)
    }
    val trimmed = TextStatsCompute.trimSpaces(s)
    var nTokens = 0L
    var hits = 0L
    if (trimmed.nonEmpty) {
      val toks = TextStatsCompute.WS.split(trimmed.toLowerCase(java.util.Locale.ROOT), -1)
      nTokens = toks.length.toLong
      var j = 0
      while (j < toks.length) {
        if (words.contains(toks(j))) hits += 1
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](chars, nTokens, hits, punct, digit))
  }
}

object TextStatsCompute {
  private val WS = Pattern.compile("\\s+")

  /** Spark/DuckDB `trim`: spaces (0x20) only. */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    if (from == 0 && to == s.length) s else s.substring(from, to)
  }
}
