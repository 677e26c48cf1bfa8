package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D point on the order-16 curve (inputs
  * are 16-bit buckets, output ∈ [0, 2^32)) — the locality-preserving
  * alternative to the Morton z-value for OPTIMIZE clustering
  * ([[graft.sources.DataSkipping.zorderTable]] `curve = "hilbert"`).
  * Morton's bit-interleave takes long diagonal jumps at power-of-two
  * boundaries (the top-right cell of one quadrant neighbors the
  * bottom-left of the next), so a file of consecutive z-values can
  * span a wide rectangle in (x, y) space; the Hilbert curve's
  * recursive quadrant rotation keeps EVERY consecutive pair of cells
  * adjacent, which tightens per-file min/max envelopes and prunes
  * more files for 2-D range predicates — the reason Delta's
  * clustering moved from Z-ORDER toward Hilbert.
  *
  * The classic iterative xy→d transform (Warren, Hacker's Delight):
  * 16 rounds of quadrant classification + rotation. A Column
  * composition of the SAME rounds would reference each intermediate
  * (x, y) several times per round — an exponentially growing
  * expression tree Catalyst cannot flatten safely — so this is the
  * §3-ladder expression rung: one imperative loop, whole-stage
  * codegen'd.
  *
  * The curve choice only affects LAYOUT, never results — gates
  * compare content and plan shape, not the index arithmetic.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType, LongType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(xa: Any, ya: Any): Any = {
    var x = xa.asInstanceOf[Long] & 0xFFFFL
    var y = ya.asInstanceOf[Long] & 0xFFFFL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate quadrant so the sub-curve orients correctly
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $xa & 0xFFFFL;
         |long $y = $ya & 0xFFFFL;
         |long $d = 0L;
         |for (long $s = 1L << 15; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** splitmix64 finalizer (Steele et al., JDK SplittableRandom): the
  * avalanche step that turns a structured 64-bit input into
  * uniformly-mixed bits. Needed because the oracle-replayable
  * polynomial hashes are affine in their inputs — fine for equality
  * bucketing, USELESS for sketches that read bit positions (HLL's
  * rho). Java long arithmetic wraps natively; Spark 4's ANSI-mode
  * Column `*` would throw on the deliberate overflow, hence an
  * expression instead of a composition. The DuckDB oracle replays
  * the exact wrap via HUGEINT `% 2^64` arithmetic.
  */
case class Mix64(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_mix64"

  override def nullSafeEval(v: Any): Any =
    Mix64.mix(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.Mix64.mix($v);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): Mix64 =
    copy(child = newChild)
}

object Mix64 {
  def mix(z0: Long): Long = {
    var z = (z0 ^ (z0 >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** Unicode NFC normalization (canonical composition) — the
  * text-canonicalization pass exact dedup needs BEFORE hashing:
  * "Café" with a precomposed U+00E9 and "Café" with e + combining
  * U+0301 are byte-different, render identically, and defeat every
  * hash-equality operator in the dedup family. Spark has no
  * built-in normalizer; this wraps `java.text.Normalizer` (ICU-free,
  * in the JDK) as a codegen'd expression so the pass rides inside
  * whole-stage codegen like the rest of the text chain. The DuckDB
  * oracle replays with `nfc_normalize` — both implement Unicode
  * canonical composition, so outputs are byte-identical.
  */
case class NfcNormalize(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(org.apache.spark.sql.types.StringType)

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(v: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(v.toString,
        java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($v.toString(),
         |    java.text.Normalizer.Form.NFC));""".stripMargin)

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): NfcNormalize =
    copy(child = newChild)
}
