package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression for the similarity hot path.
  *
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` evaluates higher-order
  * lambdas per element outside whole-stage codegen — at 64 dims x
  * hundreds of thousands of candidate pairs that interpreter overhead
  * dominates the entire similarity workload. This expression compiles
  * to a tight primitive loop inside codegen instead.
  *
  * Summation is sequential left-to-right in double precision — the
  * exact order the DuckDB oracle (`list_reduce(list_transform(...))`)
  * uses, so results stay bit-identical.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[ArrayType]
  // conforms to the expected Seq[AbstractDataType].
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  /** Element nulls are not expected (embedding vectors are dense);
    * dimensions are paired up to the shorter array.
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All LSH band bits of a vector in ONE compact expression:
  * element b of the result is the r-bit hyperplane signature of band
  * b (bit j = sign(vec . plane[b*r+j])), r = numPlanes / bands.
  *
  * Why an expression and not a composition: building the signature
  * from per-plane `graft_dot` calls puts numPlanes (256 by default)
  * separate dot-product subtrees — each with its own 64-float
  * literal — into the plan. Analysis and codegen of that ~10k-node
  * tree dominate end-to-end latency and the generated method blows
  * past JIT-friendly sizes. Here the plane matrix is ONE reference
  * object and the whole signature is a 3-deep primitive loop
  * (numPlanes x dim multiply-adds) inside whole-stage codegen.
  *
  * `planes` (array<array<float>>, row-major) and `bands` (int) must
  * be foldable — they are captured once, not per row.
  */
case class LshBandBits(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(ArrayType(FloatType)), IntegerType)

  override def dataType: DataType = ArrayType(LongType)

  override def prettyName: String = "graft_lsh_band_bits"

  @transient private lazy val planesMatrix: Array[Array[Float]] = {
    require(second.foldable, "planes must be a literal")
    val ad = second.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toFloatArray())
  }

  @transient private lazy val nBands: Int = {
    require(third.foldable, "bands must be a literal")
    val b = third.eval().asInstanceOf[Int]
    require(b > 0 && planesMatrix.length % b == 0, "bands must divide numPlanes")
    b
  }

  override def nullSafeEval(v: Any, p: Any, b: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val out = LshBandBits.compute(vec, planesMatrix, nBands)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planesMatrix, "float[][]")
    val bandsVal = nBands
    nullSafeCodeGen(ctx, ev, (vecExpr, _, _) => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = graft.plans.LshBandBits.compute($vecExpr, $planesRef, $bandsVal);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LshBandBits {
  /** Shared by interpreted eval and generated code: one tight loop,
    * no per-plane allocation.
    */
  def compute(vec: ArrayData, planes: Array[Array[Float]], bands: Int): Array[Long] = {
    val rows = planes.length / bands
    val dim = vec.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bits = 0L
      var j = 0
      while (j < rows) {
        val plane = planes(b * rows + j)
        val n = math.min(dim, plane.length)
        var s = 0.0
        var d = 0
        while (d < n) {
          s += vec.getFloat(d).toDouble * plane(d).toDouble
          d += 1
        }
        if (s >= 0) bits |= (1L << j)
        j += 1
      }
      out(b) = bits
      b += 1
    }
    out
  }
}

/** The `nProbe` nearest centroids of a vector (cosine order), as ONE
  * codegen'd expression over a plan-constant centroid matrix.
  *
  * Why an expression: scoring via per-centroid literal struct
  * subtrees (`struct(dot(vec, lit(c)) / ..., lit(i))` x nCenters)
  * puts one 64-float literal subtree PER CENTROID in the plan — fine
  * at 16 centroids, but the thousands of cells a 100 TB IVF needs
  * would blow up analysis and codegen exactly the way per-plane LSH
  * signatures did (see [[LshBandBits]]). Here the centroid matrix is
  * ONE reference object; plan size and generated-code size are
  * independent of nCenters.
  *
  * Ranking is by dot(vec, c) / norm(c) — the query-vector norm is a
  * common positive factor and cannot change the order. Ties break to
  * the LARGER centroid id, matching the struct-max/array_sort
  * composition this replaces.
  *
  * `centroids` (array<array<float>>, row-major) and `nProbe` (int)
  * must be foldable — captured once, not per row.
  */
case class NearestCentroids(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(ArrayType(FloatType)), IntegerType)

  override def dataType: DataType = ArrayType(IntegerType)

  override def prettyName: String = "graft_nearest_centroids"

  @transient private lazy val centroidMatrix: Array[Array[Float]] = {
    require(second.foldable, "centroids must be a literal")
    val ad = second.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toFloatArray())
  }

  /** 1 / ||c|| per centroid (0 for a zero centroid — every score 0,
    * ties resolve by id as documented).
    */
  @transient private lazy val invNorms: Array[Double] =
    centroidMatrix.map { c =>
      val n = math.sqrt(c.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
      if (n == 0.0) 0.0 else 1.0 / n
    }

  @transient private lazy val probeCount: Int = {
    require(third.foldable, "nProbe must be a literal")
    val p = third.eval().asInstanceOf[Int]
    require(p >= 1, "nProbe must be >= 1")
    // a tiny corpus can yield fewer centroids than nProbe (ivfCentroids
    // samples FROM the corpus) — probe what exists rather than failing
    math.min(p, centroidMatrix.length)
  }

  override def nullSafeEval(v: Any, c: Any, p: Any): Any = {
    val out = NearestCentroids.compute(
      v.asInstanceOf[ArrayData], centroidMatrix, invNorms, probeCount)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroidMatrix, "float[][]")
    val normsRef = ctx.addReferenceObj("invNorms", invNorms, "double[]")
    val p = probeCount
    nullSafeCodeGen(ctx, ev, (vecExpr, _, _) => {
      val out = ctx.freshName("out")
      s"""
         |int[] $out = graft.plans.NearestCentroids.compute($vecExpr, $centsRef, $normsRef, $p);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NearestCentroids {
  /** Shared by interpreted eval and generated code. One pass scoring
    * (nCenters x dim multiply-adds) + an O(nCenters * nProbe)
    * selection — no per-row sort, no allocation beyond the two small
    * output-sized arrays. Order: score DESC, centroid id DESC on
    * exact ties.
    */
  def compute(vec: ArrayData, centroids: Array[Array[Float]],
      invNorms: Array[Double], nProbe: Int): Array[Int] = {
    val nc = centroids.length
    val dim = vec.numElements()
    // bounded top-nProbe insertion lists (nProbe <= nc)
    val topScore = new Array[Double](nProbe)
    val topId = new Array[Int](nProbe)
    var filled = 0
    var i = 0
    while (i < nc) {
      val c = centroids(i)
      val n = math.min(dim, c.length)
      var s = 0.0
      var d = 0
      while (d < n) {
        s += vec.getFloat(d).toDouble * c(d).toDouble
        d += 1
      }
      val score = s * invNorms(i)
      // insert (score, i) if it beats the current tail
      if (filled < nProbe || score > topScore(filled - 1) ||
          (score == topScore(filled - 1) && i > topId(filled - 1))) {
        var pos = if (filled < nProbe) filled else nProbe - 1
        while (pos > 0 && (score > topScore(pos - 1) ||
            (score == topScore(pos - 1) && i > topId(pos - 1)))) {
          topScore(pos) = topScore(pos - 1)
          topId(pos) = topId(pos - 1)
          pos -= 1
        }
        topScore(pos) = score
        topId(pos) = i
        if (filled < nProbe) filled += 1
      }
      i += 1
    }
    java.util.Arrays.copyOf(topId, filled)
  }
}

/** Seeded polynomial rolling hash over a string's code points:
  * h = (h*31 + codepoint) mod 1e9+7, starting from `seed` — the
  * oracle-replayable hash family ([[graft.functions.Hashing]]) as a
  * tight codegen'd loop. The Column composition it replaces
  * (`aggregate(split(s, ""), ...)`) evaluates a higher-order lambda
  * PER CHARACTER outside codegen — on sketch queries hashing every
  * n-gram 32 times, that interpreter overhead dominated the whole
  * query. Code-point iteration matches DuckDB's
  * `string_split(s, '')` + `ord()` exactly (surrogate pairs hash as
  * one code point).
  */
case class PolyHash(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(org.apache.spark.sql.types.StringType, LongType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_poly_hash"

  override def nullSafeEval(s: Any, seed: Any): Any =
    PolyHash.compute(s.toString, seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, seed) =>
      s"${ev.value} = graft.plans.PolyHash.compute($s.toString(), $seed);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PolyHash {
  val Mod: Long = 1000000007L

  def compute(s: String, seed: Long): Long = {
    var h = seed % Mod
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** Dot product of two int8-quantized vectors (array<int> codes),
  * returned as the exact integer sum of code products — multiply by
  * the two scales for the approximate float dot. Integer
  * multiply-adds are the whole point of int8 ANN serving (no
  * dequantize materialization, SIMD-friendly); like
  * [[DotProductFloat]] this must be one codegen'd loop, not an
  * interpreted higher-order-function chain.
  */
case class DotProductInt8(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(IntegerType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dot_int8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (long) $a.getInt($i) * (long) $b.getInt($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-vector symmetric int8 quantization as ONE codegen'd pass:
  * struct(scale: double, q: array<int>), scale = max|x| / 127 (1 for
  * a zero vector), q[i] = floor(x[i]/scale + 0.5). The Column
  * composition this replaces (`transform(vec, x -> floor(x/scale +
  * 0.5))` with `scale` a derived expression) captured the
  * array_max(transform(vec, abs)) subtree INSIDE the per-element
  * lambda, so Catalyst re-evaluated the max over the whole vector
  * for every element — O(d^2) per row, ~590k multiply-compares for a
  * 768-dim vector, on the path a 100 TB corpus runs per row before
  * ANN serving. Here the max is one pass and the codes a second —
  * O(d), inside whole-stage codegen.
  *
  * Arithmetic is bit-identical to the replaced composition (and the
  * DuckDB oracle): the max runs over double-widened floats,
  * floor(x/scale + 0.5) is half-toward-+inf — engine-portable where
  * SQL round() half-cases are not. Dirty elements follow the same
  * composition's semantics: a null element is skipped by the max
  * (array_max ignores nulls) and stays null in `q` (the transform
  * lambda propagates it); a NaN element is GREATEST in the max
  * (Spark's float ordering), making scale NaN and every code
  * floor(NaN).toInt = 0. One intentional divergence, documented
  * here: an all-null or empty vector gets scale 1.0 and all-null
  * codes where the composition's null array_max would null the
  * scale — the struct keeps a non-nullable scale field.
  */
case class QuantizeInt8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("scale", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("q", ArrayType(IntegerType, containsNull = true), nullable = false)))

  override def prettyName: String = "graft_quantize_int8"

  override def nullSafeEval(v: Any): Any =
    QuantizeInt8.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.QuantizeInt8.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8 {
  /** Shared by interpreted eval and generated code: one max pass, one
    * quantize pass, no per-element re-evaluation of the scale.
    */
  def compute(vec: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val a = Math.abs(vec.getFloat(i).toDouble)
        // NaN wins (Spark float ordering: NaN > everything); once
        // captured it sticks — later `a > NaN` is always false
        if (java.lang.Double.isNaN(a) || a > maxAbs) maxAbs = a
      }
      i += 1
    }
    val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
    val q = new Array[Any](n)
    i = 0
    while (i < n) {
      q(i) = if (vec.isNullAt(i)) null
        else Math.floor(vec.getFloat(i).toDouble / scale + 0.5).toInt
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, new org.apache.spark.sql.catalyst.util.GenericArrayData(q)))
  }
}

/** Word n-grams of lowercased whitespace-tokenized text as ONE
  * codegen'd expression: semantically identical to the Column
  * composition `transform(sequence(...), i -> concat_ws(" ",
  * slice(split(trim(lower(text)), "\s+"), i, n)))` it replaces, but
  * that chain evaluates THREE interpreted higher-order lambdas and a
  * per-gram array slice+join allocation outside whole-stage codegen
  * — on corpus-wide gram explodes (dedup sketches, contamination
  * scans, repetition stats) the interpreter overhead dominated the
  * entire query, the same failure mode [[LshBandBits]] fixed for
  * hyperplane signatures. Documents shorter than n tokens yield an
  * empty array.
  */
case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(org.apache.spark.sql.types.StringType, IntegerType)

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def prettyName: String = "graft_word_ngrams"

  override def nullSafeEval(s: Any, n: Any): Any =
    WordNgrams.compute(s.toString, n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.plans.WordNgrams.compute($s.toString(), $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordNgrams {

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** One pass: lowercase+trim, split on whitespace runs, emit the
    * space-joined n-grams. Matches `split(trim(lower(text)), "\s+")`
    * exactly — including the locale: Spark's `lower()` non-ASCII
    * path is `String.toLowerCase()` under the DEFAULT locale, so
    * this uses the same call (Locale.ROOT would silently diverge
    * from `TextFunctions.tokens` on locale-sensitive codepoints).
    * Two further Spark-vs-Java divergences matter for crawl text
    * with leading/trailing tabs/newlines: Spark `trim` strips ONLY
    * the space character (0x20) where Java's String.trim strips
    * every char <= U+0020, and Spark `split` runs with limit -1
    * (trailing empty tokens kept) where Java's default drops them —
    * so trimming and splitting here replicate the Spark calls, not
    * the Java conveniences, and the n-grams stay bit-identical to
    * `TextFunctions.tokens` and the oracle replays on ANY input.
    */
  def compute(text: String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    require(n >= 1, "n must be >= 1")
    val lowered = text.toLowerCase()
    var s = 0
    var e = lowered.length
    while (s < e && lowered.charAt(s) == ' ') s += 1
    while (e > s && lowered.charAt(e - 1) == ' ') e -= 1
    val toks = Whitespace.split(lowered.substring(s, e), -1)
    val count = toks.length - n + 1
    if (toks.length < n) {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}

/** Product-quantization encode (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): the vector is split
  * into m = codebooks.length contiguous subspaces of
  * dsub = codebooks(j)(c).length dims each, and element j of the
  * result is the id of subspace j's nearest codeword by squared L2
  * distance — so a d-dim float vector (4d bytes) stores as m small
  * ints, the 100 TB vector-corpus compression story (d=64, m=8 is
  * 32x before int-width packing).
  *
  * Decision procedure (what the oracle replays): per subspace,
  * distances accumulate in double, element order left-to-right,
  * (x - c)^2 per element; ties break to the SMALLER codeword id
  * (strict `<` to replace). A vector shorter than (j+1)*dsub treats
  * missing elements as absent pairs (distance contribution of the
  * codeword element alone is NOT added — pairing stops at the
  * shorter length, like [[DotProductFloat]]).
  *
  * Why an expression: the composition would be m x ksub literal
  * dot-product subtrees — the exact plan blowup [[NearestCentroids]]
  * exists to avoid, squared. The codebook tensor is ONE reference
  * object; plan and generated-code size are independent of m x ksub.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(ArrayType(ArrayType(FloatType))))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val codebooks: Array[Array[Array[Float]]] = {
    require(right.foldable, "codebooks must be a literal")
    val ad = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { j =>
      val sub = ad.getArray(j)
      Array.tabulate(sub.numElements())(c => sub.getArray(c).toFloatArray())
    }
  }

  override def nullSafeEval(v: Any, cb: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      PqEncode.compute(v.asInstanceOf[ArrayData], codebooks))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, (vecExpr, _) => {
      val out = ctx.freshName("out")
      s"""
         |int[] $out = graft.plans.PqEncode.compute($vecExpr, $cbRef);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  /** Shared by interpreted eval and generated code: m x ksub x dsub
    * multiply-adds, no allocation beyond the m-int output.
    */
  def compute(vec: ArrayData, codebooks: Array[Array[Array[Float]]]): Array[Int] = {
    val m = codebooks.length
    val dim = vec.numElements()
    val out = new Array[Int](m)
    var j = 0
    var base = 0
    while (j < m) {
      val book = codebooks(j)
      val dsub = if (book.length == 0) 0 else book(0).length
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        val n = math.min(math.max(dim - base, 0), cw.length)
        var s = 0.0
        var d = 0
        while (d < n) {
          val diff = vec.getFloat(base + d).toDouble - cw(d).toDouble
          s += diff * diff
          d += 1
        }
        if (s < bestDist) { bestDist = s; best = c }
        c += 1
      }
      out(j) = best
      base += dsub
      j += 1
    }
    out
  }
}

/** Asymmetric-distance (ADC) score of a query float vector against a
  * PQ code array: dot(query, reconstruction), where the
  * reconstruction is the concatenation of the coded codewords —
  * computed WITHOUT materializing it, in strict global element order
  * left-to-right (one running double across all m subspaces), so the
  * oracle can replay it as a single sequential `list_reduce` dot
  * against the flattened codeword list. The corpus side of an ADC
  * scan carries only its m-int codes; floats never re-join.
  */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(IntegerType),
    ArrayType(ArrayType(ArrayType(FloatType))))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc"

  @transient private lazy val codebooks: Array[Array[Array[Float]]] = {
    require(third.foldable, "codebooks must be a literal")
    val ad = third.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { j =>
      val sub = ad.getArray(j)
      Array.tabulate(sub.numElements())(c => sub.getArray(c).toFloatArray())
    }
  }

  override def nullSafeEval(q: Any, codes: Any, cb: Any): Any =
    PqAdc.compute(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, (qExpr, codesExpr, _) =>
      s"${ev.value} = graft.plans.PqAdc.compute($qExpr, $codesExpr, $cbRef);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqAdc {
  /** One running double over the concatenated codewords, pairing up
    * to the shorter of (query, reconstruction) like [[DotProductFloat]].
    */
  def compute(q: ArrayData, codes: ArrayData, codebooks: Array[Array[Array[Float]]]): Double = {
    val m = math.min(codes.numElements(), codebooks.length)
    val qn = q.numElements()
    var sum = 0.0
    var j = 0
    var base = 0
    while (j < m) {
      val book = codebooks(j)
      val cw = book(math.min(math.max(codes.getInt(j), 0), book.length - 1))
      val n = math.min(math.max(qn - base, 0), cw.length)
      var d = 0
      while (d < n) {
        sum += q.getFloat(base + d).toDouble * cw(d).toDouble
        d += 1
      }
      base += cw.length
      j += 1
    }
    sum
  }
}

object VectorExpressions {

  def register(spark: SparkSession): Unit = GraftFunctions.register(spark)

  /** Codegen'd float-vector dot product (double result). The session
    * owning the calling DataFrame must have called [[register]].
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Per-band LSH signature bits (array<long>, one element per
    * band). `planes` is captured as a plan constant.
    */
  def lshBandBits(vec: Column, planes: Array[Array[Float]], bands: Int): Column =
    call_function("graft_lsh_band_bits", vec,
      org.apache.spark.sql.functions.typedLit(planes), lit(bands))

  /** Ids of the `nProbe` nearest centroids (cosine DESC, id DESC on
    * ties), array<int>. `centroids` is captured as a plan constant —
    * plan size does not grow with nCenters.
    */
  def nearestCentroids(vec: Column, centroids: Array[Array[Float]], nProbe: Int): Column =
    call_function("graft_nearest_centroids", vec,
      org.apache.spark.sql.functions.typedLit(centroids), lit(nProbe))

  /** Distributed Bloom build over a 64-bit hash column (aggregate:
    * array<long> of numBits/64 words).
    */
  def bloomAgg(hash: Column, numBits: Int, numHashes: Int): Column =
    call_function("graft_bloom_agg", hash, lit(numBits), lit(numHashes))

  /** Bloom membership probe; `words` is captured as a plan constant —
    * plan size independent of filter size.
    */
  def bloomContains(hash: Column, words: Array[Long], numHashes: Int): Column =
    call_function("graft_bloom_contains", hash,
      org.apache.spark.sql.functions.typedLit(words), lit(numHashes))

  /** Sharded Bloom probe: shard = pmod(hash, wordsPerShard.length),
    * probe that shard's words only. Each shard's word array is a
    * bounded constant — the >10^9-key story for [[bloomContains]].
    */
  def bloomContainsSharded(
      hash: Column, wordsPerShard: Array[Array[Long]], numHashes: Int): Column =
    call_function("graft_bloom_contains_sharded", hash,
      org.apache.spark.sql.functions.typedLit(wordsPerShard), lit(numHashes))

  /** PQ codes of a float vector (array<int>, one codeword id per
    * subspace). The codebook tensor is captured as a plan constant —
    * plan size independent of m x ksub.
    */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    call_function("graft_pq_encode", vec,
      org.apache.spark.sql.functions.typedLit(codebooks))

  /** ADC score: dot(query, PQ reconstruction of `codes`), strict
    * global element order (oracle-replayable against the flattened
    * codeword list).
    */
  def pqAdc(qvec: Column, codes: Column, codebooks: Array[Array[Array[Float]]]): Column =
    call_function("graft_pq_adc", qvec, codes,
      org.apache.spark.sql.functions.typedLit(codebooks))
}

/** The `spark.sql.extensions` injection path: add
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or `builder.withExtensions(new GraftExtensions)`) and every
  * graft expression is available in SQL and `call_function` from
  * session construction — no runtime registration call needed.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(ext.injectFunction)
    // maintenance SQL (OPTIMIZE / VACUUM / DESCRIBE HISTORY|DETAIL /
    // RESTORE / ADD|DROP CONSTRAINT) — everything else delegates
    ext.injectParser((session, parser) =>
      new graft.sources.GraftSqlParser(session, parser))
    // metadata aggregate pushdown: global COUNT/MIN/MAX over a graft
    // relation answers from the manifest (see MetaAggPushdown)
    ext.injectPlannerStrategy(session =>
      new graft.sources.GraftMetaAggStrategy(session))
    // materialized-view answering: a grouped aggregate a registered
    // fresh incremental view covers rewrites to the view scan. MUST
    // be injected before GraftScanRewrite — within a pass the
    // aggregate has to match while its base relation is still the
    // addressable V1 shape (the view relation this emits is then
    // lazified by the scan rewrite below in the same pass)
    ext.injectOptimizerRule(session =>
      new graft.sources.GraftMvRewrite(session))
    // lazy manifest-skipping scans on the catalog/format("graft")
    // surface: nested-predicate pruning + native dynamic partition
    // pruning on name-addressed joins. MUST ride this channel — the
    // rule has to run before Spark's PartitionPruning batch, which
    // experimental.extraOptimizations cannot (see GraftScanRewrite)
    ext.injectOptimizerRule(session =>
      new graft.sources.GraftScanRewrite(session))
    // corpus statements whose pipeline is inherently eager (DEDUP
    // METHOD MINHASH) parse to a DeferredCorpusPlan leaf; this plans
    // it so the pipeline runs at execution, never at parse/EXPLAIN
    ext.injectPlannerStrategy(_ => new DeferredCorpusStrategy)
  }
}

/** Idempotently registers every graft custom expression in a
  * session's function registry. Works on any classic (JVM)
  * SparkSession, including one the caller created without
  * extensions; [[graft.Tables.load]] calls this, so every query
  * built on the test tables has the functions available.
  */
object GraftFunctions {

  /** (identifier, info, builder) triple per function — shared by the
    * runtime registrar and the extensions injector.
    */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "graft_dot"),
      children => DotProductFloat(children(0), children(1))),
    (FunctionIdentifier("graft_text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "graft_text_stats"),
      children => TextStats(children(0), children(1))),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKPairs].getName, "graft_topk"),
      children => TopKPairs(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_lsh_band_bits"),
      new ExpressionInfo(classOf[LshBandBits].getName, "graft_lsh_band_bits"),
      children => LshBandBits(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      children => PolyHash(children(0), children(1))),
    (FunctionIdentifier("graft_nearest_centroids"),
      new ExpressionInfo(classOf[NearestCentroids].getName, "graft_nearest_centroids"),
      children => NearestCentroids(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom_agg"),
      children => BloomAgg(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
      children => BloomContains(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_bloom_contains_sharded"),
      new ExpressionInfo(classOf[BloomContainsSharded].getName, "graft_bloom_contains_sharded"),
      children => BloomContainsSharded(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_bloom_contains_col"),
      new ExpressionInfo(classOf[BloomContainsColumn].getName, "graft_bloom_contains_col"),
      children => BloomContainsColumn(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_word_ngrams"),
      children => WordNgrams(children(0), children(1))),
    (FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
      children => HilbertIndex(children(0), children(1))),
    (FunctionIdentifier("graft_mix64"),
      new ExpressionInfo(classOf[Mix64].getName, "graft_mix64"),
      children => Mix64(children(0))),
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      children => NfcNormalize(children(0))),
    (FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHittersAgg].getName, "graft_heavy_hitters"),
      children => HeavyHittersAgg(children(0), children(1))),
    (FunctionIdentifier("graft_dot_int8"),
      new ExpressionInfo(classOf[DotProductInt8].getName, "graft_dot_int8"),
      children => DotProductInt8(children(0), children(1))),
    (FunctionIdentifier("graft_quantize_int8"),
      new ExpressionInfo(classOf[QuantizeInt8].getName, "graft_quantize_int8"),
      children => QuantizeInt8(children(0))),
    (FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      children => PqEncode(children(0), children(1))),
    (FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "graft_pq_adc"),
      children => PqAdc(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_bpe_encode"),
      new ExpressionInfo(classOf[BpeEncodeTokens].getName, "graft_bpe_encode"),
      children => BpeEncodeTokens(children(0), children(1))))
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    descriptions.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) {
        registry.registerFunction(id, info, builder)
      }
    }
  }
}
