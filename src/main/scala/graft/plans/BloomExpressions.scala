package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bit-twiddling shared by the Bloom build aggregate and the
  * membership expression (and by interpreted eval and generated
  * code). Index derivation is Kirsch-Mitzenmacher double hashing
  * over an already-64-bit input hash: idx_i = (h1 + i*h2) mod m with
  * h2 forced odd — k high-quality probes from one hash, no
  * per-probe rehash of the underlying bytes.
  */
object BloomFilterOps {

  private final val Mix = 0x9E3779B97F4A7C15L // golden-ratio odd constant

  def setBits(words: Array[Long], numHashes: Int, hash: Long): Unit = {
    val m = words.length.toLong * 64L
    val h2 = hash * Mix | 1L
    var i = 0
    while (i < numHashes) {
      val idx = ((hash + i * h2) & Long.MaxValue) % m
      words((idx >>> 6).toInt) |= 1L << (idx & 63L)
      i += 1
    }
  }

  def contains(words: Array[Long], numHashes: Int, hash: Long): Boolean = {
    val m = words.length.toLong * 64L
    val h2 = hash * Mix | 1L
    var i = 0
    while (i < numHashes) {
      val idx = ((hash + i * h2) & Long.MaxValue) % m
      if ((words((idx >>> 6).toInt) & (1L << (idx & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Membership probe over ArrayData words in place (no long[]
    * materialization) — the per-ROW variant for bit arrays stored as
    * table columns rather than plan constants.
    */
  def containsData(words: ArrayData, numHashes: Int, hash: Long): Boolean = {
    val m = words.numElements().toLong * 64L
    val h2 = hash * Mix | 1L
    var i = 0
    while (i < numHashes) {
      val idx = ((hash + i * h2) & Long.MaxValue) % m
      if ((words.getLong((idx >>> 6).toInt) & (1L << (idx & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Membership probe against a hash-range-sharded filter set: the
    * row's shard is floorMod(hash, nShards) — the same arithmetic as
    * Spark's `pmod`, so a filter built from a
    * `groupBy(pmod(hash, nShards))` partition probes consistently.
    */
  def containsSharded(shardWords: Array[Array[Long]], numHashes: Int, hash: Long): Boolean = {
    val s = java.lang.Math.floorMod(hash, shardWords.length.toLong).toInt
    contains(shardWords(s), numHashes, hash)
  }

  /** Standard sizing: bits per key for a target false-positive rate
    * (m = -n ln p / ln2², k = (m/n) ln 2), rounded up to whole
    * 64-bit words, capped to keep the plan constant broadcastable.
    */
  def sizeFor(expectedItems: Long, fpp: Double): (Int, Int) = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1, "need items > 0, 0 < fpp < 1")
    val ln2 = math.log(2.0)
    val mBits = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    val bits = math.min(math.max(mBits, 64L), Int.MaxValue.toLong / 2).toInt
    // clamp to the expressions' [1,32] bound: the 64-bit floor can
    // inflate bits/key for tiny expectedItems and push k past it
    val k = math.min(32,
      math.max(1, math.round(bits.toDouble / expectedItems * ln2).toInt))
    (((bits + 63) / 64) * 64, k)
  }
}

/** Distributed Bloom-filter build: aggregates 64-bit hashes into a
  * fixed-size bit array (array<long> of numBits/64 words).
  *
  * Runs as a normal partial aggregate: every map task fills a local
  * bit array from its rows, merge ORs the word arrays — the input
  * never shuffles, only numBits/8 bytes per task cross the wire. The
  * result is the plan-constant input of [[BloomContains]].
  */
case class BloomAgg(
    hashExpr: Expression,
    numBitsExpr: Expression,
    numHashesExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes {

  @transient private lazy val numWords: Int = {
    require(numBitsExpr.foldable, "numBits must be a literal")
    val bits = numBitsExpr.eval(null).asInstanceOf[Int]
    require(bits >= 64 && bits % 64 == 0, s"numBits must be a positive multiple of 64, got $bits")
    bits / 64
  }

  @transient private lazy val numHashes: Int = {
    require(numHashesExpr.foldable, "numHashes must be a literal")
    val k = numHashesExpr.eval(null).asInstanceOf[Int]
    require(k >= 1 && k <= 32, s"numHashes must be in [1,32], got $k")
    k
  }

  override def children: Seq[Expression] = Seq(hashExpr, numBitsExpr, numHashesExpr)

  override def inputTypes = Seq(LongType, IntegerType, IntegerType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) BloomFilterOps.setBits(buf, numHashes, h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hashExpr = newChildren(0), numBitsExpr = newChildren(1),
      numHashesExpr = newChildren(2))
}

/** Bloom membership test as ONE codegen'd expression over a
  * plan-constant bit array.
  *
  * Why an expression: the bit array is megabytes of longs — any
  * per-row composition over a literal array column
  * (`element_at(bits, ...)` chains) would re-materialize or re-walk
  * the ArrayData per probe. Here the words live in a single
  * reference object (the [[NearestCentroids]] pattern): plan size
  * and generated code are independent of filter size, and the k
  * probes are a tight primitive loop inside whole-stage codegen.
  *
  * `bits` (array<long>) and `numHashes` (int) must be foldable.
  */
case class BloomContains(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType, ArrayType(LongType), IntegerType)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val words: Array[Long] = {
    require(second.foldable, "bits must be a literal")
    second.eval().asInstanceOf[ArrayData].toLongArray()
  }

  @transient private lazy val numHashes: Int = {
    require(third.foldable, "numHashes must be a literal")
    val k = third.eval().asInstanceOf[Int]
    require(k >= 1 && k <= 32, s"numHashes must be in [1,32], got $k")
    k
  }

  override def nullSafeEval(h: Any, b: Any, k: Any): Any =
    BloomFilterOps.contains(words, numHashes, h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    val k = numHashes
    nullSafeCodeGen(ctx, ev, (hashExpr, _, _) =>
      s"${ev.value} = graft.plans.BloomFilterOps.contains($wordsRef, $k, $hashExpr);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Per-ROW Bloom membership: unlike [[BloomContains]] (whose bit
  * array is a foldable plan constant), the filter here is a COLUMN —
  * the per-file Bloom a data-skipping manifest row carries. Rows at
  * the probe site are per-FILE (thousands, not billions), so walking
  * the ArrayData per row costs nothing that matters; what matters is
  * that no filter bytes live in the plan at all — the manifest scan
  * streams them.
  */
case class BloomContainsColumn(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType, ArrayType(LongType), IntegerType)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains_col"

  override def nullSafeEval(h: Any, b: Any, k: Any): Any =
    BloomFilterOps.containsData(
      b.asInstanceOf[ArrayData], k.asInstanceOf[Int], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, b, k) =>
      s"${ev.value} = graft.plans.BloomFilterOps.containsData($b, $k, $h);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Membership test against a hash-range-SHARDED Bloom filter set, as
  * one codegen'd expression: shard = floorMod(hash, nShards) (Spark
  * `pmod` arithmetic), then the k probes run against that shard's
  * words only.
  *
  * Why sharding: a single filter for ~10^9+ history keys is GBs of
  * bits in ONE plan constant / reference object — past array and
  * task-serialization limits, and an all-or-nothing broadcast.
  * Sharding by hash range keeps every individual constant bounded
  * (total bits unchanged, fpp per key unchanged — each key is sized
  * into its shard), while build stays one history scan
  * (`groupBy(pmod(hash, S))` of partial-aggregated word arrays) and
  * probe stays one expression. `wordsPerShard` (array<array<long>>,
  * element s = shard s's words) and `numHashes` must be foldable.
  */
case class BloomContainsSharded(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType, ArrayType(ArrayType(LongType)), IntegerType)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains_sharded"

  @transient private lazy val shardWords: Array[Array[Long]] = {
    require(second.foldable, "shard words must be a literal")
    val ad = second.eval().asInstanceOf[ArrayData]
    require(ad.numElements() >= 1, "at least one shard")
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toLongArray())
  }

  @transient private lazy val numHashes: Int = {
    require(third.foldable, "numHashes must be a literal")
    val k = third.eval().asInstanceOf[Int]
    require(k >= 1 && k <= 32, s"numHashes must be in [1,32], got $k")
    k
  }

  override def nullSafeEval(h: Any, b: Any, k: Any): Any =
    BloomFilterOps.containsSharded(shardWords, numHashes, h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomShardWords", shardWords, "long[][]")
    val k = numHashes
    nullSafeCodeGen(ctx, ev, (hashExpr, _, _) =>
      s"${ev.value} = graft.plans.BloomFilterOps.containsSharded($wordsRef, $k, $hashExpr);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
