package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a mergeable aggregate: at most
  * `k` counters survive in any buffer, and EVERY item whose true
  * frequency exceeds n/(k+1) is guaranteed to be among them (the
  * candidate set is a SUPERSET of the real heavy hitters — it can
  * only over-report, never miss). Merging follows Agarwal et al.:
  * sum counters, then decrement all by the (k+1)-th largest and drop
  * the non-positive — the guarantee survives arbitrary merge trees,
  * which is exactly what a partial-aggregate shuffle is.
  *
  * This is the term-mining analog of the Bloom dedup path: the
  * sketch runs as a normal partial aggregate (k counters per task
  * cross the wire, never the term space), and an exact verify pass
  * over just the candidates turns the superset into an exact answer.
  *
  * Output: array<struct<item: string, lower_bound: bigint>> — the
  * retained items with their MG counts (a LOWER bound on true
  * frequency; the true count is at most lower_bound + n/(k+1)).
  */
case class HeavyHittersAgg(
    itemExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with ImplicitCastInputTypes {

  @transient private lazy val k: Int = {
    require(kExpr.foldable, "k must be a literal")
    val v = kExpr.eval(null).asInstanceOf[Int]
    require(v >= 1, s"k must be >= 1, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(itemExpr, kExpr)

  override def inputTypes = Seq(StringType, IntegerType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("lower_bound", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = itemExpr.eval(input)
    if (v != null) {
      val item = v.toString
      buf.get(item) match {
        case Some(c) => buf(item) = c + 1
        case None =>
          if (buf.size < k) buf(item) = 1L
          else decrementAll(buf, 1L)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) => buf(item) = buf.getOrElse(item, 0L) + c }
    if (buf.size > k) {
      // decrement by the (k+1)-th largest count, then drop <= 0
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      decrementAll(buf, counts(counts.length - k - 1))
    }
    buf
  }

  /** Subtract `d` from every counter, dropping non-positive ones —
    * the MG step that buys room while preserving the guarantee.
    */
  private def decrementAll(buf: mutable.HashMap[String, Long], d: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    buf.mapValuesInPlace((_, c) => c - d)
    buf.foreach { case (item, c) => if (c <= 0) dead += item }
    dead.foreach(buf.remove)
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic output order: count DESC, item ASC
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(item), c): Any
    })
  }

  // length-prefixed raw UTF-8, NOT writeUTF: writeUTF caps an item
  // at 65535 encoded bytes and would crash the shuffle on long items
  // (paragraph-sized keys are legitimate inputs here)
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0), kExpr = newChildren(1))
}
