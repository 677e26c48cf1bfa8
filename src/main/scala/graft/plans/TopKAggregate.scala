package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Bounded top-k aggregate: keeps the k best (cosine DESC,
  * neighbor_id ASC) pairs in an O(k) heap.
  *
  * This is what makes distributed top-k actually scale: with
  * `groupBy(query).agg(graft_topk(...))` Spark runs this as a
  * partial aggregate on every map task (buffer never exceeds k
  * entries) and merges k-sized states on the reduce side — unlike a
  * `row_number()` window (whole corpus sorted in one partition per
  * query) or `collect_list` (buffer holds every candidate of the
  * partition).
  *
  * Output: array<struct<neighbor_id:bigint, cosine:double>> sorted
  * best-first, deterministic tie-break on neighbor_id.
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with ImplicitCastInputTypes {

  @transient private lazy val k: Int = kExpr.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"k must be an integer literal, got $other")
  }

  // head of the queue = WORST kept pair (lowest cosine, then highest
  // id), so eviction is O(log k)
  private def worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)

  override def inputTypes = Seq(DoubleType, LongType, IntegerType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null) {
      offer(buf, (s.asInstanceOf[Double], id.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  private def offer(
      buf: mutable.PriorityQueue[(Double, Long)],
      cand: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(cand)
    else if (worstFirst.compare(cand, buf.head) < 0) {
      buf.dequeue()
      buf.enqueue(cand)
    }
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // in worstFirst, compare < 0 = better, so ascending sort IS best-first
    val sorted = buf.toArray.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (score, id) =>
      new GenericInternalRow(Array[Any](id, score)): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, id) => out.writeDouble(s); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.enqueue((in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}
