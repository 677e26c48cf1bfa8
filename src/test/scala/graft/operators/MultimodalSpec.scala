package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("per-partition decode path agrees with the expression-based metadata") {
    val docs = Tables.documents(spark, sf)
    val withPayload = Multimodal.withPayloadMeta(docs, "doc_id", "text")

    val viaExpr = withPayload
      .select(col("doc_id").cast("long"), col("fmt"), col("width"), col("height"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap

    val viaPartitions = Multimodal.decodePartitioned(spark,
        withPayload.select(col("doc_id"), col("payload")), "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap

    assert(viaPartitions === viaExpr)
    assert(viaPartitions.nonEmpty)
  }

  test("feature extraction yields L1-normalized ANN-ready vectors") {
    val docs = Tables.documents(spark, sf).limit(50)
    val feats = Multimodal.extractFeaturesPartitioned(spark,
      Multimodal.withPayloadMeta(docs, "doc_id", "text"), "doc_id", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    assert(feats.nonEmpty)
    feats.foreach { case (id, v) =>
      assert(v.length === 16)
      val s = v.map(_.toDouble).sum
      assert(s >= 0.99 && s <= 1.01, s"doc $id L1 sum $s")
    }
    // deterministic: second run identical
    val again = Multimodal.extractFeaturesPartitioned(spark,
      Multimodal.withPayloadMeta(docs, "doc_id", "text"), "doc_id", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    feats.foreach { case (id, v) => assert(again(id) === v) }
  }

  test("resize bounds dimensions and shrinks payloads") {
    val docs = Tables.documents(spark, sf).limit(50)
    val withP = Multimodal.withPayloadMeta(docs, "doc_id", "text")
    val orig = withP.select("doc_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val resized = Multimodal.resizePartitioned(spark, withP, "doc_id",
      maxW = 128, maxH = 128).collect()
    resized.foreach { r =>
      val (id, bytes, w, h) = (r.getLong(0), r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3))
      assert(w <= 128 && h <= 128, s"doc $id resized to ${w}x$h")
      assert(bytes.length <= orig(id))
    }
  }

  test("frame sampling fans out one row per kept frame, no shuffle") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 20)
    val withP = Multimodal.withPayloadMeta(docs, "doc_id", "text")
    val frames = Multimodal.frameSamplePartitioned(spark, withP, "doc_id",
      frameSize = 100, every = 2)
    val nBytes = withP.select("doc_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val counts = frames.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.foreach { case (id, n) =>
      val total = math.ceil(nBytes(id) / 100.0).toLong
      assert(n === (total + 1) / 2, s"doc $id: $n frames of $total")
    }
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("decode runs distributed (no single-partition collapse)") {
    val docs = Tables.documents(spark, sf).repartition(4)
    val out = Multimodal.decodePartitioned(spark,
      Multimodal.withPayloadMeta(docs, "doc_id", "text")
        .select(col("doc_id"), col("payload")), "doc_id")
    assert(out.rdd.getNumPartitions === 4)
  }
}
