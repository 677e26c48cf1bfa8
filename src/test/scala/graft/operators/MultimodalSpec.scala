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

  test("decode runs distributed (no single-partition collapse)") {
    val docs = Tables.documents(spark, sf).repartition(4)
    val out = Multimodal.decodePartitioned(spark,
      Multimodal.withPayloadMeta(docs, "doc_id", "text")
        .select(col("doc_id"), col("payload")), "doc_id")
    assert(out.rdd.getNumPartitions === 4)
  }
}
