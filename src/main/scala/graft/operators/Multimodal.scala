package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media carried as opaque `binary`
  * columns with typed metadata alongside.
  *
  * The Spark-side mechanics (schema, batched per-partition
  * processing, partitioning of large blobs) are real; the actual
  * media codec is STUBBED with a deterministic fake (this container
  * has no image/audio libraries). Swap `FakeCodec.decode` for a real
  * decoder (e.g. javax.imageio / ffmpeg via mapPartitions, or
  * `mapInPandas`+PIL from PySpark callers) without touching the
  * pipeline shape.
  */
object Multimodal {

  /** Deterministic fake media decode: derives "format/width/height"
    * metadata purely from the payload bytes. STUB — stands in for a
    * real image decoder.
    */
  object FakeCodec {
    def decode(bytes: Array[Byte]): (String, Int, Int) = {
      val n = if (bytes == null) 0 else bytes.length
      val fmt = if (n % 2 == 0) "png" else "jpeg"
      (fmt, 64 + n % 512, 64 + (n / 2) % 512)
    }
  }

  /** Attach a binary payload column (here: utf-8 bytes of the text —
    * the deterministic stand-in for reading a real media file) plus
    * extracted metadata, all as codegen'd expressions.
    */
  def withPayloadMeta(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("fmt", when(col("n_bytes") % 2 === 0, lit("png")).otherwise(lit("jpeg")))
      .withColumn("width", (lit(64) + col("n_bytes") % 512).cast("int"))
      .withColumn("height", (lit(64) + (col("n_bytes") / lit(2)).cast("int") % 512).cast("int"))
      .select(col(idCol), col("payload"), col("n_bytes"), col("fmt"),
        col("width"), col("height"))

  /** The per-partition batched decode path: how a REAL codec plugs
    * in at scale (no driver collect; one codec context per
    * partition; rows stream through). Uses the stub codec.
    */
  def decodePartitioned(spark: org.apache.spark.sql.SparkSession,
      withPayload: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val schema = "id bigint, fmt string, width int, height int"
    val out = withPayload.select(col(idCol).cast("bigint"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs would init native context here, once per partition
        it.map { case (id, bytes) =>
          val (fmt, w, h) = FakeCodec.decode(bytes)
          (id, fmt, w, h)
        }
      }
    out.toDF("id", "fmt", "width", "height")
  }
}
