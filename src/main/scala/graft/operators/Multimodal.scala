package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media carried as opaque `binary`
  * columns with typed metadata alongside.
  *
  * The Spark-side mechanics (schema, batched per-partition
  * processing, partitioning of large blobs) are real; the actual
  * media codecs are STUBBED with deterministic fakes (this container
  * has no image/audio libraries). Swap the `FakeCodec` methods for a
  * real decoder (javax.imageio / ffmpeg via the same mapPartitions
  * shells) without touching the pipeline shape: one codec context
  * per partition, rows streamed through, never collected.
  */
object Multimodal {

  /** Deterministic fake media codec — STUB standing in for real
    * image/audio/video libraries. Every method derives its output
    * purely from payload bytes, so pipelines are testable end-to-end
    * and oracle-checkable.
    */
  object FakeCodec {
    /** "Decode" format + dimensions from a payload. */
    def decode(bytes: Array[Byte]): (String, Int, Int) = {
      val n = if (bytes == null) 0 else bytes.length
      val fmt = if (n % 2 == 0) "png" else "jpeg"
      (fmt, 64 + n % 512, 64 + (n / 2) % 512)
    }

    /** "Feature-extract" a fixed-dimension embedding: dim buckets of
      * byte sums, L1-normalized. Deterministic stand-in for a vision
      * encoder.
      */
    def extractFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val sums = new Array[Long](dim)
      if (bytes != null) {
        var i = 0
        while (i < bytes.length) {
          sums(i % dim) += (bytes(i) & 0xff)
          i += 1
        }
      }
      val total = math.max(1L, sums.sum)
      sums.map(s => (s.toDouble / total.toDouble).toFloat)
    }

    /** "Resize": a real codec would re-encode pixels; the stub keeps
      * every `step`-th byte. Output metadata reflects the target box.
      */
    def resize(bytes: Array[Byte], maxW: Int, maxH: Int): (Array[Byte], Int, Int) = {
      val (_, w, h) = decode(bytes)
      val scale = math.max(1.0, math.max(w.toDouble / maxW, h.toDouble / maxH))
      val step = math.max(1, math.ceil(scale).toInt)
      val out = if (bytes == null) Array.emptyByteArray
        else bytes.indices.collect { case i if i % step == 0 => bytes(i) }.toArray
      (out, (w / scale).toInt, (h / scale).toInt)
    }

    /** "Frame-sample" a video-ish payload: cut into `frameSize`-byte
      * frames, keep every `every`-th frame.
      */
    def frameSample(bytes: Array[Byte], frameSize: Int, every: Int): Seq[Array[Byte]] = {
      if (bytes == null || bytes.isEmpty) Seq.empty
      else bytes.grouped(frameSize).zipWithIndex
        .collect { case (frame, i) if i % every == 0 => frame }.toSeq
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
  def decodePartitioned(spark: SparkSession,
      withPayload: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
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

  /** Feature extraction (image -> embedding) through the same
    * partition-batched shell; output is ANN-ready `array<float>`.
    */
  def extractFeaturesPartitioned(spark: SparkSession,
      withPayload: DataFrame, idCol: String, dim: Int = 64): DataFrame = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("bigint"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => (id, FakeCodec.extractFeatures(bytes, dim)) }
      }
      .toDF("id", "features")
  }

  /** Bounded-box resize through the partition-batched shell; keeps
    * payload AND new metadata so downstream stages chain.
    */
  def resizePartitioned(spark: SparkSession,
      withPayload: DataFrame, idCol: String,
      maxW: Int, maxH: Int): DataFrame = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("bigint"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (out, w, h) = FakeCodec.resize(bytes, maxW, maxH)
          (id, out, w, h)
        }
      }
      .toDF("id", "payload", "width", "height")
  }

  /** Frame sampling (video -> frames): one input row fans out to one
    * row per kept frame, still partition-local (flatMap, no
    * shuffle).
    */
  def frameSamplePartitioned(spark: SparkSession,
      withPayload: DataFrame, idCol: String,
      frameSize: Int, every: Int): DataFrame = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("bigint"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          FakeCodec.frameSample(bytes, frameSize, every).zipWithIndex
            .map { case (frame, i) => (id, i, frame) }
        }
      }
      .toDF("id", "frame_idx", "frame")
  }
}
