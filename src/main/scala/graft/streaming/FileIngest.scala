package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types.StructType

/** Incremental file ingestion — the Auto Loader analog.
  *
  * Re-expresses the reference's snapshot ingest
  * (pos-dlt `03_Bronze-to-Silver ETL.py:348-364`:
  * `cloudFiles` with an explicit schema over periodically dropped
  * files) as a Structured Streaming file source: files that appear
  * in `dir` after the stream starts are picked up incrementally,
  * `maxFilesPerTrigger` bounds each micro-batch (the
  * `maxOffsetsPerTrigger` analog for files), and the explicit schema
  * skips inference exactly like the reference's schema'd loader.
  */
object FileIngest {

  /** Streaming reader over a directory of files.
    *
    * @param format  "csv", "json" or "parquet"
    * @param options extra reader options (header, timestampFormat...)
    */
  def stream(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      format: String = "csv",
      maxFilesPerTrigger: Option[Int] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val base: DataStreamReader = spark.readStream
      .format(format)
      .schema(schema)
      .options(options)
    maxFilesPerTrigger.fold(base)(n =>
      base.option("maxFilesPerTrigger", n.toString)).load(dir)
  }
}
