package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

class FileIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("item_id", IntegerType),
    StructField("employee_id", IntegerType),
    StructField("quantity", IntegerType)))

  private def drop(dir: String, name: String, rows: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      ("item_id,employee_id,quantity" +: rows).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))

  test("file stream picks up dropped files incrementally with a bounded trigger") {
    val dir = tmpDir("snapshots")
    drop(dir, "snap1.csv", Seq("1,7,100", "2,7,200"))

    val stream = FileIngest.stream(spark, dir, schema,
      format = "csv", maxFilesPerTrigger = Some(1),
      options = Map("header" -> "true"))
    assert(stream.isStreaming)

    val q = stream.writeStream.format("memory")
      .queryName("ingest_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ingest_out").count() === 2)

      // the Auto Loader moment: a new periodic snapshot lands
      drop(dir, "snap2.csv", Seq("3,8,300"))
      q.processAllAvailable()
      assert(spark.table("ingest_out").count() === 3)
      val qty = spark.table("ingest_out").collect()
        .map(r => r.getInt(0) -> r.getInt(2)).toMap
      assert(qty === Map(1 -> 100, 2 -> 200, 3 -> 300))
    } finally q.stop()
  }
}
