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

  test("schema evolution: an added-column file lands on restart, old rows read null") {
    val s = spark
    val dir = tmpDir("evo_drop")
    val schemaLoc = tmpDir("evo_schemas")
    val target = tmpDir("evo_target") + "/data"
    val ckpt = tmpDir("evo_ckpt")
    drop(dir, "snap1.csv", Seq("1,7,100"))

    def runToDrain(): StructType = {
      val stream = FileIngest.streamEvolving(s, dir, schemaLoc,
        format = "csv", options = Map("header" -> "true"))
      val q = stream.writeStream.format("parquet")
        .option("path", target).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      stream.schema
    }

    // first start: inferred schema persisted as v0
    val s0 = runToDrain()
    assert(s0.fieldNames.toSeq === Seq("item_id", "employee_id", "quantity"))
    assert(FileIngest.persistedSchema(schemaLoc).contains(s0))

    // a snapshot with a NEW column lands; the restart evolves to v1
    Files.write(Paths.get(dir, "snap2.csv"),
      "item_id,employee_id,quantity,discount\n2,8,200,0.25\n"
        .getBytes(StandardCharsets.UTF_8))
    val s1 = runToDrain()
    assert(s1.fieldNames.toSeq ===
      Seq("item_id", "employee_id", "quantity", "discount"))
    // both evolution steps are on the audit trail
    assert(Files.exists(Paths.get(schemaLoc, "v0.json")))
    assert(Files.exists(Paths.get(schemaLoc, "v1.json")))

    // reading the sink with the evolved schema: the pre-evolution row
    // reads null for the late-added column, the new row carries it
    val rows = s.read.schema(s1).parquet(target).collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(rows === Map(1 -> None, 2 -> Some(0.25)))

    // idempotent restart: no new data, no new schema version
    runToDrain()
    assert(!Files.exists(Paths.get(schemaLoc, "v2.json")))

    // a half-written hidden temp file must not pollute inference —
    // the streaming source ignores dotfiles, so must the inferrer
    Files.write(Paths.get(dir, ".snap3.csv.tmp"),
      "garbage,half written\nnoise".getBytes(StandardCharsets.UTF_8))
    val s2 = FileIngest.evolveSchema(s, dir, schemaLoc,
      format = "csv", options = Map("header" -> "true"))
    assert(s2 === s1)
    assert(!Files.exists(Paths.get(schemaLoc, "v2.json")))

    // CSV parses positionally: a file with the new column NOT at the
    // end would silently shift every token — rejected loudly instead
    Files.write(Paths.get(dir, "snap4.csv"),
      "discount,item_id,employee_id,quantity\n0.5,3,9,300\n"
        .getBytes(StandardCharsets.UTF_8))
    val err = intercept[IllegalArgumentException] {
      FileIngest.evolveSchema(s, dir, schemaLoc,
        format = "csv", options = Map("header" -> "true"))
    }
    assert(err.getMessage.contains("positional prefix"))
  }

  test("corrupt rows are quarantined raw while clean rows reach the target") {
    val s = spark
    val dir = tmpDir("quar_drop")
    val target = tmpDir("quar_target") + "/data"
    val quarantine = tmpDir("quar_bad") + "/data"
    val ckpt = tmpDir("quar_ckpt")
    // row 2 has a non-numeric quantity -> corrupt under the int schema
    drop(dir, "snap1.csv", Seq("1,7,100", "2,7,not_a_number", "3,8,300"))

    val q = FileIngest.runQuarantined(s, dir, schema,
      targetDir = target, quarantineDir = quarantine, checkpointDir = ckpt,
      format = "csv", options = Map("header" -> "true"))
    try q.awaitTermination() finally q.stop()

    val good = s.read.parquet(target).collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(good === Map(1 -> 100, 3 -> 300))
    val bad = s.read.parquet(quarantine).collect().map(_.getString(0))
    assert(bad.length === 1)
    assert(bad.head.contains("not_a_number"))

    // restart with a clean new file: only the new rows append, the
    // quarantine is untouched
    drop(dir, "snap2.csv", Seq("4,9,400"))
    val q2 = FileIngest.runQuarantined(s, dir, schema,
      targetDir = target, quarantineDir = quarantine, checkpointDir = ckpt,
      format = "csv", options = Map("header" -> "true"))
    try q2.awaitTermination() finally q2.stop()
    assert(s.read.parquet(target).count() === 3)
    assert(s.read.parquet(quarantine).count() === 1)

    // REPLAY idempotency (foreachBatch is at-least-once): simulate a
    // crash AFTER the sink writes but BEFORE the batch commits by
    // deleting the last commit marker — the restart re-runs the SAME
    // batch id over the same files, and the batch=<id> overwrite must
    // leave counts unchanged where a plain append would duplicate
    val commits = Files.list(Paths.get(ckpt, "commits"))
    val lastCommit = try {
      import scala.jdk.CollectionConverters._
      commits.iterator().asScala.toSeq
        .filter(_.getFileName.toString.forall(_.isDigit)) // skip .tmp etc
        .maxBy(_.getFileName.toString.toLong) // numeric: "9" < "10"
    } finally commits.close()
    Files.delete(lastCommit)
    // a terminated query releases its checkpoint lock asynchronously;
    // retry the restart until the lock is free (bounded)
    def runReplay(attempt: Int): Unit = {
      val q3 = FileIngest.runQuarantined(s, dir, schema,
        targetDir = target, quarantineDir = quarantine, checkpointDir = ckpt,
        format = "csv", options = Map("header" -> "true"))
      try q3.awaitTermination()
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException
            if attempt < 20 && e.getMessage.contains("concurrently using") =>
          Thread.sleep(250); runReplay(attempt + 1)
      } finally q3.stop()
    }
    runReplay(0)
    assert(s.read.parquet(target).count() === 3, "replay must not duplicate")
    assert(s.read.parquet(quarantine).count() === 1)
  }
}
