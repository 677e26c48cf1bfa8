package graft.streaming

import graft.SparkSpec
import graft.operators.Expectations
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
import java.nio.file.{Files, Paths}

class StreamingPipelineSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("x", DoubleType)))

  private def dropCsv(dir: String, name: String, rows: String*): Unit =
    Files.write(Paths.get(dir, name),
      ("id,x" +: rows).mkString("\n").getBytes)

  test("streaming expectations: observe metrics, null-safe drop, warn passthrough") {
    val s = spark
    val dropDir = tmpDir("se_drop")
    // id 2 has NULL x -> predicate null -> must count + drop
    dropCsv(dropDir, "b1.csv", "1,0.5", "2,", "3,-0.1")

    val p = new StreamingPipeline(s, tmpDir("se_root"))
    p.source("bronze")(FileIngest.stream(s, dropDir, schema,
      format = "csv", options = Map("header" -> "true")))
    p.tableWithExpectations("silver", Seq("bronze"), Seq(
      Expectations.ruleOrDrop("x_nonneg", col("x") >= 0),
      Expectations.rule("id_small", col("id") <= 2))) { d => d("bronze") }

    var observed = Map.empty[String, Long]
    val built = p.runOnce((n, m) => if (n == "silver") observed = m)
    assert(built("silver").select("id").collect().map(_.getInt(0)).toSeq === Seq(1))
    // violation counts are measured BEFORE the drop filter
    assert(observed === Map("x_nonneg" -> 2L, "id_small" -> 1L))
  }

  test("per-table trigger intervals: two tables on different cadences in continuous mode") {
    val s = spark
    import org.apache.spark.sql.streaming.Trigger
    val dropDir = tmpDir("ti_drop")
    dropCsv(dropDir, "b1.csv", "1,0.5")

    val p = new StreamingPipeline(s, tmpDir("ti_root"))
    p.source("bronze")(FileIngest.stream(s, dropDir, schema,
      format = "csv", options = Map("header" -> "true")))
    p.table("fast", "bronze") { d => d("bronze") }
    p.table("slow", "bronze") { d => d("bronze") }
    // the reference's `pipelines.trigger.interval` shape: silver-style
    // per-arrival cadence vs a gold-style long interval (04:68)
    p.triggerInterval("fast", Trigger.ProcessingTime("50 milliseconds"))
    p.triggerInterval("slow", Trigger.ProcessingTime("10 minutes"))
    intercept[IllegalArgumentException](
      p.triggerInterval("nope", Trigger.ProcessingTime("1 second")))

    val run = p.start()
    try {
      // each query runs on ITS OWN configured trigger
      def triggerOf(name: String) = run.query(name)
        .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.trigger
      assert(triggerOf("fast") === Trigger.ProcessingTime("50 milliseconds"))
      assert(triggerOf("slow") === Trigger.ProcessingTime("10 minutes"))

      def await(cond: => Boolean, what: String, timeoutMs: Long = 30000): Unit = {
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        while (!cond) {
          if (System.nanoTime() > deadline) fail(s"timed out waiting for $what")
          Thread.sleep(50)
        }
      }
      def ids(t: String): Seq[Int] = p.readTable(t)
        .select("id").collect().map(_.getInt(0)).sorted.toSeq

      run.query("bronze").processAllAvailable()
      await(ids("fast") == Seq(1), "fast to ingest b1 on its 50ms cadence")
      // slow's FIRST trigger fired at start; record what it saw
      await(run.query("slow").lastProgress != null, "slow's first batch")
      val slow0 = ids("slow")

      // new data flows through fast within its cadence, while slow's
      // next trigger is 10 minutes away: its table must not move
      dropCsv(dropDir, "b2.csv", "2,1.5")
      run.query("bronze").processAllAvailable()
      await(ids("fast") == Seq(1, 2), "fast to ingest b2 on its 50ms cadence")
      assert(ids("slow") === slow0)
    } finally run.stopAll()
  }

  test("a NEW pipeline instance on the same storageRoot resumes from the checkpoints") {
    val s = spark
    val dropDir = tmpDir("sr_drop")
    val root = tmpDir("sr_root")
    def build(): StreamingPipeline = {
      val p = new StreamingPipeline(s, root)
      p.source("bronze")(FileIngest.stream(s, dropDir, schema,
        format = "csv", options = Map("header" -> "true")))
      p.table("silver", "bronze") { d => d("bronze") }
      p
    }
    dropCsv(dropDir, "b1.csv", "1,0.5", "2,1.5")
    build().runOnce()

    // process restart: a fresh instance, same storage — must pick up
    // ONLY the new file, not reprocess b1
    dropCsv(dropDir, "b2.csv", "3,2.5")
    val p2 = build()
    val built = p2.runOnce()
    assert(built("silver").select("id").collect().map(_.getInt(0)).sorted.toSeq
      === Seq(1, 2, 3))
    // a third cascade with nothing new appends nothing
    build().runOnce()
    assert(p2.readTable("silver").count() === 3)
  }

  test("event log: per-table per-batch rows with expectation counts, appended across runs") {
    val s = spark
    val dropDir = tmpDir("el_drop")
    val root = tmpDir("el_root")
    dropCsv(dropDir, "b1.csv", "1,0.5", "2,", "3,-0.1")

    def build(): StreamingPipeline = {
      val p = new StreamingPipeline(s, root)
      p.source("bronze")(FileIngest.stream(s, dropDir, schema,
        format = "csv", options = Map("header" -> "true")))
      p.tableWithExpectations("silver", Seq("bronze"), Seq(
        Expectations.ruleOrDrop("x_nonneg", col("x") >= 0),
        Expectations.rule("id_small", col("id") <= 2))) { d => d("bronze") }
      p
    }
    build().runOnce()

    val p = build()
    val log1 = p.eventLog.collect()
    assert(log1.map(_.getAs[String]("table_name")).toSet === Set("bronze", "silver"))
    assert(log1.forall(_.getAs[String]("mode") == "triggered"))
    assert(log1.forall(_.getAs[Long]("duration_ms") >= 0))
    val bronze = log1.filter(_.getAs[String]("table_name") == "bronze")
    assert(bronze.map(_.getAs[Long]("rows_in")).sum === 3)
    assert(bronze.map(_.getAs[Long]("rows_out")).sum === 3)
    assert(bronze.forall(_.getAs[scala.collection.Seq[Any]]("expectations").isEmpty))
    val silver = log1.filter(_.getAs[String]("table_name") == "silver")
    assert(silver.map(_.getAs[Long]("rows_in")).sum === 3)
    // x_nonneg drops the NULL and the negative row
    assert(silver.map(_.getAs[Long]("rows_out")).sum === 1)
    val exp = silver.flatMap(
        _.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("expectations"))
      .map(r => (r.getAs[String]("rule"), r.getAs[String]("action"),
        r.getAs[Long]("failed"))).toSet
    assert(exp === Set(("x_nonneg", "Drop", 2L), ("id_small", "Warn", 1L)))

    // second cascade over new data APPENDS events with a later batch id
    dropCsv(dropDir, "b2.csv", "4,1.0")
    p.runOnce()
    val log2 = p.eventLog.collect()
    assert(log2.length > log1.length)
    val silver2 = log2.filter(r => r.getAs[String]("table_name") == "silver" &&
      r.getAs[Long]("batch_id") > silver.map(_.getAs[Long]("batch_id")).max)
    assert(silver2.map(_.getAs[Long]("rows_in")).sum === 1)
    assert(silver2.map(_.getAs[Long]("rows_out")).sum === 1)
  }

  test("event log: continuous mode flushes batch rows on stopAll") {
    val s = spark
    val dropDir = tmpDir("elc_drop")
    dropCsv(dropDir, "b1.csv", "1,0.5", "2,1.5")

    val p = new StreamingPipeline(s, tmpDir("elc_root"))
    p.source("bronze")(FileIngest.stream(s, dropDir, schema,
      format = "csv", options = Map("header" -> "true")))
    p.table("silver", "bronze") { d => d("bronze").filter(col("x") > 1.0) }

    val run = p.start()
    try run.processAllAvailable()
    finally run.stopAll()

    val log = p.eventLog.collect()
    assert(log.forall(_.getAs[String]("mode") == "continuous"))
    val silver = log.filter(_.getAs[String]("table_name") == "silver")
    assert(silver.map(_.getAs[Long]("rows_in")).sum === 2)
    assert(silver.map(_.getAs[Long]("rows_out")).sum === 1)

    // stop-in-finally means stopAll often runs twice — the second
    // call must not append the run's events to the log again
    run.stopAll()
    assert(p.eventLog.count() === log.length.toLong)
  }

  test("full refresh wipes a table + its dependents and the next cascade reprocesses") {
    val s = spark
    val dropDir = tmpDir("fr_drop")
    dropCsv(dropDir, "b1.csv", "1,0.5", "2,1.5", "3,2.5")

    val p = new StreamingPipeline(s, tmpDir("fr_root"))
    p.source("bronze")(FileIngest.stream(s, dropDir, schema,
      format = "csv", options = Map("header" -> "true")))
    p.table("silver", "bronze") { d => d("bronze").filter(col("x") > 1.0) }
    p.table("gold", "silver") { d => d("silver") }
    p.runOnce()
    assert(p.readTable("silver").count() === 2)
    assert(p.readTable("gold").count() === 2)

    intercept[IllegalArgumentException](p.fullRefresh("nope"))

    // refreshing silver must close over gold (gold's checkpoint has
    // already seen silver's storage files; stale, it would skip the
    // rebuilt ones) but must NOT touch bronze
    p.fullRefresh("silver")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(p.dataDir("silver"))))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(p.dataDir("gold"))))
    assert(p.readTable("bronze").count() === 3, "bronze must survive")

    // no new input: bronze's checkpoint is intact (nothing
    // reprocessed there), silver/gold rebuild from bronze's storage
    p.runOnce()
    assert(p.readTable("bronze").count() === 3)
    assert(p.readTable("silver").count() === 2)
    assert(p.readTable("gold").count() === 2)

    // whole-pipeline refresh: bronze re-ingests the external files
    p.fullRefresh()
    p.runOnce()
    assert(p.readTable("bronze").count() === 3)
    assert(p.readTable("gold").count() === 2)
  }

  test("streaming fail rule aborts the cascade before dependents run") {
    val s = spark
    val dropDir = tmpDir("sf_drop")
    dropCsv(dropDir, "b1.csv", "1,0.5", "3,-0.1")

    val p = new StreamingPipeline(s, tmpDir("sf_root"))
    p.source("bronze")(FileIngest.stream(s, dropDir, schema,
      format = "csv", options = Map("header" -> "true")))
    p.tableWithExpectations("silver", Seq("bronze"),
      Seq(Expectations.ruleOrFail("x_nonneg", col("x") >= 0))) { d => d("bronze") }
    var goldRan = false
    p.table("gold", "silver") { d => goldRan = true; d("silver") }

    val e = intercept[IllegalStateException] { p.runOnce() }
    assert(e.getMessage.contains("x_nonneg"))
    assert(!goldRan, "dependent table must not start after a Fail violation")
  }
}
