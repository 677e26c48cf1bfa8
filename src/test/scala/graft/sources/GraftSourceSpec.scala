package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `format("graft")` data source: planning-time pruning through
  * PrunedFilteredScan, SQL-view integration, DV awareness.
  */
class GraftSourceSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_src").toString

  test("format(graft) reads equal readSkipping; filters push to the scan; SQL views prune per query") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    DataSkipping.writeWithStats(
      (0L until 4000L).map(i => (i, i % 9, s"p$i")).toDF("id", "bucket", "payload")
        .repartitionByRange(8, col("id")),
      dir, Seq("id"))
    DataSkipping.deleteWhereDV(s, dir, col("id") >= 3900L)

    val df = s.read.format("graft").load(dir)
    assert(df.count() === 3900L, "the vector applies through the source")
    val band = df.filter(col("id") >= 1000L && col("id") < 1200L)
    assert(band.count() === 200L)
    assert(band.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      (1000L until 1200L))
    // the filter reaches the relation (visible as a pushed filter on
    // the scan node), so the manifest prunes at planning time
    val plan = band.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(id,1000)"), s"no pushdown in:\n$plan")

    // SQL over a view of the source: each query's own predicate
    // plans the scan
    df.createOrReplaceTempView("graft_t")
    val viaSql = s.sql(
      "SELECT COUNT(*) FROM graft_t WHERE id < 500 OR id >= 3800")
      .head().getLong(0)
    assert(viaSql === 600L) // 500 + (3900-3800): DV hides >= 3900
    // projection: a two-column query over the three-column table
    assert(s.sql("SELECT payload FROM graft_t WHERE id = 42")
      .head().getString(0) === "p42")
    // untranslatable filter families stay correct (re-applied above)
    assert(df.filter(length(col("payload")) === 3).count() ===
      df.collect().count(r => r.getString(2).length == 3))
  }

  test("write side: Overwrite creates, Append grows O(batch), modes behave, round-trip reads") {
    val s = spark
    import s.implicits._
    val dir = tmp() + "/t"
    (0L until 1000L).map(i => (i, s"p$i")).toDF("id", "payload")
      .repartitionByRange(2, col("id"))
      .write.format("graft").option("statsCols", "id").save(dir)
    assert(s.read.format("graft").load(dir).count() === 1000L)
    // append without statsCols: the table's tracked set applies
    (1000L until 1100L).map(i => (i, s"p$i")).toDF("id", "payload")
      .write.format("graft").mode("append").save(dir)
    assert(s.read.format("graft").load(dir).count() === 1100L)
    assert(DataSkipping.readSkipping(s, dir, col("id") >= 1000L)
      .count() === 100L, "appended rows land in the manifest")
    // ErrorIfExists refuses; Ignore is a no-op
    intercept[IllegalArgumentException] {
      Seq((1L, "x")).toDF("id", "payload")
        .write.format("graft").mode("errorifexists").save(dir)
    }
    Seq((1L, "x")).toDF("id", "payload")
      .write.format("graft").mode("ignore").save(dir)
    assert(s.read.format("graft").load(dir).count() === 1100L)
    // a missing statsCols on a FRESH table is loud
    intercept[IllegalArgumentException] {
      Seq((1L, "x")).toDF("id", "payload")
        .write.format("graft").save(tmp() + "/fresh")
    }
    // exactly-once append markers through the option
    val n0 = DataSkipping.readSkipping(s, dir, lit(true)).count()
    (5000L until 5010L).map(i => (i, s"p$i")).toDF("id", "payload")
      .write.format("graft").mode("append")
      .option("commitName", "batch-7").save(dir)
    (5000L until 5010L).map(i => (i, s"p$i")).toDF("id", "payload")
      .write.format("graft").mode("append")
      .option("commitName", "batch-7").save(dir) // replay: skipped
    assert(DataSkipping.readSkipping(s, dir, lit(true)).count() === n0 + 10L)
  }

  test("write side: partitionBy creates a hive-partitioned graft table; appends route and mismatches refuse") {
    val s = spark
    import s.implicits._
    val dir = tmp() + "/t"
    (0L until 90L).map(i => (i, i % 3, i * 2)).toDF("id", "p", "v")
      .write.format("graft").partitionBy("p")
      .option("statsCols", "id,v").save(dir)
    assert(DataSkipping.tablePartitionColumns(s, dir) === Seq("p"))
    val (kept, files) = DataSkipping.prunedFiles(s, dir, col("p") === 1L)
    assert(kept.nonEmpty && kept.forall(_.contains("p=1")), kept.mkString("\n"))
    assert(kept.size < files.size)
    // append WITHOUT partitionBy routes by the table's own layout
    Seq((1000L, 7L, 0L)).toDF("id", "p", "v")
      .write.format("graft").mode("append").save(dir)
    assert(DataSkipping.readSkipping(s, dir, col("p") === 7L).count() === 1L)
    // append WITH a matching partitionBy is accepted too
    Seq((1001L, 8L, 0L)).toDF("id", "p", "v")
      .write.format("graft").mode("append").partitionBy("p").save(dir)
    assert(DataSkipping.readSkipping(s, dir, col("p") === 8L).count() === 1L)
    // a MISMATCHED partitionBy on append refuses loudly
    val e = intercept[Exception] {
      Seq((1002L, 9L, 0L)).toDF("id", "p", "v")
        .write.format("graft").mode("append").partitionBy("v").save(dir)
    }
    assert(e.getMessage.contains("partition columns"), e.getMessage)
    // reads serve partition values through the source
    assert(s.read.format("graft").load(dir)
      .filter(col("p").isNull).count() === 0L)
    assert(s.read.format("graft").load(dir).count() === 92L)
    // the declaration check speaks LOGICAL names: after a
    // partition-column rename, the new name passes and the stale
    // physical name refuses
    DataSkipping.renameColumn(s, dir, "p", "bucket")
    Seq((1003L, 10L, 0L)).toDF("id", "bucket", "v")
      .write.format("graft").mode("append").partitionBy("bucket").save(dir)
    assert(DataSkipping.readSkipping(s, dir, col("bucket") === 10L)
      .count() === 1L)
    val e2 = intercept[Exception] {
      Seq((1004L, 11L, 0L)).toDF("id", "bucket", "v")
        .write.format("graft").mode("append").partitionBy("p").save(dir)
    }
    assert(e2.getMessage.contains("partition columns"), e2.getMessage)
  }

  test("writeStream.format(graft).partitionBy bootstraps a partitioned target and routes batches") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val srcDir = s"$root/src"
    val dir = s"$root/t"
    (0L until 60L).map(i => (i, i % 3, i)).toDF("id", "p", "v")
      .coalesce(1).write.parquet(srcDir)
    val q = s.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("p",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
      .parquet(srcDir)
      .writeStream.format("graft")
      .partitionBy("p")
      .option("statsCols", "id,v")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dir)
    q.awaitTermination()
    assert(DataSkipping.tablePartitionColumns(s, dir) === Seq("p"))
    assert(DataSkipping.readSkipping(s, dir, lit(true)).count() === 60L)
    assert(DataSkipping.readSkipping(s, dir, col("p") === 2L).count() === 20L)
    val (kept, files) = DataSkipping.prunedFiles(s, dir, col("p") === 2L)
    assert(kept.nonEmpty && kept.forall(_.contains("p=2")), kept.mkString("\n"))
  }

  test("versionAsOf / timestampAsOf reader options pin the relation to a retained version") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    DataSkipping.writeWithStats(
      (0L until 500L).map(i => (i, i % 10)).toDF("id", "k")
        .repartitionByRange(4, col("k")), dir, Seq("k"))
    val t0 = System.currentTimeMillis()
    Thread.sleep(20)
    DataSkipping.deleteWhere(s, dir, col("k") === 3L)                  // v1
    DataSkipping.renameColumn(s, dir, "k", "kk")
    DataSkipping.deleteWhere(s, dir, col("kk") === 4L)                 // v2

    // live: both deletes and the rename apply
    val live = s.read.format("graft").load(dir)
    assert(live.columns.contains("kk") && live.count() === 400L)
    // versionAsOf 0: pre-delete rows under the ORIGINAL name
    val v0 = s.read.format("graft").option("versionAsOf", "0").load(dir)
    assert(v0.columns.contains("k") && v0.count() === 500L)
    assert(v0.filter(col("k") === 3L).count() === 50L)
    // timestampAsOf before the first delete resolves to v0
    val byTs = s.read.format("graft").option("timestampAsOf", t0.toString).load(dir)
    assert(byTs.count() === 500L)
    // both options together are refused
    intercept[IllegalArgumentException] {
      s.read.format("graft").option("versionAsOf", "0")
        .option("timestampAsOf", t0.toString).load(dir).count()
    }
    // an unretained version fails loudly at scan time
    intercept[IllegalArgumentException] {
      s.read.format("graft").option("versionAsOf", "99").load(dir).count()
    }
  }

  test("readStream.format(graft): append stream by default, change feed via readChangeFeed") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmp() + "/t"
    DataSkipping.writeWithStats(
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), dir, Seq("id"),
      bloomCols = Nil, changeFeed = true)
    DataSkipping.appendWithStats(
      Seq((3L, 30L)).toDF("id", "v"), dir, Seq("id"),
      commitName = Some("b1"))
    DataSkipping.deleteWhere(s, dir, col("id") === 2L)

    def drain(df: org.apache.spark.sql.DataFrame, out: String, ckpt: String): Unit = {
      val q = df.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // default: the append stream — initial snapshot of LIVE rows
    // (id=2 already deleted), then new commits as they land
    val out1 = tmp() + "/out1"
    val ckpt1 = tmp() + "/c1"
    drain(s.readStream.format("graft").option("path", dir).load(), out1, ckpt1)
    val appended = s.read.parquet(out1).as[(Long, Long)].collect().toSet
    assert(appended === Set((1L, 10L), (3L, 30L)))
    DataSkipping.appendWithStats(
      Seq((4L, 40L)).toDF("id", "v"), dir, Seq("id"), commitName = Some("b2"))
    drain(s.readStream.format("graft").option("path", dir).load(), out1, ckpt1)
    assert(s.read.parquet(out1).as[(Long, Long)].collect().toSet
      === Set((1L, 10L), (3L, 30L), (4L, 40L)), "only the new commit streams on restart")

    // readChangeFeed=true: row-level changes with type + version
    val out2 = tmp() + "/out2"
    drain(s.readStream.format("graft")
        .option("path", dir).option("readChangeFeed", "true")
        .option("startingVersion", "0").load(),
      out2, tmp() + "/c2")
    val changes = s.read.parquet(out2)
      .select(col("id"), col(DataSkipping.ChangeTypeCol))
      .as[(Long, String)].collect().toSet
    // the feed carries row-level DML only; appends are the stats-table
    // stream's job (the documented Delta insert-commit/CDC-commit split)
    assert(changes === Set((2L, "delete")), changes.toString)
  }
}
