package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Reader/writer protocol gating — the Delta table-features rule:
  * a manifest carrying a feature flag this build does not implement
  * is REFUSED by every consumer that would have to honor the
  * feature's semantics, instead of being silently misread.
  */
class ProtocolSpec extends SparkSpec {

  private def freshTable(prefix: String): String = {
    val s = spark
    import s.implicits._
    val t = s"${tmpDir(prefix)}/t"
    val df = (0L until 200L).map(i => (i, i % 20, i * 1.5))
      .toDF("id", "k", "v")
    DataSkipping.writeWithStats(df.repartitionByRange(4, col("k")), t, Seq("k"))
    t
  }

  private def injectFeature(t: String, feature: String): Unit = {
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = DataSkipping.manifestDir(spark, t)
    val p = new Path(dir, DataSkipping.FeaturesFile)
    val existing = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val out = fs.create(p, true)
    try out.write(s"$existing\n$feature"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  test("an unknown table feature refuses reads, metadata aggregates, appends, compaction and DML — loudly") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_proto1")
    // sanity: everything works before the feature lands
    assert(DataSkipping.readSkipping(s, t, col("k") < 5L).count() == 50L)
    injectFeature(t, "rowTracking-v2")
    def refused(body: => Any): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains("rowTracking-v2"), e.getMessage)
      assert(e.getMessage.contains("does not"), e.getMessage)
    }
    refused(DataSkipping.readSkipping(s, t, col("k") < 5L).count())
    refused(DataSkipping.countWhere(s, t, col("k") < 5L))
    refused(DataSkipping.minMaxWhere(s, t, "k", lit(true)))
    refused(DataSkipping.appendWithStats(
      Seq((999L, 1L, 0.0)).toDF("id", "k", "v"), t, Seq("k")))
    refused(DataSkipping.compactTable(s, t))
    refused(DataSkipping.deleteWhere(s, t, col("k") === 1L))
    refused(DataSkipping.mergeUpsert(s,
      t, Seq((999L, 1L, 0.0)).toDF("id", "k", "v"), Seq("id")))
    // inspection surfaces stay readable — no feature semantics needed
    assert(DataSkipping.tableVersions(s, t) == Seq(0L))
    assert(DataSkipping.describeHistory(s, t).count() == 1L)
  }

  test("every feature this build writes passes its own gate") {
    val s = spark
    import s.implicits._
    val t = s"${tmpDir("graft_proto2")}/t"
    val df = (0L until 100L).map(i => (i, i % 10, i * 1.0)).toDF("id", "k", "v")
    // nulls + bloom + changefeed all at once — the full feature set
    DataSkipping.writeWithStats(df.repartitionByRange(4, col("k")), t,
      Seq("k", "id"), bloomCols = Seq("id"), bloomBits = 1 << 12,
      changeFeed = true)
    DataSkipping.deleteWhere(s, t, col("k") === 3L)
    assert(DataSkipping.readSkipping(s, t, col("id") === 17L).count() == 1L)
    assert(DataSkipping.readChangeFeed(s, t, 1L).count() == 10L)
  }
}
