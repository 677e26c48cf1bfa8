package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL-surface metadata aggregate pushdown ([[GraftMetaAggStrategy]]
  * / [[GraftMetaAggExec]]): a global COUNT/MIN/MAX over a graft
  * relation must answer O(manifest), proved by the plan node and its
  * scanned-files metric — and must NEVER claim a query it can't
  * answer exactly.
  */
class MetaAggPushdownSpec extends SparkSpec {

  private def metaNode(df: org.apache.spark.sql.DataFrame): Option[GraftMetaAggExec] =
    df.queryExecution.executedPlan.collectFirst { case g: GraftMetaAggExec => g }

  private def table(prefix: String, rows: Long = 1000L,
      statsCols: Seq[String] = Seq("id", "k")): String = {
    val s = spark
    import s.implicits._
    val t = s"${tmpDir(prefix)}/tbl"
    DataSkipping.writeWithStats(
      (0L until rows).map(i => (i, i % 50, s"v$i")).toDF("id", "k", "v")
        .repartitionByRange(8, col("id")), t, statsCols)
    t
  }

  test("global count/min/max over a graft view plans to the meta node and matches the scan") {
    val s = spark
    MetaAggPushdown.install(s)
    val t = table("graft_map1")
    DataSkipping.deleteWhereDV(s, t, col("id") % 11 === 7L)
    s.read.format("graft").load(t).createOrReplaceTempView("map1_v")

    val q = s.sql(
      "SELECT count(*) AS n, min(id) AS lo, max(id) AS hi FROM map1_v " +
        "WHERE id >= 100 AND id < 900")
    assert(metaNode(q).nonEmpty, q.queryExecution.executedPlan.toString)
    // collect(), not head(): head plans a separate LIMIT query whose
    // meta node is a different instance — its metrics would stay 0
    val r = q.collect()(0)
    val expect = (100L until 900L).filterNot(_ % 11 == 7)
    assert(r.getLong(0) === expect.size.toLong)
    assert(r.getLong(1) === expect.min)
    assert(r.getLong(2) === expect.max)

    // a clustered range count reads at most the boundary files: the
    // metric proves O(manifest), not O(table)
    val node = metaNode(q).get
    val scanned = node.metrics("scannedFiles").value
    val full = node.metrics("allMatchFiles").value
    assert(scanned <= 2, s"boundary files: $scanned")
    assert(full >= 1, s"stats-answered files: $full")

    // unfiltered count on a vector-bearing table still exact
    val q2 = s.sql("SELECT count(*) AS n FROM map1_v")
    assert(metaNode(q2).nonEmpty)
    assert(q2.head.getLong(0) === (0L until 1000L).count(_ % 11 != 7))
  }

  test("matches Spark's own aggregate on every answer shape (empty result, strings, mixed)") {
    val s = spark
    MetaAggPushdown.install(s)
    val t = table("graft_map2", statsCols = Seq("id", "k", "v"))
    s.read.format("graft").load(t).createOrReplaceTempView("map2_v")
    // empty match: count 0, min/max NULL — the global-aggregate
    // one-row contract
    val r = s.sql(
      "SELECT count(*) AS n, min(v) AS lo, max(v) AS hi FROM map2_v WHERE id < 0")
    assert(metaNode(r).nonEmpty)
    val row = r.head
    assert(row.getLong(0) === 0L && row.isNullAt(1) && row.isNullAt(2))
    // string min/max (internal UTF8String conversion)
    val r2 = s.sql("SELECT min(v) AS lo, max(v) AS hi FROM map2_v WHERE id < 10")
    assert(metaNode(r2).nonEmpty)
    assert(r2.head.getString(0) === "v0" && r2.head.getString(1) === "v9")
  }

  test("never claims what it can't answer exactly: fallthrough cases run Spark's aggregate") {
    val s = spark
    MetaAggPushdown.install(s)
    val t = table("graft_map3", rows = 200L)
    s.read.format("graft").load(t).createOrReplaceTempView("map3_v")
    def noMeta(sql: String): Unit = {
      val df = s.sql(sql)
      assert(metaNode(df).isEmpty, s"must NOT push down: $sql")
      df.collect() // and it still answers
    }
    noMeta("SELECT k, count(*) FROM map3_v GROUP BY k")            // grouped
    noMeta("SELECT count(DISTINCT k) FROM map3_v")                 // distinct
    noMeta("SELECT sum(id) FROM map3_v")                           // unsupported agg
    noMeta("SELECT count(v) FROM map3_v")                          // null-sensitive count
    noMeta("SELECT min(v) FROM map3_v")                            // v not stats-tracked
    noMeta("SELECT count(*) FROM map3_v WHERE id < rand() * 10")   // non-deterministic
    noMeta("SELECT count(*) FROM map3_v WHERE id IN (SELECT id FROM map3_v)") // subquery
    // time travel stays pinned to the full read path
    DataSkipping.deleteWhere(s, t, col("id") < 50L, vacuum = false)
    s.read.format("graft").option("versionAsOf", "0").load(t)
      .createOrReplaceTempView("map3_v0")
    val tt = s.sql("SELECT count(*) AS n FROM map3_v0")
    assert(metaNode(tt).isEmpty)
    assert(tt.head.getLong(0) === 200L)
    // current view DOES push down and sees the delete
    val cur = s.sql("SELECT count(*) AS n FROM map3_v")
    assert(metaNode(cur).nonEmpty)
    assert(cur.head.getLong(0) === 150L)
  }

  test("GROUP BY partition columns: per-partition counts answer from the manifest, DV-exact") {
    val s = spark
    import s.implicits._
    MetaAggPushdown.install(s)
    val t = s"${tmpDir("graft_mapg")}/tbl"
    val df = (0L until 1200L).map(i => (i, i % 6, s"v$i")).toDF("id", "p", "v")
    DataSkipping.writeWithStats(df.repartition(3), t, Seq("id"),
      bloomCols = Nil, partitionBy = Seq("p"))
    DataSkipping.deleteWhereDV(s, t, col("p") === 1L && col("id") < 600L)
    s.read.format("graft").load(t).createOrReplaceTempView("mapg_v")
    def grouped(df2: org.apache.spark.sql.DataFrame) =
      df2.queryExecution.executedPlan
        .collectFirst { case g: GraftMetaGroupCountExec => g }

    val q = s.sql(
      "SELECT p, count(*) AS n FROM mapg_v WHERE p >= 1 AND p % 2 = 1 GROUP BY p")
    assert(grouped(q).nonEmpty, q.queryExecution.executedPlan.toString)
    val rows = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // p=1 has 100 visible rows (100 dead via the vector), p=3/p=5 200
    assert(rows === Map(1L -> 100L, 3L -> 200L, 5L -> 200L), rows.toString)

    // a group whose visible count reaches zero DISAPPEARS (SQL
    // GROUP BY semantics)
    DataSkipping.deleteWhereDV(s, t, col("p") === 1L)
    s.catalog.refreshTable("mapg_v")
    val q2 = s.sql("SELECT p, count(*) AS n FROM mapg_v GROUP BY p")
    assert(grouped(q2).nonEmpty)
    val rows2 = q2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!rows2.contains(1L) && rows2(0L) === 200L && rows2.size === 5,
      rows2.toString)

    // fallthrough: non-partition grouping key, predicate touching a
    // data column, and a grouped MIN all run Spark's own aggregate
    def noMeta(sql: String): Unit = {
      val d = s.sql(sql)
      assert(grouped(d).isEmpty, s"must NOT push down: $sql")
      d.collect()
    }
    noMeta("SELECT v, count(*) FROM mapg_v GROUP BY v")
    noMeta("SELECT p, count(*) FROM mapg_v WHERE id < 100 GROUP BY p")
    noMeta("SELECT p, min(id) FROM mapg_v GROUP BY p")
    // parity with the real aggregate on the same query
    val real = s.read.format("graft").load(t)
      .filter("p >= 1 AND p % 2 = 1").groupBy("p").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pushed = s.sql(
      "SELECT p, count(*) AS n FROM mapg_v WHERE p >= 1 AND p % 2 = 1 GROUP BY p")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(real === pushed)
  }

  test("pushdown respects column mapping (rename) and catalog-name tables") {
    val s = spark
    MetaAggPushdown.install(s)
    val t = table("graft_map4", rows = 300L)
    DataSkipping.renameColumn(s, t, "k", "bucket")
    val n = "map4_" + java.util.UUID.randomUUID.toString.replace("-", "").take(10)
    s.sql(s"CREATE TABLE $n USING graft LOCATION '$t'")
    val q = s.sql(
      s"SELECT count(*) AS n, max(bucket) AS hi FROM $n WHERE bucket < 10")
    assert(metaNode(q).nonEmpty, q.queryExecution.executedPlan.toString)
    assert(q.head.getLong(0) === (0L until 300L).count(_ % 50 < 10))
    assert(q.head.getLong(1) === 9L)
    s.sql(s"DROP TABLE $n")
  }
}
