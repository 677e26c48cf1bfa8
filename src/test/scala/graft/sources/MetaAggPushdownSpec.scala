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
    noMeta("SELECT k, count(*) FROM map3_v GROUP BY k")            // grouped (k not a partition col)
    noMeta("SELECT count(DISTINCT k) FROM map3_v")                 // distinct
    noMeta("SELECT sum(id) FROM map3_v")                           // unsupported agg
    noMeta("SELECT count(v) FROM map3_v")                          // v not null-count-tracked
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
    noMeta("SELECT p, min(v) FROM mapg_v GROUP BY p") // v not stats-tracked
    // parity with the real aggregate on the same query
    val real = s.read.format("graft").load(t)
      .filter("p >= 1 AND p % 2 = 1").groupBy("p").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pushed = s.sql(
      "SELECT p, count(*) AS n FROM mapg_v WHERE p >= 1 AND p % 2 = 1 GROUP BY p")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(real === pushed)
  }

  test("COUNT(col) pushdown: n_rows − nullCount from the manifest; DV demotes; fallthroughs hold") {
    val s = spark
    import s.implicits._
    MetaAggPushdown.install(s)
    val t = s"${tmpDir("graft_mapcc")}/tbl"
    val df = (0L until 1000L).map(i =>
      (i, i % 50, if (i % 7 == 0) None else Some(i * 2.0)))
      .toDF("id", "k", "x")
    DataSkipping.writeWithStats(df.repartitionByRange(8, col("id")), t,
      Seq("id", "x"))
    s.read.format("graft").load(t).createOrReplaceTempView("mapcc_v")
    val q = s.sql("SELECT count(x) AS nn, count(*) AS n FROM mapcc_v " +
      "WHERE id >= 100 AND id < 900")
    assert(metaNode(q).nonEmpty, q.queryExecution.executedPlan.toString)
    val r = q.collect()(0)
    assert(r.getLong(0) === (100L until 900L).count(_ % 7 != 0))
    assert(r.getLong(1) === 800L)
    // O(manifest): count(*) and count(x) each scan at most the two
    // boundary files of the clustered range
    assert(metaNode(q).get.metrics("scannedFiles").value <= 4)
    // DV delete: vector-bearing files demote to a scan (a dead row's
    // nullity is unknowable from stats) — still exact
    DataSkipping.deleteWhereDV(s, t, col("id") % 10 === 0L)
    val q2 = s.sql("SELECT count(x) AS nn FROM mapcc_v")
    assert(metaNode(q2).nonEmpty)
    assert(q2.head.getLong(0) ===
      (0L until 1000L).count(i => i % 10 != 0 && i % 7 != 0))
    // fallthroughs: DISTINCT, FILTER clause, untracked column
    def noMeta(sql: String): Unit = {
      val d = s.sql(sql)
      assert(metaNode(d).isEmpty, s"must NOT push down: $sql")
      d.collect()
    }
    noMeta("SELECT count(DISTINCT x) FROM mapcc_v")
    noMeta("SELECT count(x) FILTER (WHERE id < 10) FROM mapcc_v")
    noMeta("SELECT count(k) FROM mapcc_v") // k not null-count-tracked
    // count(NULL) is 0 per SQL — never the row count (the r15 advice
    // bug: a NULL literal matched the COUNT(*) rewrite)
    val cn = s.sql("SELECT count(NULL) AS z FROM mapcc_v")
    assert(metaNode(cn).isEmpty)
    assert(cn.head.getLong(0) === 0L)
  }

  test("grouped MIN/MAX and COUNT(col) answer from per-file stats; DV demotes to a scan") {
    val s = spark
    import s.implicits._
    MetaAggPushdown.install(s)
    val t = s"${tmpDir("graft_mapgm")}/tbl"
    val df = (0L until 1200L).map(i =>
      (i, i % 6, if (i % 5 == 0) None else Some(i * 1.5), s"v$i"))
      .toDF("id", "p", "x", "v")
    DataSkipping.writeWithStats(df.repartition(3), t, Seq("id", "x"),
      bloomCols = Nil, partitionBy = Seq("p"))
    // partial DV delete inside p=2: that partition's files demote to
    // the scan side while the others answer from the manifest
    DataSkipping.deleteWhereDV(s, t, col("p") === 2L && col("id") % 4 === 0L)
    s.read.format("graft").load(t).createOrReplaceTempView("mapgm_v")
    def grouped(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan
        .collectFirst { case g: GraftMetaGroupCountExec => g }
    val q = s.sql("SELECT p, count(*) AS n, count(x) AS nn, " +
      "min(id) AS lo, max(id) AS hi FROM mapgm_v WHERE p < 4 GROUP BY p")
    assert(grouped(q).nonEmpty, q.queryExecution.executedPlan.toString)
    val live = (0L until 1200L).filterNot(i => i % 6 == 2 && i % 4 == 0)
    val expect = live.filter(_ % 6 < 4).groupBy(_ % 6).map { case (p, ids) =>
      p -> ((ids.size.toLong, ids.count(_ % 5 != 0).toLong, ids.min, ids.max))
    }
    val got = q.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expect, s"got $got expect $expect")
    // count(v): v untracked → the whole grouped plan falls through
    val fv = s.sql("SELECT p, count(v) FROM mapgm_v GROUP BY p")
    assert(grouped(fv).isEmpty)
    fv.collect()
    // count(NULL) grouped: never the row count
    val gz = s.sql("SELECT p, count(NULL) AS z FROM mapgm_v GROUP BY p")
    assert(grouped(gz).isEmpty)
    assert(gz.collect().forall(_.getLong(1) === 0L))
  }

  test("GROUP BY a strict subset of multi-column partition keys merges the unqueried dimension") {
    val s = spark
    import s.implicits._
    MetaAggPushdown.install(s)
    val t = s"${tmpDir("graft_mapsub")}/tbl"
    val df = (0L until 1200L).map(i =>
      (i, i % 3, i % 4, if (i % 5 == 0) None else Some(i * 2.0)))
      .toDF("id", "p", "q", "x")
    DataSkipping.writeWithStats(df.repartition(2), t, Seq("id", "x"),
      bloomCols = Nil, partitionBy = Seq("p", "q"))
    DataSkipping.deleteWhereDV(s, t, col("p") === 1L && col("id") % 8 === 0L)
    s.read.format("graft").load(t).createOrReplaceTempView("mapsub_v")
    def grouped(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan
        .collectFirst { case g: GraftMetaGroupCountExec => g }
    val live = (0L until 1200L).filterNot(i => i % 3 == 1 && i % 8 == 0)
    // GROUP BY p alone on a (p,q)-partitioned table: one row per p,
    // never one per (p,q) — the r16 advice bug (partitionGroupAggs
    // grouped by ALL partition columns)
    val q1 = s.sql("SELECT p, count(*) AS n, count(x) AS nn, " +
      "min(id) AS lo, max(id) AS hi FROM mapsub_v GROUP BY p")
    assert(grouped(q1).nonEmpty, q1.queryExecution.executedPlan.toString)
    val got1 = q1.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val exp1 = live.groupBy(_ % 3).map { case (p, is) =>
      p -> ((is.size.toLong, is.count(_ % 5 != 0).toLong, is.min, is.max)) }
    assert(got1 === exp1, s"got $got1 expect $exp1")
    // the predicate may reference a partition column that is NOT a
    // grouping key
    val q2 = s.sql(
      "SELECT q, count(*) AS n FROM mapsub_v WHERE p = 2 GROUP BY q")
    assert(grouped(q2).nonEmpty)
    val got2 = q2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp2 = live.filter(_ % 3 == 2).groupBy(_ % 4).map { case (k, is) =>
      k -> is.size.toLong }
    assert(got2 === exp2, s"got $got2 expect $exp2")
    // a grouping key that never reaches the output list still groups
    // (SELECT count(*) ... GROUP BY p yields one row per p)
    val q3 = s.sql("SELECT count(*) AS n FROM mapsub_v GROUP BY p")
    assert(grouped(q3).nonEmpty)
    assert(q3.collect().map(_.getLong(0)).sorted.toSeq ===
      exp1.values.map(_._1).toSeq.sorted, "hidden-key grouping")
    // full-key grouping still exact (no regression from the fix)
    val q4 = s.sql("SELECT p, q, count(*) AS n FROM mapsub_v GROUP BY p, q")
    assert(grouped(q4).nonEmpty)
    val got4 = q4.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exp4 = live.groupBy(i => (i % 3, i % 4)).map { case (k, is) =>
      k -> is.size.toLong }
    assert(got4 === exp4)
  }

  test("nested struct paths push down: global and grouped metadata aggregates") {
    val s = spark
    import s.implicits._
    MetaAggPushdown.install(s)
    val t = s"${tmpDir("graft_mapns")}/tbl"
    val df = (0L until 800L).map(i => (i, i % 4,
      (i % 100, if (i % 9 == 0) None else Some(i * 1.0))))
      .toDF("id", "p", "m0")
      .select(col("id"), col("p"),
        struct(col("m0._1").as("uid"), col("m0._2").as("v")).as("m"))
    DataSkipping.writeWithStats(df.repartition(2), t,
      Seq("id", "m.uid", "m.v"), bloomCols = Nil, partitionBy = Seq("p"))
    s.read.format("graft").load(t).createOrReplaceTempView("mapns_v")
    // global: min/max/count over struct paths answer from the
    // nested per-file stats
    val g = s.sql("SELECT count(*) AS n, count(m.v) AS nn, " +
      "min(m.uid) AS lo, max(m.uid) AS hi FROM mapns_v")
    assert(metaNode(g).nonEmpty, g.queryExecution.executedPlan.toString)
    val r = g.collect()(0)
    assert(r.getLong(0) === 800L)
    assert(r.getLong(1) === (0L until 800L).count(_ % 9 != 0))
    assert(r.getLong(2) === 0L && r.getLong(3) === 99L)
    // grouped over partition columns with nested targets
    val gr = s.sql("SELECT p, min(m.uid) AS lo, count(m.v) AS nn " +
      "FROM mapns_v GROUP BY p")
    assert(gr.queryExecution.executedPlan
      .collectFirst { case g2: GraftMetaGroupCountExec => g2 }.nonEmpty,
      gr.queryExecution.executedPlan.toString)
    val got = gr.collect().map(x => x.getLong(0) ->
      ((x.getLong(1), x.getLong(2)))).toMap
    val expect = (0L until 800L).groupBy(_ % 4).map { case (p, is) =>
      p -> ((is.map(_ % 100).min, is.count(_ % 9 != 0).toLong))
    }
    assert(got === expect, s"got $got expect $expect")
    // the whole struct is not a tracked stats key — falls through
    val f = s.sql("SELECT min(m) FROM mapns_v")
    assert(metaNode(f).isEmpty)
    f.collect()
  }

  test("randomized parity: grouped pushdown equals the real aggregate under random DVs") {
    val s = spark
    import s.implicits._
    MetaAggPushdown.install(s)
    val rnd = new scala.util.Random(20260816L)
    (1 to 4).foreach { round =>
      val t = s"${tmpDir(s"graft_mapr$round")}/tbl"
      val nParts = 2 + rnd.nextInt(5)
      val n = 500 + rnd.nextInt(1500)
      val nullEvery = 2 + rnd.nextInt(9)
      val df = (0L until n.toLong).map(i => (i, i % nParts,
        if (i % nullEvery == 0) None else Some(i * 0.5)))
        .toDF("id", "p", "x")
      DataSkipping.writeWithStats(df.repartition(1 + rnd.nextInt(4)), t,
        Seq("id", "x"), bloomCols = Nil, partitionBy = Seq("p"))
      if (rnd.nextBoolean()) {
        val m = 2 + rnd.nextInt(7)
        DataSkipping.deleteWhereDV(s, t,
          col("id") % m === rnd.nextInt(m).toLong)
      }
      s.read.format("graft").load(t).createOrReplaceTempView(s"mapr_v$round")
      val lo = rnd.nextInt(nParts)
      val q = s.sql(s"SELECT p, count(*) AS n, count(x) AS nn, " +
        s"min(id) AS mn, max(x) AS mx FROM mapr_v$round WHERE p >= $lo GROUP BY p")
      assert(q.queryExecution.executedPlan
        .collectFirst { case g: GraftMetaGroupCountExec => g }.nonEmpty,
        s"round $round must push down")
      def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      // baseline: the SAME aggregate over the manifest read path (a
      // ManifestFileIndex relation — the strategy never claims it)
      val expect = DataSkipping.readSkipping(s, t, lit(true))
        .filter(col("p") >= lo.toLong).groupBy("p")
        .agg(count(lit(1)), count(col("x")), min("id"), max("x"))
        .collect().map(key).toMap
      val got = q.collect().map(key).toMap
      assert(got === expect, s"round $round: got $got expect $expect")
    }
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
