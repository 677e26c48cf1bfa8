package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The lazy-scan rewrite ([[GraftScanRewrite]] +
  * [[SkippingFileIndex]]) on the catalog/`format("graft")` surface:
  * name-addressed reads plan as standard file scans whose listing
  * evaluates the manifest under the query's own filters — nested
  * predicates prune (SURVEY §7.2b(i)), Spark's native dynamic
  * partition pruning fires on name-addressed joins, and every result
  * stays byte-equal to the eager path-API read.
  */
class GraftScanRewriteSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lazy").toString

  // walk THROUGH adaptive wrappers and query stages — scans hide
  // inside both once AQE re-plans
  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] =
    p.flatMap {
      case f: FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fileScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        fileScans(q.plan)
      case _ => Nil
    }.toSeq

  private def fileScan(df: DataFrame): FileSourceScanExec =
    fileScans(df.queryExecution.executedPlan).headOption.getOrElse(fail(
      s"expected a FileSourceScanExec:\n${df.queryExecution.executedPlan}"))

  test("name-addressed read plans a file scan; flat predicates prune files at listing time") {
    val s = spark
    import s.implicits._
    val dir = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 2000L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartitionByRange(8, col("id")), dir, Seq("id"))
    s.read.format("graft").load(dir).createOrReplaceTempView("lazy_v")
    val q = s.sql("SELECT id, v FROM lazy_v WHERE id >= 500 AND id < 750")
    val rows = q.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === (500L until 750L))
    // the plan is a standard file scan (not the V1 opaque RDD), and
    // the lazy index kept a strict subset of the 8 files
    val scan = fileScan(q)
    assert(scan.metrics("numFiles").value < 8,
      s"files=${scan.metrics("numFiles").value}")
    // unfiltered read sees everything
    assert(s.sql("SELECT count(v) FROM lazy_v").head.getLong(0) === 2000L)
  }

  test("NESTED struct-path predicate prunes through spark.table — the V1 surface gap, closed") {
    val s = spark
    import s.implicits._
    val dir = s"${tmp()}/t"
    val df = (0L until 1600L).map(i => (i, (i % 400, i * 1.0)))
      .toDF("id", "m0")
      .select(col("id"),
        struct(col("m0._1").as("uid"), col("m0._2").as("w")).as("m"))
    DataSkipping.writeWithStats(df.repartitionByRange(8, col("m.uid")), dir,
      Seq("id", "m.uid", "m.w"))
    val n = "lazy_nested_" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(8)
    s.sql(s"CREATE TABLE $n USING graft LOCATION '$dir'")
    try {
      val q = s.sql(s"SELECT id, m.uid AS uid FROM $n " +
        "WHERE m.uid >= 100 AND m.uid < 150")
      val got = q.collect().map(_.getLong(0)).sorted.toSeq
      val expect = (0L until 1600L).filter(i => i % 400 >= 100 && i % 400 < 150)
      assert(got === expect)
      val scan = fileScan(q)
      assert(scan.metrics("numFiles").value < 8,
        s"nested predicate must prune files: ${scan.metrics("numFiles").value}/8")
    } finally s.sql(s"DROP TABLE $n")
  }

  test("native dynamic partition pruning fires on a name-addressed fact-dim join") {
    val s = spark
    import s.implicits._
    val fact = s"${tmp()}/fact"
    DataSkipping.writeWithStats(
      (0L until 4000L).map(i => (i, i % 20, i * 2.0)).toDF("id", "p", "x")
        .repartition(2), fact, Seq("id", "x"),
      bloomCols = Nil, partitionBy = Seq("p"))
    val fn = "lazy_fact_" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(8)
    s.sql(s"CREATE TABLE $fn USING graft LOCATION '$fact'")
    // the dim must be a REAL table: a local view's filter constant-
    // folds into the LocalRelation and DPP sees no selective predicate
    val dimDir = s"${tmp()}/dim"
    (0L until 20L).map(i => (i, s"d$i")).toDF("p", "name")
      .write.parquet(dimDir)
    s.read.parquet(dimDir).createOrReplaceTempView("lazy_dim")
    try {
      val q = s.sql(s"SELECT f.id, d.name FROM $fn f JOIN lazy_dim d " +
        "ON f.p = d.p WHERE d.name IN ('d3', 'd7')")
      val rows = q.collect()
      assert(rows.length === (0L until 4000L).count(i => i % 20 == 3 || i % 20 == 7))
      // the executed plan carries a dynamic pruning subquery on the
      // fact scan, and it pruned real files at runtime
      val scan = fileScans(q.queryExecution.executedPlan).find(
        _.partitionFilters.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
            .DynamicPruningExpression])))
        .getOrElse(fail("expected a dynamically-pruned file scan:\n" +
          q.queryExecution.executedPlan.toString))
      val total = DataSkipping.readManifest(s, fact).count()
      assert(scan.metrics("numFiles").value < total,
        s"DPP must prune: ${scan.metrics("numFiles").value} of $total files read")
    } finally s.sql(s"DROP TABLE $fn")
  }

  test("parity with the eager path API: column mapping, deletion vector, time travel") {
    val s = spark
    import s.implicits._
    val dir = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 900L).map(i => (i, i % 30, s"v$i")).toDF("id", "k", "v")
        .repartitionByRange(4, col("id")), dir, Seq("id", "k"))
    DataSkipping.deleteWhereDV(s, dir, col("id") % 7 === 2L)
    DataSkipping.renameColumn(s, dir, "v", "label")
    s.read.format("graft").load(dir).createOrReplaceTempView("lazy_par")
    // logical names served; DV applied; values match the eager read
    val got = s.sql("SELECT id, label FROM lazy_par WHERE k < 5")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = DataSkipping.readSkipping(s, dir, col("k") < 5L)
      .select("id", "label")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === expect && got.nonEmpty)
    // time travel stays correct (and pre-rename names apply)
    val v0 = s.read.format("graft").option("versionAsOf", "0").load(dir)
    assert(v0.columns.contains("v"))
    assert(v0.count() === 900L)
    assert(v0.filter(col("id") === 2L).select("v").head.getString(0) === "v2")
  }

  test("metadata aggregate pushdown still claims its plans under the rewrite") {
    val s = spark
    import s.implicits._
    val dir = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 1000L).map(i => (i, i * 1.0)).toDF("id", "x")
        .repartitionByRange(4, col("id")), dir, Seq("id", "x"))
    s.read.format("graft").load(dir).createOrReplaceTempView("lazy_meta")
    // extensions-installed session: no MetaAggPushdown.install call
    val q = s.sql("SELECT count(*) AS n, min(id) AS lo, max(x) AS hi " +
      "FROM lazy_meta WHERE id >= 100 AND id < 600")
    assert(q.queryExecution.executedPlan.collectFirst {
      case g: GraftMetaAggExec => g
    }.nonEmpty, q.queryExecution.executedPlan.toString)
    val r = q.collect()(0)
    assert(r.getLong(0) === 500L && r.getLong(1) === 100L)
    assert(r.getDouble(2) === 599.0)
    // a non-claimable aggregate over the same view takes the lazy
    // scan and still answers exactly
    val sums = s.sql("SELECT sum(id) AS t FROM lazy_meta WHERE id < 100")
    assert(sums.queryExecution.executedPlan.collectFirst {
      case g: GraftMetaAggExec => g }.isEmpty)
    assert(sums.head.getLong(0) === (0L until 100L).sum)
  }

  test("INSERT INTO / OVERWRITE keep working with the rewrite installed") {
    val s = spark
    import s.implicits._
    val dir = s"${tmp()}/t"
    DataSkipping.writeWithStats(
      (0L until 50L).map(i => (i, s"a$i")).toDF("id", "v"), dir, Seq("id"))
    val n = "lazy_ins_" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(8)
    s.sql(s"CREATE TABLE $n USING graft LOCATION '$dir'")
    try {
      s.sql(s"INSERT INTO $n SELECT id + 100, concat('b', id) FROM range(10)")
      assert(s.table(n).count() === 60L)
      // self-reading overwrite through SQL — the write job reads the
      // intact old table, the commit is one generation
      s.sql(s"INSERT OVERWRITE $n SELECT id, v FROM $n WHERE id < 30")
      s.catalog.refreshTable(n)
      assert(s.table(n).count() === 30L)
      assert(DataSkipping.describeHistory(s, dir)
        .filter(col("operation") === "OVERWRITE").count() >= 1L)
    } finally s.sql(s"DROP TABLE $n")
  }
}
