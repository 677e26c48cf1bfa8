package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The full conditional MERGE ([[DataSkipping.mergeInto]] /
  * [[GraftMergeBuilder]]): clause routing, first-match precedence,
  * by-source arms, untouched-file carry, CDF typing, idempotency,
  * column-mapping interplay.
  */
class MergeIntoSpec extends SparkSpec {

  import MergeClause._

  private def freshTable(prefix: String, changeFeed: Boolean = false): String = {
    val s = spark
    import s.implicits._
    val t = s"${tmpDir(prefix)}/t"
    // ids 0..399, key bands of 50 per file (8 files)
    val df = (0L until 400L).map(i => (i, s"e${i % 4}", i * 1.0))
      .toDF("id", "kind", "score")
    DataSkipping.writeWithStats(df.repartitionByRange(8, col("id")), t,
      Seq("id"), bloomCols = Nil, changeFeed = changeFeed)
    t
  }

  private def rows(t: String): Map[Long, (String, Double)] =
    DataSkipping.readSkipping(spark, t, lit(true)).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  test("conditional matched update/delete + conditional insert route rows correctly") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_mi1")
    // source: ids 10 (update path), 20 (delete path), 30 (no clause
    // fires -> carried), 1000 (insert, cond true), 2000 (insert, cond false)
    val src = Seq(
      (10L, "upd", 111.0), (20L, "del", 0.0), (30L, "noop", 5.0),
      (1000L, "new", 1.0), (2000L, "skipme", 2.0))
      .toDF("id", "kind", "score")
    val (u, d, i) = DataSkipping.mergeInto(s, t, src, Seq("id"), Seq(
      MatchedDelete(Some(col("s.kind") === "del")),
      MatchedUpdate(Some(col("s.kind") === "upd"),
        Map("score" -> col("s.score"), "kind" -> lit("updated"))),
      NotMatchedInsert(Some(col("s.kind") =!= "skipme"))))
    assert((u, d, i) == ((1L, 1L, 1L)))
    val m = rows(t)
    assert(m(10L) == (("updated", 111.0)))
    assert(!m.contains(20L))
    assert(m(30L) == (("e2", 30.0)), "no clause fired: carried unchanged")
    assert(m(1000L) == (("new", 1.0)))
    assert(!m.contains(2000L))
    assert(m.size == 400 - 1 + 1)
  }

  test("first matching clause wins: clause order decides") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_mi2")
    val src = Seq((10L, "x", 0.0)).toDF("id", "kind", "score")
    // delete-first: row 10 satisfies both clauses -> deleted
    DataSkipping.mergeInto(s, t, src, Seq("id"), Seq(
      MatchedDelete(None),
      MatchedUpdate(None, Map("score" -> lit(-1.0)))))
    assert(!rows(t).contains(10L))
    // update-first on another key order
    val t2 = freshTable("graft_mi2b")
    DataSkipping.mergeInto(s, t2, src, Seq("id"), Seq(
      MatchedUpdate(None, Map("score" -> lit(-1.0))),
      MatchedDelete(None)))
    assert(rows(t2)(10L)._2 == -1.0)
  }

  test("by-source arms: unmatched target rows update/delete by condition; matched rows are exempt") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_mi3")
    val src = Seq((55L, "keep", 55.0)).toDF("id", "kind", "score")
    val (u, d, i) = DataSkipping.mergeInto(s, t, src, Seq("id"), Seq(
      MatchedUpdate(None, Map("kind" -> lit("touched"))),
      BySourceDelete(Some(col("t.id") >= 390L)),           // 10 rows out
      BySourceUpdate(Some(col("t.id") < 5L),
        Map("kind" -> lit("stale")))))                     // 5 rows flagged
    assert((u, d, i) == ((6L, 10L, 0L)))
    val m = rows(t)
    assert(m.size == 390)
    assert(m(55L)._1 == "touched", "matched row exempt from by-source arms")
    assert((0L until 5L).forall(m(_)._1 == "stale"))
    assert(m(5L)._1 == "e1")
    assert(!m.contains(395L))
  }

  test("files with no acting row are carried verbatim, not rewritten") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_mi4")
    val fs = new Path(t).getFileSystem(s.sparkContext.hadoopConfiguration)
    def fileState = fs.listStatus(new Path(t)).filter(_.isFile)
      .map(f => (f.getPath.getName, f.getModificationTime)).toMap
    val before = fileState
    // touches only the file holding ids 0..49
    val src = Seq((7L, "z", 0.0)).toDF("id", "kind", "score")
    DataSkipping.mergeInto(s, t, src, Seq("id"), Seq(
      MatchedUpdate(None, Map("score" -> lit(7.7)))))
    val after = fileState
    val untouchedCarried = before.count { case (n, mt) => after.get(n).contains(mt) }
    assert(untouchedCarried >= 7, s"carried $untouchedCarried of ${before.size}")
    assert(rows(t)(7L)._2 == 7.7)
  }

  test("CDF records typed rows for every arm; txn stamp makes replay a no-op") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_mi5", changeFeed = true)
    val src = Seq((10L, "u", 10.5), (20L, "d", 0.0), (999L, "n", 9.0))
      .toDF("id", "kind", "score")
    def run() = DataSkipping.mergeInto(s, t, src, Seq("id"), Seq(
      MatchedDelete(Some(col("s.kind") === "d")),
      MatchedUpdate(None, Map("score" -> col("s.score"))),
      NotMatchedInsert(None),
      BySourceUpdate(Some(col("t.id") === 0L), Map("kind" -> lit("bs")))),
      txn = Some("mi5" -> 1L))
    assert(run() == ((2L, 1L, 1L))) // 10 + by-source 0 updated, 20 deleted, 999 inserted
    val feed = DataSkipping.readChangeFeed(s, t, 1L, Some(1L))
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(feed == Map("update_preimage" -> 2L, "update_postimage" -> 2L,
      "delete" -> 1L, "insert" -> 1L), feed.toString)
    // replay with the same stamp: detected no-op, no new generation
    val versions = DataSkipping.tableVersions(s, t)
    assert(run() == ((0L, 0L, 0L)))
    assert(DataSkipping.tableVersions(s, t) == versions)
    // a row 999 present now proves the replay did not double-insert
    assert(rows(t).size == 400 - 1 + 1)
  }

  test("builder API end-to-end; updateAll takes every source value; nothing-acts merges commit no generation") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_mi6")
    val src = Seq((15L, "cdc", 150.0), (777L, "cdc", 7.0))
      .toDF("id", "kind", "score")
    val (u, d, i) = GraftTable.forPath(s, t)
      .merge(src, Seq("id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    assert((u, d, i) == ((1L, 0L, 1L)))
    assert(rows(t)(15L) == (("cdc", 150.0)))
    assert(rows(t)(777L) == (("cdc", 7.0)))
    // a merge whose clauses fire on nothing commits no generation
    val versions = DataSkipping.tableVersions(s, t)
    val none = Seq((50000L, "x", 0.0)).toDF("id", "kind", "score")
    val (u2, d2, i2) = GraftTable.forPath(s, t).merge(none, Seq("id"))
      .whenMatchedDelete()
      .whenNotMatchedInsertAll(col("s.kind") === "never")
      .execute()
    assert((u2, d2, i2) == ((0L, 0L, 0L)))
    assert(DataSkipping.tableVersions(s, t) == versions)
  }

  test("mergeInto on a column-mapped table: logical names in clauses and source") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_mi7")
    DataSkipping.renameColumn(s, t, "score", "points")
    val src = Seq((10L, "u", 99.0), (888L, "n", 8.0))
      .toDF("id", "kind", "points")
    val (u, d, i) = DataSkipping.mergeInto(s, t, src, Seq("id"), Seq(
      MatchedUpdate(Some(col("s.points") > col("t.points")),
        Map("points" -> col("s.points"))),
      NotMatchedInsert(None)))
    assert((u, d, i) == ((1L, 0L, 1L)))
    val m = DataSkipping.readSkipping(s, t, lit(true)).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(10L) == 99.0)
    assert(m(888L) == 8.0)
  }

  test("GraftTable fluent surface covers the r11 ops: reorgPurge, generated/identity DDL, autoCompact") {
    val s = spark
    import s.implicits._
    val t = freshTable("gt_r11")
    val gt = GraftTable.forPath(s, t)
    // merge-on-read delete then purge through the handle
    assert(DataSkipping.deleteWhereDV(s, t, col("id") < 20L) === 20L)
    assert(gt.reorgPurge() === 20L)
    assert(gt.toDF.count() === 380L)
    // generated + identity declarations chain fluently
    gt.addGeneratedColumn("kind", "concat('e', CAST(id % 4 AS STRING))")
      .dropGeneratedColumn("kind")
    gt.addIdentityColumn("id", start = 0L, step = 1L)
    assert(DataSkipping.tableIdentityColumns(s, t)("id")._3 === 400L)
    gt.dropIdentityColumn("id")
    // autoCompact through the handle: threshold respected
    assert(!gt.autoCompact(minSmallFiles = 64))
    assert(gt.autoCompact(minSmallFiles = 2))
    assert(gt.toDF.count() === 380L)
  }
}
