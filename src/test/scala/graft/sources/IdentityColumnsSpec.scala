package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Identity columns ([[DataSkipping.addIdentityColumn]]): engine-
  * assigned dense ids on append, watermark monotonicity across
  * appends / DML / restore, GENERATED ALWAYS enforcement.
  */
class IdentityColumnsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_idc").toString

  /** Base table: 100 rows with bootstrap ids 1000, 1002, ... */
  private def build(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import s.implicits._
    DataSkipping.writeWithStats(
      (0L until 100L).map(i => (1000L + 2 * i, i * 7))
        .toDF("row_id", "v")
        .repartitionByRange(4, col("row_id")),
      dir, Seq("row_id"))
  }

  test("appends omitting the column get dense grid ids past the bootstrap max") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    build(s, dir)
    DataSkipping.addIdentityColumn(s, dir, "row_id", start = 1000L, step = 2L)
    // bootstrap max = 1198 -> next grid point 1200
    assert(DataSkipping.tableIdentityColumns(s, dir) ===
      Map("row_id" -> ((1000L, 2L, 1200L))))

    // two appends, both multi-partition, both omitting row_id
    assert(DataSkipping.appendWithStats(
      (0L until 37L).map(i => i * 3).toDF("v").repartition(5),
      dir, Seq("row_id")))
    assert(DataSkipping.appendWithStats(
      (0L until 11L).map(i => i + 500).toDF("v").repartition(3),
      dir, Seq("row_id")))

    val ids = DataSkipping.readSkipping(s, dir, col("row_id") >= 1200L)
      .select("row_id").as[Long].collect().sorted
    assert(ids.length === 48)
    // dense on the grid: exactly 1200, 1202, ..., 1294
    assert(ids.toSeq === (0L until 48L).map(1200L + 2 * _))
    // batch boundary: first append took [1200, 1274), second [1274, 1296)
    assert(DataSkipping.tableIdentityColumns(s, dir)("row_id")._3 === 1296L)
    val batch2 = DataSkipping.readSkipping(s, dir, col("row_id") >= 1274L)
      .select("v").as[Long].collect().sorted
    assert(batch2.toSeq === (0L until 11L).map(_ + 500L))
  }

  test("GENERATED ALWAYS: a batch supplying the column is refused; UPDATE cannot assign it") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    build(s, dir)
    DataSkipping.addIdentityColumn(s, dir, "row_id", 1000L, 2L)
    val e = intercept[IllegalArgumentException] {
      DataSkipping.appendWithStats(
        Seq((5000L, 1L)).toDF("row_id", "v"), dir, Seq("row_id"))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      DataSkipping.updateWhere(s, dir, col("v") === 0L,
        Map("row_id" -> lit(9999L)))
    }
    assert(e2.getMessage.contains("identity"), e2.getMessage)
    // updating OTHER columns is fine; ids carry verbatim
    DataSkipping.updateWhere(s, dir, col("v") === 7L, Map("v" -> lit(700L)))
    assert(DataSkipping.readSkipping(s, dir, col("v") === 700L)
      .select("row_id").as[Long].head() === 1002L)
  }

  test("declaration preconditions: missing column, wrong type, double declare, zero step") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    build(s, dir)
    intercept[IllegalArgumentException] {
      DataSkipping.addIdentityColumn(s, dir, "nope")
    }
    intercept[IllegalArgumentException] {
      DataSkipping.addIdentityColumn(s, dir, "row_id", step = 0L)
    }
    DataSkipping.addIdentityColumn(s, dir, "row_id", 1000L, 2L)
    intercept[IllegalArgumentException] {
      DataSkipping.addIdentityColumn(s, dir, "row_id", 1000L, 2L)
    }
    DataSkipping.dropIdentityColumn(s, dir, "row_id")
    assert(DataSkipping.tableIdentityColumns(s, dir).isEmpty)
    // after drop: omitting the column is a plain schema error again
    intercept[Exception] {
      DataSkipping.appendWithStats(Seq(1L).toDF("v"), dir, Seq("row_id"))
    }
  }

  test("negative step allocates downward past the bootstrap min") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    DataSkipping.writeWithStats(
      Seq((0L, "a"), (-5L, "b")).toDF("k", "t"), dir, Seq("k"))
    DataSkipping.addIdentityColumn(s, dir, "k", start = 0L, step = -5L)
    assert(DataSkipping.tableIdentityColumns(s, dir)("k")._3 === -10L)
    DataSkipping.appendWithStats(Seq("c", "d").toDF("t"), dir, Seq("k"))
    val ks = DataSkipping.readSkipping(s, dir, col("k") < -5L)
      .select("k").as[Long].collect().sorted
    assert(ks.toSeq === Seq(-15L, -10L))
  }

  test("watermark never rewinds: survives DML rewrites, clone, restore; replayed named commits do not burn ids") {
    val s = spark
    import s.implicits._
    val dir = tmp() + "/src"
    build(s, dir)
    DataSkipping.addIdentityColumn(s, dir, "row_id", 1000L, 2L)
    DataSkipping.appendWithStats(
      (0L until 10L).map(i => i).toDF("v"), dir, Seq("row_id"),
      commitName = Some("batch-a"))
    assert(DataSkipping.tableIdentityColumns(s, dir)("row_id")._3 === 1220L)
    // replay of the same named commit: no data, no watermark burn
    assert(!DataSkipping.appendWithStats(
      (0L until 10L).map(i => i).toDF("v"), dir, Seq("row_id"),
      commitName = Some("batch-a")))
    assert(DataSkipping.tableIdentityColumns(s, dir)("row_id")._3 === 1220L)
    // a DELETE generation carries the declaration + watermark forward
    DataSkipping.deleteWhere(s, dir, col("row_id") >= 1200L)
    assert(DataSkipping.tableIdentityColumns(s, dir)("row_id")._3 === 1220L)
    // restore rewinds content (batch-a rows come back — they extend
    // the restored generation) but NOT the watermark: ids never
    // reissue, the next append continues at 1220
    val versions = DataSkipping.tableVersions(s, dir)
    DataSkipping.restoreTable(s, dir, versions.min)
    assert(DataSkipping.tableIdentityColumns(s, dir)("row_id")._3 === 1220L)
    DataSkipping.appendWithStats(Seq(1L).toDF("v"), dir, Seq("row_id"))
    assert(DataSkipping.readSkipping(s, dir, col("row_id") >= 1200L)
      .select("row_id").as[Long].collect().sorted.toSeq ===
      ((0L until 10L).map(1200L + 2 * _) :+ 1220L))
    // clone carries spec + watermark
    val cl = tmp() + "/clone"
    DataSkipping.cloneTable(s, dir, cl)
    assert(DataSkipping.tableIdentityColumns(s, cl)("row_id")._3 === 1222L)
  }
}
