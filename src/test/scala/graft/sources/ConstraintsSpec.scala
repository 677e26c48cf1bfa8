package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CHECK constraints ([[DataSkipping.addCheckConstraint]] and the
  * staged-write enforcement choke point).
  */
class ConstraintsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_chk").toString

  private def build(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import s.implicits._
    DataSkipping.writeWithStats(
      (0L until 1000L).map(i => (i, i * 2, s"p$i")).toDF("id", "v", "payload")
        .repartitionByRange(4, col("id")),
      dir, Seq("id"))
  }

  test("add validates existing rows; a violating table is refused; drop works") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    build(s, dir)
    DataSkipping.addCheckConstraint(s, dir, "v_even", "v % 2 = 0")
    assert(DataSkipping.tableConstraints(s, dir) === Map("v_even" -> "v % 2 = 0"))
    // all existing v are even but not all < 100: refused loudly,
    // nothing registered
    val e = intercept[IllegalArgumentException] {
      DataSkipping.addCheckConstraint(s, dir, "v_small", "v < 100")
    }
    assert(e.getMessage.contains("violate"))
    assert(DataSkipping.tableConstraints(s, dir).keySet === Set("v_even"))
    // duplicate name refused; bad expression refused before writing
    intercept[IllegalArgumentException] {
      DataSkipping.addCheckConstraint(s, dir, "v_even", "v > 0")
    }
    intercept[Exception] {
      DataSkipping.addCheckConstraint(s, dir, "broken", "no_such_col > 0")
    }
    assert(DataSkipping.tableConstraints(s, dir).keySet === Set("v_even"))
    DataSkipping.dropCheckConstraint(s, dir, "v_even")
    assert(DataSkipping.tableConstraints(s, dir).isEmpty)
    intercept[IllegalArgumentException] {
      DataSkipping.dropCheckConstraint(s, dir, "v_even")
    }
  }

  test("a violating append aborts with the table untouched; a valid one lands") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    build(s, dir)
    DataSkipping.addCheckConstraint(s, dir, "v_even", "v % 2 = 0")
    val e = intercept[IllegalArgumentException] {
      DataSkipping.appendWithStats(
        Seq((5000L, 7L, "odd"), (5001L, 8L, "even"))
          .toDF("id", "v", "payload"), dir, Seq("id"))
    }
    assert(e.getMessage.contains("v_even") && e.getMessage.contains("1 row"))
    assert(DataSkipping.readSkipping(s, dir, lit(true)).count() === 1000L,
      "nothing may commit from a violating batch")
    assert(DataSkipping.appendWithStats(
      Seq((5000L, 6L, "fine")).toDF("id", "v", "payload"), dir, Seq("id")))
    assert(DataSkipping.readSkipping(s, dir, lit(true)).count() === 1001L)
  }

  test("DML enforcement: violating UPDATE/MERGE abort; deletes and valid ops pass") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    build(s, dir)
    DataSkipping.addCheckConstraint(s, dir, "v_even", "v % 2 = 0")
    // UPDATE SET making v odd: refused, no new generation
    intercept[IllegalArgumentException] {
      DataSkipping.updateWhere(s, dir, col("id") < 10L,
        Map("v" -> (col("v") + 1L)))
    }
    assert(DataSkipping.tableVersions(s, dir) === Seq(0L))
    // MERGE with a violating source row: refused
    intercept[IllegalArgumentException] {
      DataSkipping.mergeUpsert(s, dir,
        Seq((3L, 7L, "x")).toDF("id", "v", "payload"), Seq("id"))
    }
    // DV UPDATE violating: refused
    intercept[IllegalArgumentException] {
      DataSkipping.updateWhereDV(s, dir, col("id") === 5L,
        Map("v" -> lit(9L)))
    }
    assert(DataSkipping.tableVersions(s, dir) === Seq(0L))
    // valid ops all land
    assert(DataSkipping.updateWhere(s, dir, col("id") < 10L,
      Map("v" -> (col("v") + 2L))) === 10L)
    assert(DataSkipping.deleteWhere(s, dir, col("id") === 999L) === 1L)
    assert(DataSkipping.deleteWhereDV(s, dir, col("id") === 998L) === 1L)
    val (m, i) = DataSkipping.mergeUpsert(s, dir,
      Seq((3L, 100L, "x")).toDF("id", "v", "payload"), Seq("id"))
    assert(m === 1L && i === 0L)
  }

  test("NULL passes CHECK (SQL semantics); monitoring-only constraints report counts") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    DataSkipping.writeWithStats(
      (0L until 100L).map(i =>
        (i, if (i % 10 == 0) None else Some(i))).toDF("id", "v")
        .repartitionByRange(2, col("id")),
      dir, Seq("id"))
    // v > 0 is NULL for the None rows and FALSE only for v = 0...
    // v=0 is a None row here, so only validation of TRUE/NULL rows:
    // passes
    DataSkipping.addCheckConstraint(s, dir, "v_pos", "v > 0")
    // appending a NULL v passes; a zero v violates
    assert(DataSkipping.appendWithStats(
      Seq((200L, None: Option[Long])).toDF("id", "v"), dir, Seq("id")))
    intercept[IllegalArgumentException] {
      DataSkipping.appendWithStats(
        Seq((201L, Some(0L))).toDF("id", "v"), dir, Seq("id"))
    }
    // monitoring-only registration on a violating table + live counts
    DataSkipping.addCheckConstraint(s, dir, "v_big", "v >= 50",
      validate = false)
    val counts = DataSkipping.constraintViolations(s, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("v_pos") === 0L)
    // v in 1..49 minus the None rows (multiples of 10): 49 - 4 = 45
    assert(counts("v_big") === 45L)
  }

  test("constraints ride generations: compaction, restore, and schema-evolved appends") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    build(s, dir)
    DataSkipping.addCheckConstraint(s, dir, "v_even", "v % 2 = 0")
    DataSkipping.deleteWhere(s, dir, col("id") < 100L)          // v1
    DataSkipping.compactTable(s, dir, targetFileBytes = 1L << 30) // v2
    assert(DataSkipping.tableConstraints(s, dir).keySet === Set("v_even"),
      "constraints must survive generation commits")
    intercept[IllegalArgumentException] {
      DataSkipping.appendWithStats(
        Seq((9000L, 3L, "odd")).toDF("id", "v", "payload"), dir, Seq("id"))
    }
    DataSkipping.restoreTable(s, dir, 0L)                        // v3
    assert(DataSkipping.tableConstraints(s, dir).keySet === Set("v_even"),
      "restore carries the CURRENT constraint set")
    // an evolution batch OMITTING the constrained column passes —
    // its rows read NULL for v, and NULL passes CHECK
    assert(DataSkipping.appendWithStats(
      Seq((9001L, "no-v")).toDF("id", "payload"), dir, Seq("id"),
      mergeSchema = true))
  }
}
