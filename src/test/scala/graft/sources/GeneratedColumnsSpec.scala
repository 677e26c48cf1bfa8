package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Generated columns ([[DataSkipping.addGeneratedColumn]]): compute
  * on append when omitted, enforcement through the paired `_gen_`
  * CHECK constraint when supplied, survival across clone/restore.
  */
class GeneratedColumnsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_gen").toString

  private def build(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import s.implicits._
    DataSkipping.writeWithStats(
      (0L until 200L).map(i => (i, i * 3))
        .toDF("id", "v").withColumn("bucket", col("v") % 10)
        .repartitionByRange(4, col("id")),
      dir, Seq("id", "bucket"))
  }

  test("append omitting the generated column computes it; supplied-but-wrong aborts") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    build(s, dir)
    DataSkipping.addGeneratedColumn(s, dir, "bucket", "v % 10")
    assert(DataSkipping.tableGeneratedColumns(s, dir) === Map("bucket" -> "v % 10"))
    assert(DataSkipping.tableConstraints(s, dir).keySet === Set("_gen_bucket"))

    // batch WITHOUT the column: computed, readable, correct
    assert(DataSkipping.appendWithStats(
      (200L until 300L).map(i => (i, i * 3)).toDF("id", "v"),
      dir, Seq("id", "bucket")))
    val got = DataSkipping.readSkipping(s, dir, col("id") >= 200L)
      .select("id", "v", "bucket").as[(Long, Long, Long)].collect()
    assert(got.length === 100)
    got.foreach { case (_, v, b) => assert(b === v % 10) }

    // batch SUPPLYING a wrong value: the staged choke point aborts it
    val bad = Seq((999L, 7L, 5L)).toDF("id", "v", "bucket")
    val e = intercept[Exception] {
      DataSkipping.appendWithStats(bad, dir, Seq("id", "bucket"))
    }
    assert(e.getMessage.contains("_gen_bucket"), e.getMessage)
    assert(DataSkipping.readSkipping(s, dir, lit(true)).count() === 300)

    // batch supplying the CORRECT value passes untouched
    assert(DataSkipping.appendWithStats(
      Seq((999L, 7L, 7L)).toDF("id", "v", "bucket"), dir, Seq("id", "bucket")))
    assert(DataSkipping.readSkipping(s, dir, lit(true)).count() === 301)
  }

  test("add validates existing rows; drop removes compute AND enforcement") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    build(s, dir)
    // a generation expression existing rows violate is refused
    val e = intercept[IllegalArgumentException] {
      DataSkipping.addGeneratedColumn(s, dir, "bucket", "v % 7")
    }
    assert(e.getMessage.contains("violate"))
    assert(DataSkipping.tableGeneratedColumns(s, dir).isEmpty)
    assert(DataSkipping.tableConstraints(s, dir).isEmpty,
      "a refused generation must not leave its paired constraint behind")
    // the column must already exist in the schema
    intercept[IllegalArgumentException] {
      DataSkipping.addGeneratedColumn(s, dir, "nope", "v % 10")
    }
    DataSkipping.addGeneratedColumn(s, dir, "bucket", "v % 10")
    DataSkipping.dropGeneratedColumn(s, dir, "bucket")
    assert(DataSkipping.tableGeneratedColumns(s, dir).isEmpty)
    assert(DataSkipping.tableConstraints(s, dir).isEmpty)
    // after drop: omitting the column is a plain schema error again
    intercept[Exception] {
      DataSkipping.appendWithStats(
        Seq((500L, 1L)).toDF("id", "v"), dir, Seq("id", "bucket"))
    }
  }

  test("DML rewrites cannot break the generation invariant") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    build(s, dir)
    DataSkipping.addGeneratedColumn(s, dir, "bucket", "v % 10")
    // an UPDATE that rewrites v without maintaining bucket violates
    // the paired constraint at the staged choke point
    val e = intercept[Exception] {
      DataSkipping.updateWhere(s, dir, col("id") === 5L,
        Map("v" -> (col("v") + 1L)))
    }
    assert(e.getMessage.contains("_gen_bucket"), e.getMessage)
    // maintaining BOTH columns passes
    DataSkipping.updateWhere(s, dir, col("id") === 5L,
      Map("v" -> (col("v") + 10L), "bucket" -> ((col("v") + 10L) % 10)))
    val r = DataSkipping.readSkipping(s, dir, col("id") === 5L)
      .select("v", "bucket").as[(Long, Long)].head()
    assert(r === ((25L, 5L)))
  }

  test("generation declarations survive clone and restore") {
    val s = spark
    import s.implicits._
    val dir = tmp() + "/src"
    build(s, dir)
    DataSkipping.addGeneratedColumn(s, dir, "bucket", "v % 10")
    val cl = tmp() + "/clone"
    DataSkipping.cloneTable(s, dir, cl)
    assert(DataSkipping.tableGeneratedColumns(s, cl) === Map("bucket" -> "v % 10"))
    assert(DataSkipping.appendWithStats(
      Seq((1000L, 13L)).toDF("id", "v"), cl, Seq("id", "bucket")))
    assert(DataSkipping.readSkipping(s, cl, col("id") === 1000L)
      .select("bucket").as[Long].head() === 3L)
    // restore keeps the CURRENT declaration set (table metadata)
    DataSkipping.appendWithStats(
      (300L until 310L).map(i => (i, i)).toDF("id", "v"), dir, Seq("id", "bucket"))
    val versions = DataSkipping.tableVersions(s, dir)
    DataSkipping.restoreTable(s, dir, versions.min)
    assert(DataSkipping.tableGeneratedColumns(s, dir) === Map("bucket" -> "v % 10"))
  }
}
