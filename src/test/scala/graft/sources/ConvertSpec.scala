package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

class ConvertSpec extends SparkSpec {

  private def plainParquet(prefix: String, parts: Int = 6): String = {
    val s = spark
    import s.implicits._
    val t = s"${tmpDir(prefix)}/d"
    (0L until 300L).map(i => (i, i % 30, i * 2.0)).toDF("id", "k", "v")
      .repartitionByRange(parts, col("k")).write.parquet(t)
    t
  }

  private def dataFileState(t: String): Seq[(String, Long, Long)] = {
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(t))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
      .toSeq.sortBy(_._1)
  }

  test("convert is zero-rewrite: the original files become v0 and pruning works immediately") {
    val t = plainParquet("graft_cv1")
    val before = dataFileState(t)
    val n = DataSkipping.convertToStats(spark, t, Seq("k"))
    assert(n == before.size.toLong)
    assert(dataFileState(t) == before, "convert must not touch a data byte")
    // first-class table from the first moment
    val (kept, all) = DataSkipping.prunedFiles(spark, t, col("k") < 5L)
    assert(all.size == before.size && kept.size < all.size, s"$kept / $all")
    assert(DataSkipping.readSkipping(spark, t, col("k") < 5L).count() == 50L)
    assert(DataSkipping.describeHistory(spark, t)
      .select("operation").head.getString(0) == "CONVERT")
    // and DML / maintenance work on the converted table
    DataSkipping.deleteWhere(spark, t, col("k") === 7L)
    assert(DataSkipping.readSkipping(spark, t, lit(true)).count() == 290L)
    DataSkipping.compactTable(spark, t, targetFileBytes = 16L * 1024 * 1024)
    assert(DataSkipping.readSkipping(spark, t, lit(true)).count() == 290L)
  }

  test("convert refuses an existing graft table, an empty dir, and a partitioned layout") {
    val s = spark
    import s.implicits._
    val t = plainParquet("graft_cv2")
    DataSkipping.convertToStats(s, t, Seq("k"))
    intercept[IllegalArgumentException] {
      DataSkipping.convertToStats(s, t, Seq("k"))
    }
    val empty = tmpDir("graft_cv3")
    intercept[IllegalArgumentException] {
      DataSkipping.convertToStats(s, empty, Seq("k"))
    }
    val part = s"${tmpDir("graft_cv4")}/d"
    (0L until 50L).map(i => (i, i % 5)).toDF("id", "p")
      .write.partitionBy("p").parquet(part)
    val e = intercept[IllegalArgumentException] {
      DataSkipping.convertToStats(s, part, Seq("id"))
    }
    assert(e.getMessage.contains("flat"), e.getMessage)
  }

  test("CONVERT TO GRAFT statement parses and runs through the SQL surface") {
    assert(GraftSql.parse("CONVERT TO GRAFT '/x/d' STATS BY (a, b)")
      .contains(ConvertGraftCommand("/x/d", Seq("a", "b"))))
    assert(GraftSql.parse("convert to graft '/x/d' stats by(a)")
      .contains(ConvertGraftCommand("/x/d", Seq("a"))))
    val t = plainParquet("graft_cv5")
    val res = GraftSql.sql(spark, s"CONVERT TO GRAFT '$t' STATS BY (k, id)").head
    assert(res.getLong(1) == 6L)
    assert(DataSkipping.tableStatsCols(spark, t).toSet == Set("k", "id"))
  }
}
