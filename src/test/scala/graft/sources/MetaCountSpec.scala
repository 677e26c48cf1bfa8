package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metadata-only counting ([[DataSkipping.countWhere]]): file
  * tri-state classification, boundary-only scanning, deletion-vector
  * subtraction, null discipline.
  */
class MetaCountSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cnt").toString

  test("range counts scan only the boundary files; count(true) scans nothing") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    DataSkipping.writeWithStats(
      (0L until 8000L).map(i => (i, s"p$i")).toDF("id", "payload")
        .repartitionByRange(8, col("id")),
      dir, Seq("id"))

    // interior band: 6 full files + 2 boundary scans at most
    val (c1, full1, scanned1) = DataSkipping.countWhereDetail(s, dir,
      col("id") >= 1100L && col("id") < 6900L)
    assert(c1 === 5800L)
    assert(scanned1 <= 2, s"boundary files only, scanned $scanned1")
    assert(full1 >= 4)

    // whole table: pure metadata
    val (c2, full2, scanned2) = DataSkipping.countWhereDetail(s, dir, lit(true))
    assert(c2 === 8000L && scanned2 === 0L && full2 === 8L)

    // no match: nothing read, nothing counted
    val (c3, full3, scanned3) = DataSkipping.countWhereDetail(s, dir,
      col("id") > 1000000L)
    assert(c3 === 0L && full3 === 0L && scanned3 === 0L)

    // file-aligned range: zero scans (bound taken from the first
    // file's actual max — the range partitioner samples, so
    // boundaries are not round numbers)
    val loMax = DataSkipping.readManifest(s, dir)
      .select("max_id").collect().map(_.getLong(0)).min
    val (c4, _, scanned4) = DataSkipping.countWhereDetail(s, dir,
      col("id") <= loMax)
    assert(c4 === DataSkipping.readSkipping(s, dir, col("id") <= loMax).count())
    assert(scanned4 === 0L, "aligned bound must not need a scan")

    // OR of two disjoint bands still counts correctly
    val orPred = (col("id") < 500L) || (col("id") >= 7500L)
    assert(DataSkipping.countWhere(s, dir, orPred) === 1000L)
  }

  test("nulls never count for comparisons; IS [NOT] NULL counts from metadata") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    // file A: v all null; file B: v never null; file C: mixed
    val rows =
      (0L until 100L).map(i => (i, None: Option[Long])) ++
      (100L until 200L).map(i => (i, Some(i))) ++
      (200L until 300L).map(i => (i, if (i % 2 == 0) Some(i) else None))
    DataSkipping.writeWithStats(
      rows.toDF("id", "v").repartitionByRange(3, col("id")),
      dir, Seq("id", "v"))

    assert(DataSkipping.countWhere(s, dir, col("v") >= 0L) === 150L,
      "null v rows must not count")
    val (cNull, _, scanNull) = DataSkipping.countWhereDetail(s, dir,
      col("v").isNull)
    assert(cNull === 150L)
    val (cNotNull, _, scanNotNull) = DataSkipping.countWhereDetail(s, dir,
      col("v").isNotNull)
    assert(cNotNull === 150L)
    // homogeneous files (all-null A, no-null B) resolve from
    // metadata; only the mixed file needs its scan
    assert(scanNull <= 1 && scanNotNull <= 1)
  }

  test("deletion-vector subtraction keeps all-match files metadata-only and exact") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    DataSkipping.writeWithStats(
      (0L until 2000L).map(i => (i, s"p$i")).toDF("id", "payload")
        .repartitionByRange(4, col("id")),
      dir, Seq("id"))
    DataSkipping.deleteWhereDV(s, dir, col("id") >= 600L && col("id") < 640L)

    val (c, full, scanned) = DataSkipping.countWhereDetail(s, dir, lit(true))
    assert(c === 1960L)
    assert(scanned === 0L,
      "vector entries subtract from n_rows — no scan demotion needed")
    assert(full === 4L)
    // a band inside the vector's file also counts exactly (boundary
    // scan applies the vector)
    assert(DataSkipping.countWhere(s, dir,
      col("id") >= 500L && col("id") < 700L) === 160L)
  }

  test("minMaxWhere answers from stats; a vector on the extremum file demotes to a scan") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    DataSkipping.writeWithStats(
      (0L until 4000L).map(i => (i, s"p$i")).toDF("id", "payload")
        .repartitionByRange(8, col("id")),
      dir, Seq("id"))
    // whole-table min/max: pure metadata
    val ((lo0, hi0), scanned0) = DataSkipping.minMaxWhereDetail(s, dir,
      "id", lit(true))
    assert(lo0 === Some(0L) && hi0 === Some(3999L) && scanned0 === 0L)
    // band: boundary scans only
    val ((lo1, hi1), scanned1) = DataSkipping.minMaxWhereDetail(s, dir,
      "id", col("id") >= 1100L && col("id") < 2900L)
    assert(lo1 === Some(1100L) && hi1 === Some(2899L))
    assert(scanned1 <= 2)
    // DV-delete the global minimum band: the stale stats row (min_id
    // = 0) must NOT be believed — the file demotes to a scan
    DataSkipping.deleteWhereDV(s, dir, col("id") < 120L)
    val ((lo2, hi2), scanned2) = DataSkipping.minMaxWhereDetail(s, dir,
      "id", lit(true))
    assert(lo2 === Some(120L), "a dead extremum must not surface")
    assert(hi2 === Some(3999L))
    assert(scanned2 >= 1L, "the vector-bearing file must be scanned")
    // no matches -> (None, None)
    assert(DataSkipping.minMaxWhere(s, dir, "id", col("id") > 1000000L)
      === ((None, None)))
    // untracked column refused loudly
    intercept[IllegalArgumentException] {
      DataSkipping.minMaxWhere(s, dir, "payload", lit(true))
    }
  }

  test("randomized predicates: metadata count equals the scan count") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    val rows = (0L until 3000L).map { i =>
      (i, if (i % 7 == 0) None else Some(i % 500), s"x$i")
    }
    DataSkipping.writeWithStats(
      rows.toDF("id", "v", "payload").repartitionByRange(6, col("id")),
      dir, Seq("id", "v"))
    DataSkipping.deleteWhereDV(s, dir, col("id") % 11 === 3L)
    val rnd = new scala.util.Random(424242L)
    (1 to 8).foreach { _ =>
      val lo = rnd.nextInt(3300).toLong
      val hi = lo + rnd.nextInt(900).toLong
      val pred = rnd.nextInt(4) match {
        case 0 => col("id") >= lo && col("id") < hi
        case 1 => (col("id") < lo) || (col("id") >= hi)
        case 2 => col("v").isNotNull && col("id") >= lo
        case 3 => col("v").isNull || (col("id") >= lo && col("id") < hi)
      }
      val meta = DataSkipping.countWhere(s, dir, pred)
      val scan = DataSkipping.readSkipping(s, dir, pred).count()
      assert(meta === scan, s"pred diverged: $pred")
    }
  }
}
