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

  test("read-side pruning: a raw-column predicate prunes via the generated partition column") {
    val s = spark
    import s.implicits._
    val dir = s"${tmpDir("graft_genpr")}/t"
    // day = to_date(ts): 10 days x 100 rows; ts deliberately UNTRACKED
    // so only the derived day-bound conjunct can prune
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val df = (0L until 1000L).map { i =>
      (i, new java.sql.Timestamp(base + i * 864000L + 3600L), i % 7)
    }.toDF("id", "ts", "k").withColumn("day", to_date(col("ts")))
    DataSkipping.writeWithStats(df.repartition(2), dir, Seq("id"),
      bloomCols = Nil, partitionBy = Seq("day"))
    DataSkipping.addGeneratedColumn(s, dir, "day", "to_date(ts)")
    val pred = col("ts") >= expr("timestamp'2024-03-03 00:00:00'") &&
      col("ts") < expr("timestamp'2024-03-05 00:00:00'")
    val (kept, files) = DataSkipping.prunedFiles(s, dir, pred)
    assert(kept.size < files.size, s"derived bound must prune: ${kept.size}/${files.size}")
    val days = kept.flatMap("day=([0-9-]+)".r.findFirstMatchIn(_).map(_.group(1))).distinct.sorted
    assert(days.forall(d => d >= "2024-03-03" && d <= "2024-03-05"), days.toString)
    // results identical to a brute-force filter (derivation is pure pruning)
    assert(DataSkipping.readSkipping(s, dir, pred).count() ===
      df.filter(pred).count())
    // equality on raw derives equality on the generated column
    val eqPred = col("ts") === expr("timestamp'2024-03-04 01:00:00'")
    val (keptEq, _) = DataSkipping.prunedFiles(s, dir, eqPred)
    assert(keptEq.forall(_.contains("day=2024-03-04")), keptEq.toString)
    // IN-lists derive a generated-column disjunction
    val inPred = col("ts").isin(
      java.sql.Timestamp.valueOf("2024-03-04 01:00:00"),
      java.sql.Timestamp.valueOf("2024-03-07 05:00:00"))
    val (keptIn, allF) = DataSkipping.prunedFiles(s, dir, inPred)
    assert(keptIn.size < allF.size)
    assert(keptIn.forall(p =>
      p.contains("day=2024-03-04") || p.contains("day=2024-03-07")),
      keptIn.toString)
    assert(DataSkipping.readSkipping(s, dir, inPred).count() ===
      df.filter(inPred).count())
  }

  test("read-side pruning: temporal families over a STRING raw column derive nothing (never wrong)") {
    val s = spark
    import s.implicits._
    val dir = s"${tmpDir("graft_genpr3")}/t"
    // ts_str is a STRING with NON-ZERO-PADDED dates: lexicographic
    // order ('2021-12-1' < '2021-2-1') disagrees with parsed-date
    // order, so to_date over it is NOT monotone — deriving day
    // bounds from a string range would silently drop rows
    val df = Seq(
      (1L, "2021-1-5"), (2L, "2021-2-1"), (3L, "2021-12-1"),
      (4L, "2021-3-9"), (5L, "2021-11-2"))
      .toDF("id", "ts_str")
      .withColumn("day", to_date(col("ts_str")))
    DataSkipping.writeWithStats(df, dir, Seq("id"),
      bloomCols = Nil, partitionBy = Seq("day"))
    DataSkipping.addGeneratedColumn(s, dir, "day", "to_date(ts_str)")
    // '2021-12-1' <= '2021-2-1' lexicographically: the row in
    // day=2021-12-01 MATCHES this string predicate; a derived
    // day <= 2021-02-01 bound would prune its partition away
    val pred = col("ts_str") <= "2021-2-1"
    val (kept, files) = DataSkipping.prunedFiles(s, dir, pred)
    assert(kept.size === files.size,
      "a temporal family over a STRING raw column must not derive")
    assert(DataSkipping.readSkipping(s, dir, pred).count() ===
      df.filter(pred).count())
  }

  test("read-side pruning: temporal derivation requires the recorded writer timezone") {
    val s = spark
    import s.implicits._
    val dir = s"${tmpDir("graft_gentz")}/t"
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val df = (0L until 1000L).map { i =>
      (i, new java.sql.Timestamp(base + i * 864000L + 3600L))
    }.toDF("id", "ts").withColumn("day", to_date(col("ts")))
    DataSkipping.writeWithStats(df.repartition(2), dir, Seq("id"),
      bloomCols = Nil, partitionBy = Seq("day"))
    DataSkipping.addGeneratedColumn(s, dir, "day", "to_date(ts)")
    val pred = col("ts") >= expr("timestamp'2024-03-03 00:00:00'") &&
      col("ts") < expr("timestamp'2024-03-05 00:00:00'")
    // reader tz == recorded writer tz (UTC): derives and prunes
    val (kept, files) = DataSkipping.prunedFiles(s, dir, pred)
    assert(kept.size < files.size, "same-tz derivation must prune")
    // a reader under a DIFFERENT session timezone: stored day values
    // were computed under UTC — deriving endpoints under -08:00
    // would shift the window and silently drop files; the gate must
    // fall back to no derivation (correct, just unpruned)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    val (kept2, files2) = DataSkipping.prunedFiles(s2, dir, pred)
    assert(kept2.size === files2.size,
      "a mismatched reader timezone must derive nothing")
    // a FAILED append under the drifted timezone must NOT poison —
    // nothing landed, stored values are still single-epoch
    intercept[Exception] {
      DataSkipping.appendWithStats(
        s2.range(5).select(col("id").as("wrong_name")), dir, Seq("id"))
    }
    val (keptF, filesF) = DataSkipping.prunedFiles(s, dir, pred)
    assert(keptF.size < filesF.size,
      "a failed drifted append must leave temporal derivation on")
    // an append under the drifted timezone POISONS the record: the
    // table now stores mixed-epoch values, so even a UTC reader must
    // stop deriving — for good
    val more = s2.range(2000, 2010).select(col("id"),
      lit(java.sql.Timestamp.valueOf("2024-03-20 12:00:00")).as("ts"))
    DataSkipping.appendWithStats(more, dir, Seq("id"))
    val (kept3, files3) = DataSkipping.prunedFiles(s, dir, pred)
    assert(kept3.size === files3.size,
      "a poisoned timezone record must disable temporal derivation")
    // and reads stay correct throughout
    assert(DataSkipping.readSkipping(s, dir, pred).count() ===
      df.filter(pred).count())
  }

  test("copy-on-write DML under a drifted session timezone poisons the tz record too") {
    val s = spark
    import s.implicits._
    val dir = s"${tmpDir("graft_gentzdml")}/t"
    // NOON-UTC timestamps: to_date agrees between UTC and LA, so the
    // staged CHECK re-verification PASSES under the drifted session —
    // exactly the case where only the poison gate stands between the
    // rewrite and later mixed-epoch silent pruning
    val base = java.sql.Timestamp.valueOf("2024-03-01 12:00:00").getTime
    val df = (0L until 1000L).map { i =>
      (i, new java.sql.Timestamp(base + (i % 10) * 86400000L))
    }.toDF("id", "ts").withColumn("day", to_date(col("ts")))
    DataSkipping.writeWithStats(df.repartition(2), dir, Seq("id"),
      bloomCols = Nil, partitionBy = Seq("day"))
    DataSkipping.addGeneratedColumn(s, dir, "day", "to_date(ts)")
    val pred = col("ts") >= expr("timestamp'2024-03-03 00:00:00'") &&
      col("ts") < expr("timestamp'2024-03-05 00:00:00'")
    val (kept0, files0) = DataSkipping.prunedFiles(s, dir, pred)
    assert(kept0.size < files0.size, "same-tz derivation must prune")
    // an UPDATE under a drifted tz recomputes generated values
    // against the session tz (the SET expression runs there) — the
    // rewrite choke point must poison, same as an append (the r16
    // advice gap: only the two append paths were hooked)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    val n = DataSkipping.updateWhere(s2, dir,
      col("id") === 3L,
      Map("ts" -> expr("ts + interval 1 hour"),
        "day" -> expr("to_date(ts + interval 1 hour)")),
      vacuum = false)
    assert(n === 1L)
    val (kept1, files1) = DataSkipping.prunedFiles(s, dir, pred)
    assert(kept1.size === files1.size,
      "a drifted copy-on-write rewrite must poison temporal derivation")
    // reads stay correct throughout
    assert(DataSkipping.readSkipping(s, dir, pred).count() ===
      df.filter(pred).count())
  }

  test("read-side pruning: non-monotone generation expressions derive nothing (never wrong)") {
    val s = spark
    import s.implicits._
    val dir = s"${tmpDir("graft_genpr2")}/t"
    // hour-of-day WRAPS daily — deriving hod bounds from a ts range
    // spanning midnight would silently drop rows; the whitelist must
    // refuse it
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val df = (0L until 480L).map { i =>
      (i, new java.sql.Timestamp(base + i * 600000L))
    }.toDF("id", "ts").withColumn("hod", hour(col("ts")))
    DataSkipping.writeWithStats(df.repartition(2), dir, Seq("id"),
      bloomCols = Nil, partitionBy = Seq("hod"))
    DataSkipping.addGeneratedColumn(s, dir, "hod", "hour(ts)")
    // spans a midnight: matching rows live in hod partitions 22,23,0,1
    val pred = col("ts") >= expr("timestamp'2024-03-01 22:00:00'") &&
      col("ts") < expr("timestamp'2024-03-02 02:00:00'")
    val (kept, files) = DataSkipping.prunedFiles(s, dir, pred)
    assert(kept.size === files.size,
      "a non-monotone generation expression must not prune")
    assert(DataSkipping.readSkipping(s, dir, pred).count() ===
      df.filter(pred).count())
  }
}
