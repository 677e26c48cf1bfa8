package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

class GraftSqlSpec extends SparkSpec {

  private def freshTable(prefix: String, changeFeed: Boolean = false): String = {
    val s = spark
    import s.implicits._
    val t = s"${tmpDir(prefix)}/t"
    val df = (0L until 400L).map(i => (i, i % 40, s"e${i % 5}", i * 1.5))
      .toDF("event_id", "user_id", "event_type", "value")
    DataSkipping.writeWithStats(df.repartitionByRange(8, col("user_id")), t,
      Seq("user_id", "event_id"), bloomCols = Nil, changeFeed = changeFeed)
    t
  }

  test("statement grammar: each maintenance statement parses to its command, others fall through") {
    assert(GraftSql.parse("OPTIMIZE '/x/t'").contains(OptimizeGraftCommand("/x/t", Nil)))
    assert(GraftSql.parse("optimize '/x/t' zorder by (a, b)")
      .contains(OptimizeGraftCommand("/x/t", Seq("a", "b"))))
    assert(GraftSql.parse("VACUUM '/x/t'").contains(VacuumGraftCommand("/x/t", None)))
    assert(GraftSql.parse("VACUUM '/x/t' RETAIN 24 HOURS")
      .contains(VacuumGraftCommand("/x/t", Some(24L))))
    assert(GraftSql.parse("VACUUM '/x/t' RETAIN 0 HOURS DRY RUN")
      .contains(VacuumGraftCommand("/x/t", Some(0L), dryRun = true)))
    assert(GraftSql.parse("VACUUM '/x/t' DRY RUN")
      .contains(VacuumGraftCommand("/x/t", None, dryRun = true)))
    assert(GraftSql.parse("DESCRIBE HISTORY '/x/t'")
      .contains(DescribeHistoryGraftCommand("/x/t")))
    assert(GraftSql.parse("desc detail '/x/t'")
      .contains(DescribeDetailGraftCommand("/x/t")))
    assert(GraftSql.parse("RESTORE '/x/t' TO VERSION AS OF 3")
      .contains(RestoreGraftCommand("/x/t", 3L)))
    assert(GraftSql.parse("RESTORE '/x/t' VERSION AS OF 0")
      .contains(RestoreGraftCommand("/x/t", 0L)))
    assert(GraftSql.parse("RESTORE '/x/t' TO TIMESTAMP AS OF '2024-01-02 03:04:05'")
      .contains(RestoreTimestampGraftCommand("/x/t", "2024-01-02 03:04:05")))
    assert(GraftSql.parse("OPTIMIZE '/x/t' WHERE p = 3 AND q < 'x'")
      .contains(OptimizeGraftCommand("/x/t", Nil,
        whereSql = Some("p = 3 AND q < 'x'"))))
    intercept[IllegalArgumentException](
      GraftSql.parse("OPTIMIZE '/x/t' WHERE p = 3 ZORDER BY (a)"))
    intercept[IllegalArgumentException](
      GraftSql.parse("OPTIMIZE '/x/t' WHERE p = 3 INCREMENTAL"))
    assert(GraftSql.parse(
        "ALTER TABLE '/x/t' ADD CONSTRAINT ok CHECK (a > 0 AND (b < 2))")
      .contains(AddConstraintGraftCommand("/x/t", "ok", "a > 0 AND (b < 2)")))
    assert(GraftSql.parse("ALTER TABLE '/x/t' DROP CONSTRAINT ok")
      .contains(DropConstraintGraftCommand("/x/t", "ok")))
    assert(GraftSql.parse("REORG TABLE '/x/t' APPLY (PURGE)")
      .contains(ReorgGraftCommand("/x/t")))
    assert(GraftSql.parse(
        "ALTER TABLE '/x/t' ALTER COLUMN d SET GENERATED ALWAYS AS (to_date(ts))")
      .contains(AddGeneratedGraftCommand("/x/t", "d", "to_date(ts)")))
    assert(GraftSql.parse("ALTER TABLE '/x/t' ALTER COLUMN d DROP GENERATED")
      .contains(DropGeneratedGraftCommand("/x/t", "d")))
    assert(GraftSql.parse(
        "ALTER TABLE '/x/t' ALTER COLUMN id SET GENERATED ALWAYS AS IDENTITY")
      .contains(AddIdentityGraftCommand("/x/t", "id", 1L, 1L)))
    assert(GraftSql.parse(
        "ALTER TABLE '/x/t' ALTER COLUMN id SET GENERATED ALWAYS AS IDENTITY (START WITH 1000 STEP BY 2)")
      .contains(AddIdentityGraftCommand("/x/t", "id", 1000L, 2L)))
    // NOT ours: standard SQL, catalog-table DDL, near-misses
    assert(GraftSql.parse("SELECT 1").isEmpty)
    assert(GraftSql.parse("ALTER TABLE tbl ADD COLUMNS (x INT)").isEmpty)
    assert(GraftSql.parse("DESCRIBE TABLE '/x/t'").isEmpty)
    assert(GraftSql.parse("OPTIMIZE mytable").isEmpty)
    assert(GraftSql.parse("REORG TABLE '/x/t' APPLY (ZORDER)").isEmpty)
    // catalog-table DML is NOT ours — only the path-literal forms are
    assert(GraftSql.parse("DELETE FROM tbl WHERE x = 1").isEmpty)
    assert(GraftSql.parse("UPDATE tbl SET x = 1").isEmpty)
    assert(GraftSql.parse("MERGE INTO tbl USING src ON tbl.k = src.k " +
      "WHEN MATCHED THEN DELETE").isEmpty)
  }

  test("DML grammar: DELETE / UPDATE / MERGE parse with quote- and paren-aware splits") {
    assert(GraftSql.parse("DELETE FROM '/x/t' WHERE a < 3")
      .contains(DeleteGraftCommand("/x/t", Some("a < 3"))))
    assert(GraftSql.parse("DELETE FROM '/x/t'")
      .contains(DeleteGraftCommand("/x/t", None)))
    // a WHERE inside a string literal must NOT split the SET body
    assert(GraftSql.parse(
        "UPDATE '/x/t' SET note = 'where it was', v = coalesce(v, 0) WHERE k = 2")
      .contains(UpdateGraftCommand("/x/t",
        Seq("note" -> "'where it was'", "v" -> "coalesce(v, 0)"),
        Some(" k = 2"))))
    assert(GraftSql.parse("UPDATE '/x/t' SET v = v + 1")
      .contains(UpdateGraftCommand("/x/t", Seq("v" -> "v + 1"), None)))
    // commas inside nested calls stay inside their SET item
    assert(GraftSql.parse(
        "UPDATE '/x/t' SET v = greatest(a, b), w = 2 WHERE k IN (1, 2)")
      .contains(UpdateGraftCommand("/x/t",
        Seq("v" -> "greatest(a, b)", "w" -> "2"), Some(" k IN (1, 2)"))))
    // MERGE: subquery source, custom aliases rewritten to t./s.,
    // multi-key ON, every clause kind
    val m = GraftSql.parse(
      """MERGE INTO '/x/t' AS tgt USING (SELECT 1 AS k, 2 AS v) src
         ON tgt.k = src.k
         WHEN MATCHED AND src.v < 0 THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = src.v, note = concat(tgt.note, '+m')
         WHEN NOT MATCHED AND src.v > 0 THEN INSERT *
         WHEN NOT MATCHED BY SOURCE THEN UPDATE SET note = 'aged'""")
    assert(m.isDefined)
    val cmd = m.get.asInstanceOf[MergeIntoGraftCommand]
    assert(cmd.path == "/x/t")
    assert(cmd.source == Left("SELECT 1 AS k, 2 AS v"))
    assert(cmd.keyCols == Seq("k"))
    import GraftSql.MergeClauseSql._
    assert(cmd.clauseSqls(0).asInstanceOf[Delete].cond.get.trim == "s.v < 0")
    val upd = cmd.clauseSqls(1).asInstanceOf[Update]
    assert(upd.sets.get.map(_._1) == Seq("v", "note"))
    assert(upd.sets.get(1)._2.contains("t.note"))
    assert(cmd.clauseSqls(2).asInstanceOf[Insert].cond.get.trim == "s.v > 0")
    assert(cmd.clauseSqls(3).isInstanceOf[SourceUpdate])
    // path source + SET * + multi-key
    val m2 = GraftSql.parse(
      """MERGE INTO '/x/t' USING '/y/s'
         ON t.k1 = s.k1 AND t.k2 = s.k2
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""").get
      .asInstanceOf[MergeIntoGraftCommand]
    assert(m2.source == Right("/y/s"))
    assert(m2.keyCols == Seq("k1", "k2"))
    assert(m2.clauseSqls(0) == Update(None, None))
    // ON residual predicates are refused loudly, not silently dropped
    val e = intercept[RuntimeException](GraftSql.parse(
      "MERGE INTO '/x/t' USING '/y/s' ON t.k = s.k AND s.v > 0 " +
        "WHEN MATCHED THEN DELETE"))
    assert(e.getMessage.contains("WHEN ... AND"))
  }

  test("SQL DML program runs end-to-end: DELETE, UPDATE, MERGE through the kernels") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_sqldml")
    // DELETE
    val del = GraftSql.sql(s, s"DELETE FROM '$t' WHERE user_id >= 30 AND user_id < 35")
    assert(del.select("rows_deleted").head.getLong(0) == 50L)
    // UPDATE with a WHERE and an expression SET
    val upd = GraftSql.sql(s,
      s"UPDATE '$t' SET value = value * 2, event_type = concat(event_type, '+u') WHERE user_id < 5")
    assert(upd.select("rows_updated").head.getLong(0) == 50L)
    // MERGE from a subquery over a temp view
    (0L until 60L).map(i => (i * 10, i % 40, "m", -1.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .createOrReplaceTempView("mrg_src")
    val mrg = GraftSql.sql(s,
      s"""MERGE INTO '$t' USING (SELECT * FROM mrg_src) AS src
          ON t.event_id = src.event_id
          WHEN MATCHED AND src.user_id < 20 THEN UPDATE SET value = src.value
          WHEN MATCHED THEN DELETE
          WHEN NOT MATCHED THEN INSERT *""")
    val mrow = mrg.head
    val (u, d, i) = (mrow.getLong(1), mrow.getLong(2), mrow.getLong(3))
    // replay the same program on a dataframe model
    val model = {
      val base = (0L until 400L).map(j => (j, j % 40, s"e${j % 5}", j * 1.5))
        .toDF("event_id", "user_id", "event_type", "value")
        .filter(!(col("user_id") >= 30 && col("user_id") < 35))
        .withColumn("value", when(col("user_id") < 5, col("value") * 2).otherwise(col("value")))
        .withColumn("event_type", when(col("user_id") < 5,
          concat(col("event_type"), lit("+u"))).otherwise(col("event_type")))
      val src = (0L until 60L).map(j => (j * 10, j % 40, "m", -1.0))
        .toDF("event_id", "user_id", "event_type", "value")
      val matchedIds = base.join(src, Seq("event_id"), "left_semi")
      val kept = base.join(src.filter(col("user_id") >= 20), Seq("event_id"), "left_anti")
        .join(src.filter(col("user_id") < 20).select(col("event_id"), col("value").as("__nv")),
          Seq("event_id"), "left")
        .withColumn("value", coalesce(col("__nv"), col("value"))).drop("__nv")
      val inserted = src.join(base, Seq("event_id"), "left_anti")
      kept.unionByName(inserted)
    }
    val got = DataSkipping.readSkipping(s, t, lit(true))
    assert(got.count() == model.count())
    assert(got.exceptAll(model).isEmpty && model.exceptAll(got).isEmpty,
      "SQL MERGE result must equal the dataframe-model replay")
    assert(u + d + i > 0)
    // the op history shows the three DML generations
    val ops = DataSkipping.describeHistory(s, t)
      .select("operation").as[String].collect().toSeq
    assert(ops.take(3) == Seq("MERGE", "UPDATE", "DELETE"),
      s"history must lead with MERGE, UPDATE, DELETE: $ops")
  }

  test("REORG PURGE and generated/identity DDL run end-to-end through SQL") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_sql_reorg")
    // merge-on-read delete leaves a vector; REORG purges it
    assert(DataSkipping.deleteWhereDV(s, t, col("event_id") < 50L) === 50L)
    val out = GraftSql.sql(s, s"REORG TABLE '$t' APPLY (PURGE)").collect()
    assert(out.head.getLong(1) === 50L)
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === 350L)
    // generated column DDL
    val t2 = freshTable("graft_sql_gen")
    GraftSql.sql(s,
      s"ALTER TABLE '$t2' ALTER COLUMN value SET GENERATED ALWAYS AS (event_id * 1.5)")
    assert(DataSkipping.tableGeneratedColumns(s, t2) ===
      Map("value" -> "event_id * 1.5"))
    GraftSql.sql(s, s"ALTER TABLE '$t2' ALTER COLUMN value DROP GENERATED")
    assert(DataSkipping.tableGeneratedColumns(s, t2).isEmpty)
    // identity DDL
    GraftSql.sql(s,
      s"ALTER TABLE '$t2' ALTER COLUMN event_id SET GENERATED ALWAYS AS IDENTITY (START WITH 0 STEP BY 1)")
    assert(DataSkipping.tableIdentityColumns(s, t2) ===
      Map("event_id" -> ((0L, 1L, 400L))))
  }

  test("injected parser chain routes graft statements to commands and the rest to the delegate") {
    val ext = new SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    val delegate = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser
    // buildParser is private[sql] in Scala but JVM-public — invoke it
    // the way the session-state builder does, via reflection
    val parser = classOf[SparkSessionExtensions]
      .getMethod("buildParser", classOf[org.apache.spark.sql.SparkSession],
        classOf[org.apache.spark.sql.catalyst.parser.ParserInterface])
      .invoke(ext, spark, delegate)
      .asInstanceOf[org.apache.spark.sql.catalyst.parser.ParserInterface]
    assert(parser.parsePlan("OPTIMIZE '/x/t'") == OptimizeGraftCommand("/x/t", Nil))
    // a standard statement must produce a NON-graft plan via the delegate
    val std = parser.parsePlan("SELECT 1 AS a")
    assert(!std.isInstanceOf[OptimizeGraftCommand], std.getClass.getName)
    // and a syntax error still raises the delegate's ParseException
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      parser.parsePlan("SELEC 1")
    }
  }

  test("OPTIMIZE compacts, DESCRIBE HISTORY and DETAIL report through SQL, VACUUM runs") {
    val t = freshTable("graft_sql1")
    val before = DataSkipping.tableDetail(spark, t).select("num_files").head.getLong(0)
    assert(before > 1L)
    val res = GraftSql.sql(spark, s"OPTIMIZE '$t'").head
    assert(res.getString(1) == "OPTIMIZE")
    val after = GraftSql.sql(spark, s"DESCRIBE DETAIL '$t'")
      .select("num_files").head.getLong(0)
    assert(after < before)
    assert(after == res.getLong(2))
    val hist = GraftSql.sql(spark, s"DESCRIBE HISTORY '$t'")
      .orderBy("version").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(hist.toSeq == Seq((0L, "WRITE"), (1L, "OPTIMIZE")))
    // DRY RUN first: names the superseded generation without deleting
    val would = GraftSql.sql(spark, s"VACUUM '$t' RETAIN 0 HOURS DRY RUN")
      .collect().map(_.getString(0)).toSeq
    assert(would.exists(_.contains("v0")), would.mkString(","))
    assert(DataSkipping.tableVersions(spark, t) == Seq(0L, 1L))
    GraftSql.sql(spark, s"VACUUM '$t' RETAIN 0 HOURS")
    // retention-0 vacuum reclaims the superseded generation
    assert(DataSkipping.tableVersions(spark, t) == Seq(1L))
  }

  test("OPTIMIZE ZORDER BY re-clusters via SQL and rows survive byte-identically") {
    val t = freshTable("graft_sql2")
    val rows = DataSkipping.readSkipping(spark, t, lit(true))
      .orderBy("event_id").collect().toSeq
    val res = GraftSql.sql(spark, s"OPTIMIZE '$t' ZORDER BY (user_id, event_id)").head
    assert(res.getString(1) == "OPTIMIZE ZORDER BY (user_id, event_id)")
    val after = DataSkipping.readSkipping(spark, t, lit(true))
      .orderBy("event_id").collect().toSeq
    assert(after == rows)
    val hist = GraftSql.sql(spark, s"DESCRIBE HISTORY '$t'")
      .orderBy("version").collect().map(_.getString(1)).toSeq
    assert(hist == Seq("WRITE", "OPTIMIZE ZORDER"))
  }

  test("RESTORE VERSION AS OF undoes DML through SQL") {
    val t = freshTable("graft_sql3")
    DataSkipping.deleteWhere(spark, t, col("user_id") < 10L)
    assert(DataSkipping.readSkipping(spark, t, lit(true)).count() == 300L)
    GraftSql.sql(spark, s"RESTORE '$t' TO VERSION AS OF 0")
    assert(DataSkipping.readSkipping(spark, t, lit(true)).count() == 400L)
    // a version outside retained history fails loudly, not silently
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, s"RESTORE '$t' VERSION AS OF 99")
    }
    assert(e.getMessage.contains("not retained"))
  }

  test("ADD/DROP CONSTRAINT via SQL enforce and release like the Scala API") {
    val s = spark
    import s.implicits._
    val t = freshTable("graft_sql4")
    GraftSql.sql(s, s"ALTER TABLE '$t' ADD CONSTRAINT uid CHECK (user_id < 1000)")
    assert(DataSkipping.tableConstraints(s, t) == Map("uid" -> "user_id < 1000"))
    // a violating append aborts while the constraint stands
    val bad = Seq((9999L, 5000L, "x", 0.0))
      .toDF("event_id", "user_id", "event_type", "value")
    intercept[IllegalArgumentException] {
      DataSkipping.appendWithStats(bad, t, Seq("user_id", "event_id"))
    }
    GraftSql.sql(s, s"ALTER TABLE '$t' DROP CONSTRAINT uid")
    DataSkipping.appendWithStats(bad, t, Seq("user_id", "event_id"))
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() == 401L)
    // adding a constraint existing rows violate is refused via SQL too
    intercept[IllegalArgumentException] {
      GraftSql.sql(s, s"ALTER TABLE '$t' ADD CONSTRAINT uid CHECK (user_id < 1000)")
    }
  }

  test("corpus statements: DEDUP and CHUNK run the pipeline operators from SQL, fully lazy") {
    val s = spark
    import s.implicits._
    // planted exact duplicates: text repeats every 10 ids
    val docs = (0L until 200L).map(i => (i, s"some shared text body ${i % 10}"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("sqlc_docs")

    // DEDUP (default EXACT) keeps the lowest id per normalized text
    val dd = GraftSql.sql(s, "DEDUP sqlc_docs ON (doc_id, text)")
    assert(dd.columns.toSeq === Seq("doc_id", "text"))
    assert(dd.collect().map(_.getLong(0)).sorted.toSeq === (0L until 10L))
    // identical to the Scala operator composition
    val direct = docs.join(
      graft.operators.Dedup.exactByHash(docs, "doc_id", "text")
        .select(col("rep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    assert(dd.collect().toSet === direct.collect().toSet)

    // MINHASH method with threshold delegates to deduplicate
    val mh = GraftSql.sql(s,
      "DEDUP sqlc_docs ON (doc_id, text) METHOD MINHASH THRESHOLD 0.8")
    assert(mh.count() <= 200L && mh.count() >= 10L)
    // THRESHOLD without MINHASH refuses loudly
    intercept[Exception] {
      GraftSql.sql(s, "DEDUP sqlc_docs ON (doc_id, text) METHOD EXACT THRESHOLD 0.5")
    }

    // CHUNK matches the Scala operator exactly
    val ch = GraftSql.sql(s, "CHUNK sqlc_docs ON (doc_id, text) SIZE 3 OVERLAP 1")
    val chDirect = graft.operators.TextOps.chunkDocs(docs, "doc_id", "text", 3, 1)
    assert(ch.collect().toSet === chDirect.collect().toSet)
    assert(ch.count() > 200L, "chunking must fan out")

    // the parse result is the OPERATOR'S OWN PLAN (lazy/distributed,
    // never a driver-side command collect)
    assert(GraftSql.parse("DEDUP sqlc_docs ON (doc_id, text)", s)
      .exists(!_.isInstanceOf[org.apache.spark.sql.execution.command.LeafRunnableCommand]))

    // a graft-table PATH source reads through the manifest; the
    // injected parser route works through plain spark.sql too
    val t = freshTable("graft_sqlc")
    val viaPath = GraftSql.sql(s,
      s"CHUNK '$t' ON (event_id, event_type) SIZE 2")
    assert(viaPath.count() > 0L)
    val viaSession = s.sql("DEDUP sqlc_docs ON (doc_id, text)")
    assert(viaSession.collect().map(_.getLong(0)).sorted.toSeq === (0L until 10L))
  }

  test("DEDUP MINHASH is deferred: parse, plan and EXPLAIN never touch the source; execution runs the pipeline") {
    val s = spark
    import s.implicits._
    // an accumulator-counting filter sits between the source and the
    // statement: ANY pipeline execution must tick it, so a zero after
    // parse + physical planning PROVES the minhash job didn't run
    val touched = s.sparkContext.longAccumulator("dedup-src-touched")
    (0L until 120L).map(i => (i, s"near dup family text ${i % 6}"))
      .toDF("doc_id", "text")
      .filter((_: org.apache.spark.sql.Row) => { touched.add(1L); true })
      .createOrReplaceTempView("sqlc_defer_docs")
    val df = s.sql(
      "DEDUP sqlc_defer_docs ON (doc_id, text) METHOD MINHASH THRESHOLD 0.7")
    // parse produced the deferred leaf, not the executed pipeline
    assert(GraftSql.parse(
        "DEDUP sqlc_defer_docs ON (doc_id, text) METHOD MINHASH", s)
      .exists(_.isInstanceOf[graft.plans.DeferredCorpusPlan]))
    // physical planning (what EXPLAIN does) shows the deferred node
    // and still reads nothing
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("DeferredCorpus"), physical)
    assert(touched.value === 0L,
      s"EXPLAIN/planning must not execute the dedup pipeline " +
        s"(source rows read: ${touched.value})")
    // execution runs it: 6 text families survive, the source was read
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === (0L until 6L))
    assert(touched.value > 0L)
    // cache hygiene: the deferred builder releases its CacheScope in
    // a finally as soon as deduplicate returns (the losers frame is
    // checkpointed by then, so the result no longer references the
    // signature caches) — asserted structurally by re-collecting the
    // SAME frame: a released cache recomputes correctly
    assert(df.collect().length === 6)
  }

  test("SAMPLE / SPLIT / SCORE statements equal their operators; LEAKAGE SAFE defers and clusters atomically") {
    val s = spark
    import s.implicits._
    val docs = (0L until 300L)
      .map(i => (i, s"the quick document body number ${i % 40}", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    docs.createOrReplaceTempView("sqlc_corpus")

    // SAMPLE == sampleBySource (lazy filter, exact row set)
    val sm = GraftSql.sql(s,
      "SAMPLE sqlc_corpus ON (doc_id, source) " +
        "RATES ('src0' 1.0, 'src1' 0.5) DEFAULT 0.25")
    val smDirect = graft.operators.TextOps.sampleBySource(docs, "doc_id",
      "source", Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.25)
    assert(sm.collect().map(_.getLong(0)).toSet ===
      smDirect.collect().map(_.getLong(0)).toSet)

    // SPLIT == assignSplits (deterministic hash-bucket election)
    val sp = GraftSql.sql(s,
      "SPLIT sqlc_corpus ON (doc_id) FRACTIONS ('train' 0.8, 'val' 0.1, 'test' 0.1)")
    val spDirect = graft.operators.TextOps.assignSplits(docs, "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    assert(sp.select("doc_id", "split").collect().map(r =>
        r.getLong(0) -> r.getString(1)).toMap ===
      spDirect.select("doc_id", "split").collect().map(r =>
        r.getLong(0) -> r.getString(1)).toMap)

    // SCORE == the quality/langId expression family
    val sc = GraftSql.sql(s, "SCORE sqlc_corpus ON (doc_id, text)")
    assert(sc.columns.toSeq === Seq("doc_id", "n_tokens", "stopword_ratio",
      "punct_ratio", "score", "lang_pred"))
    val one = sc.filter(col("doc_id") === 0L).head()
    assert(one.getLong(1) === 6L) // "the quick document body number 0"
    assert(one.getString(5) === "en") // "the" is an en marker

    // LEAKAGE SAFE: parses to the DEFERRED leaf; near-dup pairs land
    // in the SAME split; plain docs keep the assignSplits election
    Seq((0L, 200L), (1L, 201L), (200L, 250L))
      .toDF("id_a", "id_b").createOrReplaceTempView("sqlc_pairs")
    assert(GraftSql.parse(
        "SPLIT sqlc_corpus ON (doc_id) FRACTIONS ('train' 0.8, 'val' 0.1, " +
          "'test' 0.1) LEAKAGE SAFE USING sqlc_pairs ON (id_a, id_b)", s)
      .exists(_.isInstanceOf[graft.plans.DeferredCorpusPlan]))
    val ls = GraftSql.sql(s,
      "SPLIT sqlc_corpus ON (doc_id) FRACTIONS ('train' 0.8, 'val' 0.1, " +
        "'test' 0.1) LEAKAGE SAFE USING sqlc_pairs ON (id_a, id_b)")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Set(ls(0L), ls(200L), ls(250L), ls(1L), ls(201L)).size <= 2)
    assert(ls(0L) === ls(200L) && ls(200L) === ls(250L))
    assert(ls(1L) === ls(201L))
    val plain = spDirect.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ls(5L) === plain(5L) && ls(99L) === plain(99L))

    // malformed RATES entries refuse with the statement text
    val bad = intercept[IllegalArgumentException] {
      GraftSql.sql(s, "SAMPLE sqlc_corpus ON (doc_id, source) RATES (src0 0.5)")
    }
    assert(bad.getMessage.contains("RATES"))
  }

  test("CHECKPOINT folds the manifest via SQL; SHOW INDEXES reports the standing vector index") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sqlck").toString
    val t = s"$root/t"
    DataSkipping.writeWithStats(
      (0L until 500L).map(i => (i, i)).toDF("id", "v").coalesce(2),
      t, Seq("id"))
    (0 until 4).foreach { i =>
      DataSkipping.appendWithStats(
        (1000L + i * 10L until 1000L + i * 10L + 10L).map(j => (j, j))
          .toDF("id", "v").coalesce(1), t, Seq("id"))
    }
    val v = GraftSql.sql(s, s"CHECKPOINT '$t'").head().getLong(0)
    assert(v === DataSkipping.tableVersions(s, t).max)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(
        DataSkipping.manifestDir(s, t)))
      .map(_.getPath.getName)
      .count(n => n.startsWith("part-") && n.endsWith(".parquet"))
    assert(parts === 1, s"CHECKPOINT must fold to one part, got $parts")
    assert(DataSkipping.readSkipping(s, t, lit(true)).count() === 540L)

    // SHOW INDEXES: empty before a build, one descriptive row after
    assert(GraftSql.sql(s, s"SHOW INDEXES '$t'").count() === 0L)
    val emb = (0L until 64L).map(i =>
      (i, Array.tabulate(16)(j => (i * 16 + j).toFloat)))
      .toDF("vid", "vec")
    val idx = s"$root/idx"
    VectorIndex.build(s, emb, "vid", "vec", idx, nCenters = 4, m = 4, ksub = 4)
    val row = GraftSql.sql(s, s"SHOW INDEXES '$idx'").head()
    assert(row.getString(0) === "ivf-pq" && row.getString(1) === "vid" &&
      row.getString(2) === "vec" && row.getLong(3) === 16L &&
      row.getLong(4) === 4L && row.getLong(5) === 4L &&
      row.getLong(6) === 4L && !row.getBoolean(7))
  }

  test("VECTOR SEARCH queries the standing index from SQL, deferred, equal to the Scala lookup") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vsq").toString
    val idx = s"$root/idx"
    val emb = (0L until 128L).map(i =>
      (i, Array.tabulate(16)(j => ((i * 7 + j) % 23).toFloat)))
      .toDF("vid", "vec")
    VectorIndex.build(s, emb, "vid", "vec", idx, nCenters = 4, m = 4, ksub = 4)
    // a query view with DIFFERENT column names + a read-proof counter
    val touched = s.sparkContext.longAccumulator("vs-src-touched")
    emb.filter(col("vid") < 5)
      .select(col("vid").as("qid"), col("vec").as("emb"))
      .filter((_: org.apache.spark.sql.Row) => { touched.add(1L); true })
      .createOrReplaceTempView("vsq_queries")
    val df = s.sql(
      s"VECTOR SEARCH '$idx' USING vsq_queries ON (qid, emb) TOP 3 PROBE 2")
    assert(GraftSql.parse(
        s"VECTOR SEARCH '$idx' USING vsq_queries ON (qid, emb) TOP 3 PROBE 2", s)
      .exists(_.isInstanceOf[graft.plans.DeferredCorpusPlan]))
    // parse + physical planning read the sidecar and schemas only
    assert(df.queryExecution.executedPlan.toString.contains("DeferredCorpus"))
    assert(touched.value === 0L, "planning must not execute the search")
    val got = df.select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(touched.value > 0L)
    val direct = VectorIndex.search(s,
        emb.filter(col("vid") < 5), idx, k = 3, nProbe = 2)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === direct)
    assert(got.size === 15)
  }

  test("corpus statement grammar: backticked columns parse; malformed THRESHOLD is a parse refusal, not a late crash") {
    val s = spark
    import s.implicits._
    (0L until 40L).map(i => (i, s"text ${i % 4}"))
      .toDF("doc_id", "text").createOrReplaceTempView("sqlc_bt_docs")
    // backticked identifiers address the same columns
    val dd = GraftSql.sql(s,
      "DEDUP sqlc_bt_docs ON (`doc_id`, `text`)")
    assert(dd.collect().map(_.getLong(0)).sorted.toSeq === (0L until 4L))
    val ch = GraftSql.sql(s,
      "CHUNK sqlc_bt_docs ON (`doc_id`, `text`) SIZE 2")
    assert(ch.count() === 40L)
    // '1.2.3' is not a number: the corpus grammar must NOT claim the
    // statement (no NumberFormatException from a half-parsed match) —
    // it falls through to the delegate parser's refusal
    val bad = intercept[Exception] {
      GraftSql.sql(s,
        "DEDUP sqlc_bt_docs ON (doc_id, text) METHOD MINHASH THRESHOLD 1.2.3")
    }
    assert(!bad.isInstanceOf[NumberFormatException], bad.getClass.getName)
  }

  test("incremental-view statements: CREATE bootstraps, REFRESH folds, SQL aggregates are served") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val s = spark
    val root = tmpDir("graft_sqlmv")
    val base = s"$root/base"
    DataSkipping.writeWithStats(
      s.range(0, 500).select(col("id"),
        concat(lit("g"), pmod(col("id"), lit(5))).as("g"),
        (col("id") * 2).as("v")).repartition(3),
      base, Seq("id"), bloomCols = Nil, changeFeed = true)
    val res = GraftSql.sql(s,
      s"CREATE INCREMENTAL VIEW '$root/view' AS SUM(v) OF '$base' " +
        s"GROUP BY g CHECKPOINT '$root/ckpt'").head
    assert(res.getString(0) == s"$root/view" && res.getLong(1) == 5L)
    // DML then REFRESH, both through SQL — the refresh needs only the
    // view path (spec + checkpoint ride the sidecar)
    GraftSql.sql(s, s"DELETE FROM '$base' WHERE id % 4 = 1")
    assert(GraftSql.sql(s,
      s"REFRESH INCREMENTAL VIEW '$root/view'").head.getLong(1) == 5L)
    // a PLAIN SQL aggregate over the base is silently answered by the
    // view (no Aggregate in the plan) and matches a direct recompute
    s.read.format("graft").load(base).createOrReplaceTempView("sqlmv_base")
    val q = s.sql(
      "SELECT g, sum(v) AS sv, count(*) AS c FROM sqlmv_base GROUP BY g ORDER BY g")
    assert(q.queryExecution.optimizedPlan.collectFirst {
      case a: Aggregate => a
    }.isEmpty, "the fresh view must answer the SQL aggregate")
    val expect = DataSkipping.readSkipping(s, base, col("id").isNotNull)
      .groupBy("g").agg(sum("v").as("sv"), count(lit(1)).as("c"))
      .orderBy("g").collect().toSeq
    assert(q.collect().toSeq == expect)
    // MINMAX kind serves extrema from its own view
    GraftSql.sql(s, s"CREATE INCREMENTAL VIEW '$root/view_mm' AS " +
      s"MINMAX(v) OF '$base' GROUP BY g CHECKPOINT '$root/ckpt_mm'")
    val qm = s.sql(
      "SELECT g, min(v) AS lo, max(v) AS hi FROM sqlmv_base GROUP BY g ORDER BY g")
    assert(qm.queryExecution.optimizedPlan.collectFirst {
      case a: Aggregate => a
    }.isEmpty)
    assert(qm.collect().toSeq == DataSkipping
      .readSkipping(s, base, col("id").isNotNull)
      .groupBy("g").agg(min("v").as("lo"), max("v").as("hi"))
      .orderBy("g").collect().toSeq)
    // REFRESH of a non-view path refuses loudly
    intercept[IllegalArgumentException] {
      GraftSql.sql(s, s"REFRESH INCREMENTAL VIEW '$base'")
    }
  }
}
