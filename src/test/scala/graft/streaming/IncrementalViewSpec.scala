package graft.streaming

import graft.SparkSpec
import graft.sources.DataSkipping
import org.apache.spark.sql.functions._

class IncrementalViewSpec extends SparkSpec {

  private def buildBase(s: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    import s.implicits._
    // groups g0..g4, 100 rows each, value = id (exact in decimal)
    DataSkipping.writeWithStats(
      (0L until 500L).map(i => (i, s"g${i % 5}", i.toDouble))
        .toDF("id", "grp", "value").repartitionByRange(4, col("id")),
      table, Seq("id"), bloomCols = Nil, changeFeed = true)
  }

  private def viewMap(df: org.apache.spark.sql.DataFrame)
      : Map[String, (BigDecimal, Long)] =
    df.collect().map(r => r.getString(0) ->
      ((BigDecimal(r.getDecimal(1)), r.getLong(2)))).toMap

  test("incremental fold equals recompute across delete, group-migrating update, and merge") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ivw_fold")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh() // bootstrap

    DataSkipping.deleteWhere(s, base, col("id") < 50L) // v1
    DataSkipping.updateWhere(s, base, col("id") >= 400L && col("id") < 450L,
      Map("grp" -> lit("gX"), "value" -> (col("value") * -1))) // v2: migration
    DataSkipping.mergeUpsert(s, base,
      (1000L until 1020L).map(i => (i, "gNew", i.toDouble))
        .toDF("id", "grp", "value"), Seq("id")) // v3: inserts
    val view = refresh().orderBy("grp")

    val expect = DataSkipping.readSkipping(s, base, col("id") >= 0L)
      .groupBy("grp").agg(
        sum(col("value").cast("decimal(20,6)")).cast("decimal(30,6)")
          .as("sum_value"),
        count(lit(1)).as("cnt"))
      .orderBy("grp")
    assert(viewMap(view) === viewMap(expect),
      "incrementally-maintained view must equal the full recompute")
    assert(viewMap(view).contains("gX") && viewMap(view).contains("gNew"))
    // the migrated-away rows really debited their source groups
    assert(viewMap(view)("g0")._2 === 80L) // 100 - 10 (deleted) - 10 (migrated)
  }

  test("moments view: mean/variance fold equals recompute; emptied group tombstones; replay is a no-op") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ivw_mo")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainMeanVar(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh() // bootstrap

    DataSkipping.deleteWhere(s, base, col("id") < 50L) // v1
    DataSkipping.updateWhere(s, base, col("id") >= 400L && col("id") < 450L,
      Map("grp" -> lit("gX"), "value" -> (col("value") * -1))) // v2
    DataSkipping.mergeUpsert(s, base,
      (1000L until 1020L).map(i => (i, "gNew", i.toDouble))
        .toDF("id", "grp", "value"), Seq("id")) // v3
    val view = refresh().orderBy("grp")

    def m(df: org.apache.spark.sql.DataFrame)
        : Map[String, (BigDecimal, BigDecimal, Long)] =
      df.select("grp", "sum_value", "sum_sq", "cnt").collect()
        .map(r => r.getString(0) -> ((BigDecimal(r.getDecimal(1)),
          BigDecimal(r.getDecimal(2)), r.getLong(3)))).toMap
    val expect = DataSkipping.readSkipping(s, base, col("id") >= 0L)
      .groupBy("grp").agg(
        sum(col("value").cast("decimal(20,6)")).cast("decimal(30,6)")
          .as("sum_value"),
        sum(col("value").cast("decimal(16,6)") *
          col("value").cast("decimal(16,6)")).cast("decimal(38,12)")
          .as("sum_sq"),
        count(lit(1)).as("cnt"))
    assert(m(view) === m(expect),
      "incrementally-maintained moments must equal the full recompute")
    // derived variance is non-negative everywhere (sanity on Σv²)
    m(view).foreach { case (g, (sv, sq, n)) =>
      val mean = sv.toDouble / n
      assert(sq.toDouble / n - mean * mean >= -1e-9, s"group $g")
    }
    // empty a group entirely -> tombstone leaves the view
    DataSkipping.deleteWhere(s, base, col("grp") === "gNew")
    assert(!refresh().select("grp").as[String].collect().contains("gNew"))
    // replay with a stale batch id cannot double-apply
    val before = m(refresh())
    val feed = DataSkipping.readChangeFeed(s, base, 0L)
    IncrementalView.foldMomentsBatch(s, s"$root/view", "grp", "value",
      feed, batchId = 0L, s"$root/ckpt")
    assert(m(IncrementalView.readView(s, s"$root/view", "grp")) === before,
      "stale replay must be a no-op")
  }

  test("deletion-vector DML folds into the view exactly like copy-on-write") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ivw_dv")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh() // bootstrap

    DataSkipping.deleteWhereDV(s, base, col("id") < 50L)           // v1
    DataSkipping.updateWhereDV(s, base,
      col("id") >= 400L && col("id") < 450L,
      Map("grp" -> lit("gX"), "value" -> (col("value") * -1)))     // v2
    val view = refresh().orderBy("grp")
    val expect = DataSkipping.readSkipping(s, base, col("id") >= 0L)
      .groupBy("grp").agg(
        sum(col("value").cast("decimal(20,6)")).cast("decimal(30,6)")
          .as("sum_value"),
        count(lit(1)).as("cnt"))
      .orderBy("grp")
    assert(viewMap(view) === viewMap(expect),
      "view maintained from DV-DML feed rows must equal the recompute")
    assert(viewMap(view).contains("gX"))
  }

  private def mmMap(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Option[BigDecimal], Option[BigDecimal], Long)] =
    df.collect().map(r => r.getString(0) -> ((
      Option(r.getDecimal(1)).map(BigDecimal(_)),
      Option(r.getDecimal(2)).map(BigDecimal(_)),
      r.getLong(3)))).toMap

  private def mmExpect(s: org.apache.spark.sql.SparkSession, base: String) =
    DataSkipping.readSkipping(s, base, col("id") >= 0L)
      .groupBy("grp").agg(
        min(col("value").cast("decimal(20,6)")).as("min_value"),
        max(col("value").cast("decimal(20,6)")).as("max_value"),
        count(lit(1)).as("cnt"))

  test("min/max view: extremum deletes recompute, interior deletes fold by formula") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ivw_mm")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainMinMax(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh() // bootstrap

    // g0's minimum is id 0 (value 0): extremum delete -> recompute;
    // ids 100-150 are interior for their groups at most; inserts
    // extend g1's max and create gNew
    DataSkipping.deleteWhere(s, base, col("id") < 10L)               // v1
    DataSkipping.deleteWhere(s, base,
      col("id") >= 200L && col("id") < 240L)                         // v2
    DataSkipping.mergeUpsert(s, base,
      ((2000L until 2010L).map(i => (i, "g1", 9999.0 + i)) ++
        (3000L until 3005L).map(i => (i, "gNew", -5.0 + i)))
        .toDF("id", "grp", "value"), Seq("id"))                      // v3
    val view = refresh().orderBy("grp")
    assert(mmMap(view) === mmMap(mmExpect(s, base)),
      "maintained min/max view must equal the full recompute")
  }

  test("min/max view: in-batch insert-then-delete of a would-be extremum recomputes, not formulas") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ivw_mmx")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainMinMax(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh()

    // ONE refresh folds both versions: gZ is born with values {-100,
    // 50} and loses -100 within the same batch — a formula over the
    // batch's inserts would believe min = -100
    DataSkipping.mergeUpsert(s, base,
      Seq((5000L, "gZ", -100.0), (5001L, "gZ", 50.0))
        .toDF("id", "grp", "value"), Seq("id"))                      // v1
    DataSkipping.deleteWhere(s, base, col("id") === 5000L)           // v2
    val view = refresh()
    val gz = mmMap(view)("gZ")
    assert(gz === ((Some(BigDecimal(50)), Some(BigDecimal(50)), 1L)),
      s"in-batch dead extremum must not surface: $gz")
    assert(mmMap(view) === mmMap(mmExpect(s, base)))
  }

  test("min/max view: a lagging consumer recomputes at the batch's END version, not the live table") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ivw_mmlag")
    val base = s"$root/base"
    buildBase(s, base)
    val view = s"$root/view"
    val ckpt = s"$root/ckpt"
    IncrementalView.maintainMinMax(s, base, view, "grp", "value", ckpt)

    // v1 deletes g0's minimum (recompute trigger); v2 inserts an even
    // smaller g0 value. A consumer folding ONLY v1 must see the
    // v1-state minimum (id 5 -> value 5), not v2's -999 — recomputing
    // from the live table would leap ahead
    DataSkipping.deleteWhere(s, base, col("id") === 0L)              // v1
    DataSkipping.mergeUpsert(s, base,
      Seq((6000L, "g0", -999.0)).toDF("id", "grp", "value"), Seq("id")) // v2
    val v1Batch = DataSkipping.readChangeFeed(s, base, 1L, Some(1L))
    IncrementalView.foldMinMaxBatch(s, base, view, "grp", "value",
      v1Batch, batchId = 1L, checkpoint = ckpt)
    val afterV1 = mmMap(IncrementalView.readView(s, view, "grp"))
    assert(afterV1("g0")._1 === Some(BigDecimal(5)),
      s"lagging fold must recompute at v1: ${afterV1("g0")}")

    // replay of the same batchId is a detected no-op
    IncrementalView.foldMinMaxBatch(s, base, view, "grp", "value",
      v1Batch, batchId = 1L, checkpoint = ckpt)
    assert(mmMap(IncrementalView.readView(s, view, "grp"))("g0")._1
      === Some(BigDecimal(5)))

    // the consumer then folds v2 as its next batch (same channel —
    // the txn watermark means a REAL stream would deliver exactly
    // this continuation) and converges with the live recompute
    val v2Batch = DataSkipping.readChangeFeed(s, base, 2L, Some(2L))
    IncrementalView.foldMinMaxBatch(s, base, view, "grp", "value",
      v2Batch, batchId = 2L, checkpoint = ckpt)
    assert(mmMap(IncrementalView.readView(s, view, "grp"))
      === mmMap(mmExpect(s, base)))
  }

  test("min/max view: emptied group tombstones and a later re-insert resurrects it") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ivw_mmdead")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainMinMax(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh()
    // g2 = ids with i % 5 == 2
    DataSkipping.deleteWhere(s, base, col("id") % 5 === 2L)          // v1
    assert(!mmMap(refresh()).contains("g2"), "emptied group must vanish")
    DataSkipping.mergeUpsert(s, base,
      Seq((7000L, "g2", 42.0)).toDF("id", "grp", "value"), Seq("id")) // v2
    val after = mmMap(refresh())
    assert(after("g2") === ((Some(BigDecimal(42)), Some(BigDecimal(42)), 1L)))
    assert(after === mmMap(mmExpect(s, base)))
  }

  test("a group emptied by deletes leaves the view entirely") {
    val s = spark
    val root = tmpDir("ivw_dead")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh()
    // g3 = ids with id % 5 == 3 — delete every one of them
    DataSkipping.deleteWhere(s, base, col("id") % 5 === 3)
    val view = refresh()
    assert(!viewMap(view).contains("g3"),
      "a zero-count group must be deleted from the view, not kept as a 0 row")
    assert(viewMap(view).keySet === Set("g0", "g1", "g2", "g4"))
  }

  test("refresh with no new DML is a no-op; a re-refresh never double-applies a version") {
    val s = spark
    val root = tmpDir("ivw_idem")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh()
    DataSkipping.deleteWhere(s, base, col("id") < 100L)
    val after = viewMap(refresh())
    // two more refreshes with nothing new: the checkpointed offset
    // must make them no-ops (a double-applied v1 would debit twice)
    assert(viewMap(refresh()) === after)
    assert(viewMap(refresh()) === after)
    // and the view's generation history shows no extra DML between
    // the idle refreshes (bootstrap WRITE + fold MERGE only)
    val ops = DataSkipping.describeHistory(s, s"$root/view")
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops === Seq("MERGE", "WRITE"),
      s"idle refreshes must not commit view generations, got $ops")
  }

  test("crash window: a batch whose view MERGE committed but whose offset didn't replays as a no-op") {
    val s = spark
    val root = tmpDir("ivw_crash")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh() // bootstrap
    DataSkipping.deleteWhere(s, base, col("id") < 100L) // v1
    refresh() // folds v1, stamps its batch id into the view
    val after = viewMap(IncrementalView.readView(s, s"$root/view", "grp"))
    val appId = IncrementalView.viewAppId(s"$root/view", s"$root/ckpt")
    val stamped = DataSkipping.txnVersion(s, s"$root/view", appId)
    assert(stamped.nonEmpty, "the fold must stamp its txn version")

    // foreachBatch's classic crash: the MERGE committed (the state
    // above) but the stream's offset commit was lost — the engine
    // replays the SAME batch under the SAME batch id. Reconstruct
    // that batch from the immutable feed and re-fold it directly.
    val replayBatch = DataSkipping.readChangeFeed(s, base, fromVersion = 1L)
    IncrementalView.foldBatch(s, s"$root/view", "grp", "value",
      replayBatch, stamped.get, s"$root/ckpt")
    assert(viewMap(IncrementalView.readView(s, s"$root/view", "grp")) === after,
      "a replayed batch must not double-apply its deltas")
    // control: the same batch under a NEW id DOES apply — proving the
    // txn guard (not an accident of the data) kept the replay inert
    IncrementalView.foldBatch(s, s"$root/view", "grp", "value",
      replayBatch, stamped.get + 1, s"$root/ckpt")
    assert(viewMap(IncrementalView.readView(s, s"$root/view", "grp")) !== after,
      "the control double-apply must change the view")
  }

  test("a view re-pointed at a FRESH checkpoint still folds (txn watermark is checkpoint-scoped)") {
    val s = spark
    val root = tmpDir("ivw_ckpt")
    val base = s"$root/base"
    buildBase(s, base)
    IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckptA") // bootstrap
    DataSkipping.deleteWhere(s, base, col("id") < 50L) // v1
    IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckptA") // fold @ A
    // hand over to checkpoint B while A and the view agree (the
    // documented single-maintainer handover point) — B's feed pins at
    // the CURRENT version, so nothing is owed at switch time
    IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckptB")
    DataSkipping.deleteWhere(s, base, col("id") >= 450L) // v2
    val view = IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckptB")
    // B's first fold runs at batchId 0; a view-scoped watermark would
    // compare it against A's stamp and silently skip the fold while
    // B's offsets commit — permanent loss. Checkpoint-scoped app ids
    // keep B's watermark independent.
    val expect = DataSkipping.readSkipping(s, base, col("id") >= 0L)
      .groupBy("grp").agg(
        sum(col("value").cast("decimal(20,6)")).cast("decimal(30,6)")
          .as("sum_value"),
        count(lit(1)).as("cnt"))
    assert(viewMap(view.orderBy("grp")) === viewMap(expect.orderBy("grp")),
      "the fresh checkpoint's folds must apply, not skip on the old watermark")
  }

  test("null group keys are rejected loudly, not silently duplicated") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ivw_null")
    val base = s"$root/base"
    DataSkipping.writeWithStats(
      (0L until 100L).map(i =>
        (i, if (i % 10 == 0) null else s"g${i % 5}", i.toDouble))
        .toDF("id", "grp", "value").repartitionByRange(4, col("id")),
      base, Seq("id"), bloomCols = Nil, changeFeed = true)
    def refresh() = IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh() // bootstrap aggregates nulls fine (no fold involved)
    DataSkipping.deleteWhere(s, base, col("id") < 30L) // deletes null rows too
    val e = intercept[Exception](refresh())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("NULL grp")),
      s"expected the null-group reject, got: ${msgs(e).mkString(" | ")}")
  }

  test("fold plan shape: broadcast semi-join against the delta keys, no collected IN literal") {
    val s = spark
    val root = tmpDir("ivw_shape")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh() // bootstrap
    DataSkipping.deleteWhere(s, base, col("id") < 100L) // v1

    val executed = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val optimized = new java.util.concurrent.CopyOnWriteArrayList[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        executed.add(qe.executedPlan.toString)
        optimized.add(qe.optimizedPlan)
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      refresh() // folds v1 through the listener
      // listener delivery is async — poll for the join evidence
      val deadline = System.currentTimeMillis() + 15000
      def hasBroadcastSemi = executed.toArray.exists { p =>
        val str = p.toString
        str.contains("BroadcastHashJoin") && str.contains("LeftSemi")
      }
      while (!hasBroadcastSemi && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(hasBroadcastSemi,
        "the fold must select affected view groups via a broadcast semi-join")
      // and NO plan anywhere in the fold carries a collected GROUP-KEY
      // IN literal (the r8 shape this replaces). Manifest-processing
      // INs on file lists (the accepted Delta-snapshot pattern) and
      // the 2-element _change_type sign split are exempt — the
      // assertion targets the group column only.
      import org.apache.spark.sql.catalyst.expressions.{In, InSet}
      optimized.forEach { plan =>
        plan.foreach(_.expressions.foreach(_.foreach {
          case i: In if i.value.references.exists(_.name == "grp") =>
            fail(s"collected group-key IN literal in fold plan: $i")
          case i: InSet if i.child.references.exists(_.name == "grp") =>
            fail(s"collected group-key INSET literal in fold plan: $i")
          case _ => ()
        }))
      }
    } finally s.listenerManager.unregister(listener)
  }

  test("randomized DML sequences: the fold equals the recompute at every refresh point") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ivw_rand")
    val base = s"$root/base"
    buildBase(s, base)
    def refresh() = IncrementalView.maintainSumCount(
      s, base, s"$root/view", "grp", "value", s"$root/ckpt")
    refresh() // bootstrap
    def recompute() = viewMap(
      DataSkipping.readSkipping(s, base, col("id") >= 0L)
        .groupBy("grp").agg(
          sum(col("value").cast("decimal(20,6)")).cast("decimal(30,6)")
            .as("sum_value"),
          count(lit(1)).as("cnt")))

    // deterministic pseudo-random op sequence: deletes, value
    // updates, GROUP-MIGRATING updates, merges (updates + inserts),
    // with refreshes interleaved so some folds span multiple
    // versions and some span one
    val rnd = new scala.util.Random(20260813L)
    var nextInsert = 5000L
    (1 to 8).foreach { step =>
      rnd.nextInt(4) match {
        case 0 =>
          val lo = rnd.nextInt(450)
          DataSkipping.deleteWhere(s, base,
            col("id") >= lo.toLong && col("id") < (lo + 25).toLong)
        case 1 =>
          val lo = rnd.nextInt(450)
          DataSkipping.updateWhere(s, base,
            col("id") >= lo.toLong && col("id") < (lo + 30).toLong,
            Map("value" -> (col("value") * 2 + 1)))
        case 2 =>
          val lo = rnd.nextInt(450)
          DataSkipping.updateWhere(s, base,
            col("id") >= lo.toLong && col("id") < (lo + 20).toLong,
            Map("grp" -> concat(lit("m"), (col("id") % 3).cast("string")),
              "value" -> (col("value") - 10)))
        case 3 =>
          val ins = nextInsert; nextInsert += 50
          val existingLo = rnd.nextInt(400)
          val src = s.range(existingLo.toLong, existingLo + 15L)
            .select(col("id"), concat(lit("g"), (col("id") % 5).cast("string")).as("grp"),
              (col("id") * 3).cast("double").as("value"))
            .unionByName(s.range(ins, ins + 10L)
              .select(col("id"), lit("gIns").as("grp"),
                col("id").cast("double").as("value")))
          DataSkipping.mergeUpsert(s, base, src, Seq("id"))
      }
      if (step % 2 == 0 || rnd.nextBoolean()) {
        assert(viewMap(refresh()) === recompute(),
          s"fold diverged from recompute after step $step")
      }
    }
    assert(viewMap(refresh()) === recompute(), "final state must agree")
  }

  test("forced batch splits (maxVersionsPerTrigger 1/2/3): every split of the same DML program folds to the same view") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ivw_split")
    val base = s"$root/base"
    buildBase(s, base)
    // a DML program whose versions interact across batch boundaries:
    // v1 deletes extrema, v2 migrates groups, v3 merges (update +
    // insert), v4 deletes an entire group — split-sensitive for both
    // the signed-sum fold and the min/max recompute-vs-formula choice
    DataSkipping.deleteWhere(s, base, col("id") < 20L)                  // v1
    DataSkipping.updateWhere(s, base, col("id") >= 400L && col("id") < 440L,
      Map("grp" -> lit("gX"), "value" -> (col("value") * -1)))          // v2
    DataSkipping.mergeUpsert(s, base,
      ((100L until 120L).map(i => (i, s"g${i % 5}", i * 7.0)) ++
        (8000L until 8010L).map(i => (i, "gNew", i.toDouble)))
        .toDF("id", "grp", "value"), Seq("id"))                         // v3
    DataSkipping.deleteWhere(s, base, col("grp") === "g4")              // v4
    val sumExpect = viewMap(
      DataSkipping.readSkipping(s, base, col("id") >= 0L)
        .groupBy("grp").agg(
          sum(col("value").cast("decimal(20,6)")).cast("decimal(30,6)")
            .as("sum_value"),
          count(lit(1)).as("cnt")))
    val mmExp = mmMap(mmExpect(s, base))
    // mvpt = 1 → four single-version batches; 2 → {v1,v2},{v3,v4};
    // 3 → {v1,v2,v3},{v4}; each drained by ONE AvailableNow run
    // through the real engine multi-batch path
    (1 to 3).foreach { mvpt =>
      val sumView = viewMap(IncrementalView.maintainSumCount(
        s, base, s"$root/sview$mvpt", "grp", "value", s"$root/sck$mvpt",
        maxVersionsPerTrigger = mvpt))
      assert(sumView === sumExpect,
        s"sum/count fold diverged at maxVersionsPerTrigger=$mvpt")
      val mmView = mmMap(IncrementalView.maintainMinMax(
        s, base, s"$root/mview$mvpt", "grp", "value", s"$root/mck$mvpt",
        maxVersionsPerTrigger = mvpt))
      assert(mmView === mmExp,
        s"min/max fold diverged at maxVersionsPerTrigger=$mvpt")
    }
    // NOTE: these views bootstrap AFTER the DML (snapshot at v4, feed
    // pinned at v5) — so also drive post-bootstrap splits: two more
    // versions folded 1-at-a-time vs 2-at-once must agree
    DataSkipping.updateWhere(s, base, col("grp") === "g0",
      Map("value" -> (col("value") + 1000)))                            // v5
    DataSkipping.deleteWhere(s, base, col("id") % 2 === 1L)             // v6
    val after = viewMap(
      DataSkipping.readSkipping(s, base, col("id") >= 0L)
        .groupBy("grp").agg(
          sum(col("value").cast("decimal(20,6)")).cast("decimal(30,6)")
            .as("sum_value"),
          count(lit(1)).as("cnt")))
    val afterMm = mmMap(mmExpect(s, base))
    (1 to 3).foreach { mvpt =>
      assert(viewMap(IncrementalView.maintainSumCount(
        s, base, s"$root/sview$mvpt", "grp", "value", s"$root/sck$mvpt",
        maxVersionsPerTrigger = mvpt)) === after,
        s"post-bootstrap sum fold diverged at maxVersionsPerTrigger=$mvpt")
      assert(mmMap(IncrementalView.maintainMinMax(
        s, base, s"$root/mview$mvpt", "grp", "value", s"$root/mck$mvpt",
        maxVersionsPerTrigger = mvpt)) === afterMm,
        s"post-bootstrap min/max fold diverged at maxVersionsPerTrigger=$mvpt")
    }
  }

  test("batch-id numbering across the bootstrap's empty run: the txn guard can never skip a real batch") {
    val s = spark
    val root = tmpDir("ivw_bid")
    val base = s"$root/base"
    buildBase(s, base)
    val view = s"$root/view"
    val ckpt = s"$root/ckpt"
    def refresh() = IncrementalView.maintainSumCount(
      s, base, view, "grp", "value", ckpt, maxVersionsPerTrigger = 1)
    def committedBatchIds: Seq[Long] = {
      val d = new java.io.File(s"$ckpt/commits")
      if (!d.exists) Nil
      else d.listFiles.toSeq.map(_.getName).filter(_.forall(_.isDigit))
        .map(_.toLong).sorted
    }
    refresh() // bootstrap: feed pinned after v0, nothing owed
    val bootIds = committedBatchIds
    val appId = IncrementalView.viewAppId(view, ckpt)
    // whatever batch ids the empty bootstrap run committed (engine-
    // version detail), NO txn may be stamped for them — an empty
    // batch that stamped a watermark would make the guard skip the
    // first REAL batch if the engine reuses its id
    assert(DataSkipping.txnVersion(s, view, appId).isEmpty,
      "the empty bootstrap run must not advance the txn watermark")

    // four real versions, folded across THREE separate runs (mvpt=1
    // forces one version per batch): every committed-and-stamped pair
    // must line up, and the view must track the recompute exactly —
    // a guard skip of any real batch shows up as a divergence here
    def recompute() = viewMap(
      DataSkipping.readSkipping(s, base, col("id") >= 0L)
        .groupBy("grp").agg(
          sum(col("value").cast("decimal(20,6)")).cast("decimal(30,6)")
            .as("sum_value"),
          count(lit(1)).as("cnt")))
    (1 to 3).foreach { wave =>
      DataSkipping.deleteWhere(s, base,
        col("id") >= (wave * 100L) && col("id") < (wave * 100L + 30L))
      if (wave == 2) // one wave carries TWO versions → two batches
        DataSkipping.updateWhere(s, base, col("grp") === "g1",
          Map("value" -> (col("value") + 7)))
      assert(viewMap(refresh()) === recompute(),
        s"view diverged from recompute at wave $wave")
      val ids = committedBatchIds
      assert(ids === ids.sorted && ids.distinct == ids,
        s"batch ids must advance monotonically, never reuse: $ids")
      // the stamped watermark equals the HIGHEST batch id that
      // carried change rows — never ahead of the checkpoint (which
      // would skip future real batches)
      val stamped = DataSkipping.txnVersion(s, view, appId)
      assert(stamped.exists(_ <= ids.max),
        s"txn watermark $stamped must not outrun committed batches ${ids.max}")
    }
    assert(committedBatchIds.size > bootIds.size + 2,
      "the waves must have committed real batches beyond the bootstrap run")
  }

  test("a feed-less base table is refused") {
    val s = spark
    import s.implicits._
    val root = tmpDir("ivw_off")
    val base = s"$root/base"
    DataSkipping.writeWithStats(
      (0L until 100L).map(i => (i, s"g${i % 5}", i.toDouble))
        .toDF("id", "grp", "value"), base, Seq("id"))
    val e = intercept[IllegalArgumentException](
      IncrementalView.maintainSumCount(
        s, base, s"$root/view", "grp", "value", s"$root/ckpt"))
    assert(e.getMessage.contains("no change data feed"))
  }
}
