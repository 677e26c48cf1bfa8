package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD Type 2 derivation + incremental apply ([[Cdc.scdType2]] /
  * [[Cdc.scdType2Apply]]).
  */
class Scd2Spec extends SparkSpec {

  private def rows(df: DataFrame): Set[(Int, Int, Option[Int], String)] =
    df.collect().map { r =>
      (r.getAs[Int]("k"), r.getAs[Int]("__start_seq"),
        Option(r.getAs[Any]("__end_seq")).map(_.asInstanceOf[Int]),
        r.getAs[String]("v"))
    }.toSet

  test("versions tile exactly: each change opens at its seq and closes at the next") {
    val s = spark
    import s.implicits._
    val ch = Seq((1, 1, "a"), (1, 3, "b"), (1, 5, "c"), (2, 2, "x"))
      .toDF("k", "seq", "v")
    val hist = Cdc.scdType2(ch, Seq("k"), Seq("seq"), Seq("v"))
    assert(rows(hist) === Set(
      (1, 1, Some(3), "a"), (1, 3, Some(5), "b"), (1, 5, None, "c"),
      (2, 2, None, "x")))
  }

  test("a delete closes the current version without opening one; re-insert leaves the gap") {
    val s = spark
    import s.implicits._
    val ch = Seq((1, 1, "a", "U"), (1, 3, "", "D"), (1, 7, "b", "U"))
      .toDF("k", "seq", "v", "op")
    val hist = Cdc.scdType2(ch, Seq("k"), Seq("seq"), Seq("v"),
      deleteWhen = col("op") === "D")
    assert(rows(hist) === Set((1, 1, Some(3), "a"), (1, 7, None, "b")),
      "key must have NO version in [3,7) — that interval was deleted")
  }

  test("derivation is input-order independent (late data splices into place)") {
    val s = spark
    import s.implicits._
    val sorted = Seq((1, 1, "a", "U"), (1, 2, "b", "U"), (1, 4, "", "D"),
      (1, 6, "c", "U")).toDF("k", "seq", "v", "op")
    val shuffled = Seq((1, 6, "c", "U"), (1, 1, "a", "U"), (1, 4, "", "D"),
      (1, 2, "b", "U")).toDF("k", "seq", "v", "op")
    val a = Cdc.scdType2(sorted, Seq("k"), Seq("seq"), Seq("v"),
      deleteWhen = col("op") === "D")
    val b = Cdc.scdType2(shuffled, Seq("k"), Seq("seq"), Seq("v"),
      deleteWhen = col("op") === "D")
    assert(rows(a) === rows(b))
    assert(rows(a) === Set((1, 1, Some(2), "a"), (1, 2, Some(4), "b"),
      (1, 6, None, "c")))
  }

  test("collapseUnchanged drops no-op runs but keeps a re-insert after a delete") {
    val s = spark
    import s.implicits._
    val ch = Seq(
      (1, 1, "a", "U"), (1, 2, "a", "U"), (1, 3, "a", "U"), // run of a's
      (1, 5, "b", "U"),
      (2, 1, "x", "U"), (2, 3, "", "D"), (2, 5, "x", "U")   // x, gap, x again
    ).toDF("k", "seq", "v", "op")
    val hist = Cdc.scdType2(ch, Seq("k"), Seq("seq"), Seq("v"),
      deleteWhen = col("op") === "D", collapseUnchanged = true)
    assert(rows(hist) === Set(
      (1, 1, Some(5), "a"), (1, 5, None, "b"),
      // the post-delete x MUST survive: its predecessor is the delete
      (2, 1, Some(3), "x"), (2, 5, None, "x")))
  }

  test("same-seq tie: delete beats the update regardless of payload order") {
    val s = spark
    import s.implicits._
    // payload "z" sorts ABOVE the empty delete payload; if the tie
    // resolved by payload the update would win — assert it doesn't
    val ch = Seq((1, 1, "a", "U"), (1, 3, "z", "U"), (1, 3, "", "D"))
      .toDF("k", "seq", "v", "op")
    val hist = Cdc.scdType2(ch, Seq("k"), Seq("seq"), Seq("v"),
      deleteWhen = col("op") === "D")
    assert(rows(hist) === Set((1, 1, Some(3), "a")))
  }

  test("scdType2Apply: empty batch returns the history unchanged") {
    val s = spark
    import s.implicits._
    val ch = Seq((1, 1, "a", "U"), (1, 3, "b", "U"), (2, 2, "", "D"),
      (2, 4, "x", "U")).toDF("k", "seq", "v", "op")
    val hist = Cdc.scdType2(ch, Seq("k"), Seq("seq"), Seq("v"),
      deleteWhen = col("op") === "D")
    val empty = Seq.empty[(Int, Int, String, String)].toDF("k", "seq", "v", "op")
    val applied = Cdc.scdType2Apply(hist, empty, Seq("k"), Seq("seq"),
      Seq("v"), deleteWhen = col("op") === "D")
    assert(rows(applied) === rows(hist))
  }

  // ---- driver-side reference model (plain collections, no Spark) ----
  private type Ev = (Int, Int, String, String) // k, seq, v, op

  private def modelDerive(evs: Seq[Ev], collapse: Boolean)
      : Set[(Int, Int, Option[Int], String)] =
    evs.groupBy(_._1).toSeq.flatMap { case (k, kev) =>
      // tie collapse on (k, seq): delete wins, then max payload —
      // the engine's max(struct(del, payload)) precedence
      val bySeq = kev.groupBy(_._2).toSeq.map { case (seq, g) =>
        val del = g.exists(_._4 == "D")
        (seq, del, if (del) "" else g.map(_._3).max)
      }.sortBy(_._1)
      val kept =
        if (!collapse) bySeq
        else bySeq.foldLeft(List.empty[(Int, Boolean, String)]) { (acc, e) =>
          acc match {
            case prev :: _ if !e._2 && !prev._2 && prev._3 == e._3 => acc
            case _ => e :: acc
          }
        }.reverse
      kept.zip(kept.drop(1).map(n => Option(n._1)) :+ None)
        .collect { case ((seq, false, v), end) => (k, seq, end, v) }
    }.toSet

  private def modelReconstruct(hist: Set[(Int, Int, Option[Int], String)])
      : Seq[Ev] =
    hist.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val sorted = rows.toSeq.sortBy(_._2)
      val ups = sorted.map(r => (k, r._2, r._4, "U"))
      val dels = sorted.zip(sorted.drop(1).map(Some(_)) :+ None).collect {
        case ((_, _, Some(end), _), next) if !next.exists(_._2 == end) =>
          (k, end, "", "D")
      }
      ups ++ dels
    }

  test("randomized: incremental apply equals full rebuild (no collapse) / model replay (collapse)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 6; collapse <- Seq(false, true)) {
      val nKeys = 2 + rnd.nextInt(6)
      val events = (0 until nKeys).flatMap { k =>
        val n = 1 + rnd.nextInt(12)
        val seqs = rnd.shuffle((1 to 40).toList).take(n).sorted
        seqs.zipWithIndex.map { case (seq, i) =>
          // the key's FIRST event is always an upsert (a leading
          // delete is the documented unreconstructable case)
          val del = i > 0 && rnd.nextInt(5) == 0
          (k, seq, if (del) "" else s"v${rnd.nextInt(3)}",
            if (del) "D" else "U")
        }
      }
      // history gets each key's first event; the rest split randomly,
      // so batches carry genuinely out-of-order (earlier-seq) changes
      val (histEv, batchEv) = {
        val byKey = events.groupBy(_._1)
        val h = scala.collection.mutable.Buffer[(Int, Int, String, String)]()
        val b = scala.collection.mutable.Buffer[(Int, Int, String, String)]()
        byKey.values.foreach { evs =>
          val sortedEv = evs.sortBy(_._2)
          h += sortedEv.head
          sortedEv.tail.foreach(e =>
            if (rnd.nextBoolean()) h += e else b += e)
        }
        (h.toSeq, b.toSeq)
      }
      val del = col("op") === "D"
      val full = Cdc.scdType2(events.toDF("k", "seq", "v", "op"),
        Seq("k"), Seq("seq"), Seq("v"), del, collapse)
      val hist = Cdc.scdType2(histEv.toDF("k", "seq", "v", "op"),
        Seq("k"), Seq("seq"), Seq("v"), del, collapse)
      val applied = Cdc.scdType2Apply(hist,
        batchEv.toDF("k", "seq", "v", "op"),
        Seq("k"), Seq("seq"), Seq("v"), del, collapse)
      // engine-vs-model on both the full derivation and the history
      assert(rows(full) === modelDerive(events, collapse),
        s"full != model trial=$trial collapse=$collapse events=$events")
      assert(rows(hist) === modelDerive(histEv, collapse),
        s"hist != model trial=$trial collapse=$collapse hist=$histEv")
      // the universal contract: replay-from-state — the correct
      // derivation of (model-reconstructable history ∪ batch)
      val expected = modelDerive(
        modelReconstruct(modelDerive(histEv, collapse)) ++ batchEv,
        collapse)
      assert(rows(applied) === expected,
        s"trial=$trial collapse=$collapse hist=$histEv batch=$batchEv")
      // exactness: when the history carries full information — no
      // collapse, and every history delete actually closed a version
      // (a delete on an already-dead key leaves no trace) — the
      // incremental result IS the full rebuild
      val noNoopDeletes = histEv.groupBy(_._1).values.forall { kev =>
        kev.sortBy(_._2).foldLeft((true, true)) { case ((ok, dead), e) =>
          if (e._4 == "D") (ok && !dead, true) else (ok, false)
        }._1
      }
      if (!collapse && noNoopDeletes)
        assert(rows(applied) === rows(full),
          s"trial=$trial hist=$histEv batch=$batchEv")
    }
  }

  test("documented bound: a leading delete leaves no trace, so an earlier late row stays open") {
    val s = spark
    import s.implicits._
    // key 1's ONLY history event is a delete at seq 2 — it closed
    // nothing, so the history has no row and the delete is gone
    val hist = Cdc.scdType2(
      Seq((1, 2, "", "D")).toDF("k", "seq", "v", "op"),
      Seq("k"), Seq("seq"), Seq("v"), col("op") === "D")
    assert(hist.isEmpty)
    // a late upsert at seq 1 can no longer be closed by it: the
    // replay-from-state semantics keep it open (full-log replay
    // would have ended it at 2 — this pins the documented bound)
    val applied = Cdc.scdType2Apply(hist,
      Seq((1, 1, "a", "U")).toDF("k", "seq", "v", "op"),
      Seq("k"), Seq("seq"), Seq("v"), col("op") === "D")
    assert(rows(applied) === Set((1, 1, None, "a")))
  }
}
