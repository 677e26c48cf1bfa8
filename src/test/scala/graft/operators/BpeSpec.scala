package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE tokenizer training ([[TextOps.learnBpe]]) + the codegen'd
  * greedy encoder ([[TextOps.bpeEncode]]).
  */
class BpeSpec extends SparkSpec {

  /** Driver reference model of the encode loop (independent of the
    * expression): lowest-rank adjacent pair merges first.
    */
  private def modelEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val ranks = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector :+ "</w>"
    var done = false
    while (!done && syms.length > 1) {
      val cands = syms.indices.dropRight(1)
        .flatMap(i => ranks.get((syms(i), syms(i + 1))).map(r => (r, i)))
      if (cands.isEmpty) done = true
      else {
        val (_, i) = cands.minBy(_._1) // lowest rank; leftmost on rank tie
        syms = syms.updated(i, syms(i) + syms(i + 1)).patch(i + 1, Nil, 1)
      }
    }
    syms
  }

  test("learnBpe reproduces the classic Sennrich progression on a hand corpus") {
    val s = spark
    import s.implicits._
    // 'low' x5, 'lowest' x2: most frequent pairs are l-o (7), o-w (7),
    // then the w</w> of 'low' (5)... deterministic, hand-checkable
    val docs = Seq.fill(5)("low").zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq((100L, "lowest lowest"))
    val merges = TextOps.learnBpe(docs.toDF("id", "text"), "text", numMerges = 4)
    // (l,o) and (lo,w) dominate: 'low' appears 7 times total as a prefix
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")), merges.toString)
    // next: 'low</w>' (freq 5) vs 'lowest' continuations (freq 2)
    assert(merges(2) == (("low", "</w>")), merges.toString)
  }

  test("expression encode equals the driver model on every corpus word") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 80).select(col("doc_id"), col("text"))
    val merges = TextOps.learnBpe(docs, "text", numMerges = 120)
    // a small corpus may exhaust pairs above minPairFreq before the
    // budget — early stop is correct, not a bug
    assert(merges.nonEmpty && merges.size <= 120)
    // encode a sample of real words both ways
    val words = docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0).distinct().limit(300)
      .collect().map(_.getString(0))
    val viaExpr = words.toSeq.toDF("w")
      .select(col("w"), TextOps.bpeEncode(col("w"), merges).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(viaExpr(w) == modelEncode(w, merges), s"word '$w'")
    }
  }

  test("tokens round-trip: concatenation restores the word; empty merges yield characters") {
    val s = spark
    import s.implicits._
    val merges = Seq(("a", "b"), ("ab", "c"))
    val rows = Seq("abc abcabc xyz", "  spaced  out  ")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val out = TextOps.bpeEncodeDocs(rows.toDF("id", "text"), "id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(0L) == Seq("abc", "</w>", "abc", "abc", "</w>", "x", "y", "z", "</w>"))
    // round-trip: strip markers, concat per word
    val restored = out(1L).mkString.split("</w>").filter(_.nonEmpty).toSeq
    assert(restored == Seq("spaced", "out"))
    val none = TextOps.bpeEncodeDocs(rows.toDF("id", "text"), "id", "text", Nil)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(none(0L).take(4) == Seq("a", "b", "c", "</w>"))
  }

  test("learning is deterministic and frequency-ordered; encode plan is shuffle-free codegen") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 50)
    val a = TextOps.learnBpe(docs, "text", numMerges = 60)
    val b = TextOps.learnBpe(docs.repartition(7), "text", numMerges = 60)
    assert(a == b, "merge table must not depend on partitioning")
    val enc = TextOps.bpeEncodeDocs(docs, "doc_id", "text", a)
    val plan = enc.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bpe_encode"), plan)
    assert(!plan.contains("Exchange"), plan)
    // every learned merge is actually reachable: applying the encoder
    // over the training corpus uses multi-char tokens
    val toks = enc.select(explode(col("tokens")).as("t"))
      .filter(length(col("t")) > 1 && col("t") =!= "</w>").count()
    assert(toks > 0L)
  }
}
