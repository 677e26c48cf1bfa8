package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("termStats computes tf and df on a known corpus") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark spark catalyst"),
      (2L, "spark tungsten"),
      (3L, "catalyst rules")).toDF("doc_id", "text")
    val stats = TextOps.termStats(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(stats((1L, "spark")) === ((2L, 2L))) // tf 2, in 2 docs
    assert(stats((2L, "spark")) === ((1L, 2L)))
    assert(stats((1L, "catalyst")) === ((1L, 2L)))
    assert(stats((3L, "rules")) === ((1L, 1L)))
  }

  test("tfidf ranks rare terms above ubiquitous ones") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat"), (2L, "the dog"), (3L, "the fish"), (4L, "the axolotl")).toDF("doc_id", "text")
    val scores = TextOps.tfidf(docs, "doc_id", "text", numDocs = 4)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    // 'the' (df=4) must score below any df=1 term, and idf math checks out
    assert(scores((4L, "axolotl")) > scores((4L, "the")))
    val expectedRare = 1.0 * (math.log(5.0 / 2.0) + 1)
    assert(math.abs(scores((4L, "axolotl")) - expectedRare) < 1e-12)
  }

  test("redact replaces emails, phones and card numbers, leaves prose") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "contact alice@example.com or +1 (555) 123-4567",
      "card 4111111111111111 expires soon",
      "no pii here, just 42 words").toDF("text")
    val out = df.select(TextOps.redact(col("text")).as("t"))
      .collect().map(_.getString(0))
    assert(out(0) === "contact <EMAIL> or <PHONE>")
    assert(out(1) === "card <NUMBER> expires soon")
    assert(out(2) === "no pii here, just 42 words")
  }
}
