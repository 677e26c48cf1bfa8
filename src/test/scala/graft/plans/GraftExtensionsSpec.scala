package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSessionExtensions

class GraftExtensionsSpec extends SparkSpec {

  test("extensions injector registers every graft function description") {
    // applying to a fresh extensions object must inject all three
    // without touching the shared session
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // builders themselves must construct the right expression types
    val byName = GraftFunctions.descriptions.map { case (id, _, b) => id.funcName -> b }.toMap
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(byName("graft_dot")(Seq(Literal(null), Literal(null)))
      .isInstanceOf[DotProductFloat])
    assert(byName("graft_text_stats")(Seq(Literal(null), Literal(null)))
      .isInstanceOf[TextStats])
    assert(byName("graft_topk")(Seq(Literal(null), Literal(null), Literal(5)))
      .isInstanceOf[TopKPairs])
  }

  test("word n-grams expression matches Spark's split(trim(lower)) on whitespace-adversarial text") {
    // Spark trim strips only ' '; Spark split runs with limit -1
    // (trailing empties kept). Crawl text with leading/trailing
    // tabs/newlines is exactly where Java's String.trim/split
    // conveniences silently diverge — pin the expression against the
    // real engine composition, not a Java reference.
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq("\tleading tab", "trailing newline\n", "  spaced  ",
      "a\tb\nc", "", " ", "\n\n", "one", "x \t y", "\ta b\t").toDF("t")
    val n = 2
    val toks = split(trim(lower(col("t"))), "\\s+")
    val composed = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
    docs.select(col("t"),
        call_function("graft_word_ngrams", col("t"), lit(n)).as("e"),
        composed.as("c"))
      .collect()
      .foreach(r => assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"divergence on ${r.getString(0).replace("\n", "\\n").replace("\t", "\\t")}"))
  }

  test("runtime registrar exposes the functions through SQL") {
    GraftFunctions.register(spark)
    val d = spark.sql(
      "SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .head.getDouble(0)
    assert(d === 11.0)
    val st = spark.sql(
      "SELECT graft_text_stats('the quick brown fox', array('the')).n_hits AS h")
      .head.getLong(0)
    assert(st === 1L)
  }
}
