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
