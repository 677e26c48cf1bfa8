package graft.streaming

import graft.SparkSpec
import graft.operators.Expectations
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("DAG runs in dependency order with drop expectations applied") {
    val s = spark
    import s.implicits._
    var metricsSeen = Map.empty[String, Map[String, Long]]

    val p = new Pipeline()
    p.table("silver", "bronze") { deps =>
      deps("bronze").withColumn("qty2", col("qty") * 2)
    }
    p.tableWithExpectations("gold", Seq("silver"),
      Seq(Expectations.ruleOrDrop("qty_positive", col("qty") > 0))) { deps =>
      deps("silver").select("id", "qty", "qty2")
    }
    p.table("bronze") { _ =>
      Seq((1, 10), (2, -5), (3, 7)).toDF("id", "qty")
    }

    assert(p.order === Seq("bronze", "silver", "gold"))
    val built = p.run(onMetrics = (name, m) =>
      metricsSeen += name -> m.collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap)

    assert(built("gold").count() === 2) // -5 row dropped
    assert(metricsSeen("gold")("qty_positive") === 1) // one violation
  }

  test("fail expectation aborts the run") {
    val s = spark
    import s.implicits._
    val p = new Pipeline()
    p.table("src") { _ => Seq((1, -1)).toDF("id", "qty") }
    p.tableWithExpectations("out", Seq("src"),
      Seq(Expectations.ruleOrFail("qty_positive", col("qty") > 0))) { deps =>
      deps("src")
    }
    val e = intercept[IllegalStateException](p.run())
    assert(e.getMessage.contains("qty_positive"))
  }

  test("cycles are rejected") {
    val s = spark
    import s.implicits._
    val p = new Pipeline()
    p.table("a", "b") { d => d("b") }
    p.table("b", "a") { d => d("a") }
    val e = intercept[IllegalArgumentException](p.order)
    assert(e.getMessage.contains("cycle"))
  }
}
