package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {

  test("metrics is one row per rule with pass/fail counts") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 0.5), (2, -0.1), (3, 1.2), (4, 0.9)).toDF("id", "x")
    val m = Expectations.metrics(df, Seq(
      Expectations.rule("x_nonneg", col("x") >= 0),
      Expectations.rule("x_below_1", col("x") <= 1.0)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m("x_nonneg") === ((3L, 1L)))
    assert(m("x_below_1") === ((3L, 1L)))
  }

  test("apply splits retained vs dropped on Drop rules only") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 0.5), (2, -0.1), (3, 1.2)).toDF("id", "x")
    val res = Expectations(df, Seq(
      Expectations.rule("warn_only", col("x") <= 1.0), // Warn: never filters
      Expectations.ruleOrDrop("x_nonneg", col("x") >= 0)))
    assert(res.retained.select("id").collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 3))
    assert(res.dropped.select("id").collect().map(_.getInt(0)).toSeq === Seq(2))
  }

  test("enforce throws on Fail violations and is silent otherwise") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 0.5), (2, -0.1)).toDF("id", "x")
    Expectations.enforce(df, Seq(Expectations.ruleOrFail("id_pos", col("id") > 0)))
    val e = intercept[IllegalStateException] {
      Expectations.enforce(df, Seq(Expectations.ruleOrFail("x_nonneg", col("x") >= 0)))
    }
    assert(e.getMessage.contains("x_nonneg") && e.getMessage.contains("1 rows"))
  }
}
