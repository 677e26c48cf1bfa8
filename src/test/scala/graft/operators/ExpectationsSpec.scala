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

  test("null predicate results count as violations: retained + dropped == input") {
    val s = spark
    import s.implicits._
    val df = Seq((1, Some(0.5)), (2, None), (3, Some(-0.1)))
      .toDF("id", "x") // row 2: x is null -> predicate is null
    val res = Expectations(df, Seq(
      Expectations.ruleOrDrop("x_nonneg", col("x") >= 0)))
    assert(res.retained.select("id").collect().map(_.getInt(0)).toSeq === Seq(1))
    assert(res.dropped.select("id").collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 3))
    val m = res.metrics.collect().head
    assert((m.getLong(1), m.getLong(2)) === ((1L, 2L)))
  }

  test("run enforces Fail from the single metrics scan and returns local metrics") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 0.5), (2, -0.1)).toDF("id", "x")
    val ok = Expectations.run(df, Seq(
      Expectations.rule("warn_neg", col("x") >= 0),
      Expectations.ruleOrFail("id_pos", col("id") > 0)))
    // metrics came back collected: a local relation, no scan on use
    assert(ok.metrics.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val m = ok.metrics.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m("warn_neg") === ((1L, 1L)) && m("id_pos") === ((2L, 0L)))
    val e = intercept[IllegalStateException] {
      Expectations.run(df, Seq(Expectations.ruleOrFail("x_nonneg", col("x") >= 0)))
    }
    assert(e.getMessage.contains("x_nonneg"))
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
