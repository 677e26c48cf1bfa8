package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable data-quality expectations — the DLT expectations idiom
  * (`@dlt.expect`, `@dlt.expect_or_drop`, `@dlt.expect_or_fail`) as
  * a plain Spark API any pipeline author can attach to a DataFrame.
  *
  * Scale: `metrics` is ONE aggregate scan producing every rule's
  * pass/fail counts as a wide partial-aggregated row, unpivoted to
  * (rule, n_pass, n_fail) with a single explode — never one scan
  * (or one union branch) per rule.
  */
object Expectations {

  sealed trait Action
  /** Keep violating rows; only record metrics (DLT `expect`). */
  case object Warn extends Action
  /** Filter violating rows out (DLT `expect_or_drop`). */
  case object Drop extends Action
  /** Abort the pipeline if any row violates (DLT `expect_or_fail`). */
  case object Fail extends Action

  final case class Rule(name: String, predicate: Column, action: Action = Warn)

  final case class Result(
      retained: DataFrame,
      dropped: DataFrame,
      metrics: DataFrame)

  def rule(name: String, predicate: Column): Rule = Rule(name, predicate)
  def ruleOrDrop(name: String, predicate: Column): Rule = Rule(name, predicate, Drop)
  def ruleOrFail(name: String, predicate: Column): Rule = Rule(name, predicate, Fail)

  /** Per-rule pass/fail counts: one scan, one wide aggregate, one
    * unpivot.
    */
  def metrics(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(sum(when(r.predicate, 1L).otherwise(0L)).as(s"__p_$i"),
        sum(when(r.predicate, 0L).otherwise(1L)).as(s"__f_$i"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"),
          coalesce(col(s"__p_$i"), lit(0L)).as("n_pass"),
          coalesce(col(s"__f_$i"), lit(0L)).as("n_fail"))
      }: _*)).as("__m"))
      .select(col("__m.rule").as("rule"), col("__m.n_pass").as("n_pass"),
        col("__m.n_fail").as("n_fail"))
  }

  /** Apply the rules: retained/dropped split (Drop + Fail rules
    * filter; Warn rules don't) plus the metrics frame. Lazy — no
    * job runs until a returned frame is acted on.
    *
    * The split is NULL-SAFE: a predicate evaluating to null (e.g.
    * `col("x") >= 0` with null x) counts as a violation, so the row
    * lands in `dropped` — matching `metrics`, which counts non-true
    * as fail, and guaranteeing retained + dropped == input. A plain
    * `filter(keep)` / `filter(!keep)` pair would silently lose
    * null-violation rows from BOTH frames.
    */
  def apply(df: DataFrame, rules: Seq[Rule]): Result = {
    val filtering = rules.filter(r => r.action != Warn).map(_.predicate)
    val keep = coalesce(filtering.reduceOption(_ && _).getOrElse(lit(true)), lit(false))
    Result(
      retained = df.filter(keep),
      dropped = df.filter(!keep),
      metrics = metrics(df, rules))
  }

  /** Eager single-scan variant for pipeline runners: runs the
    * metrics aggregate ONCE, enforces Fail rules from its
    * (rules-sized) collected result, and returns the metrics as a
    * LOCAL relation the caller can reuse freely — unlike chaining
    * [[enforce]] + [[apply]] + a metrics callback, which scans the
    * input up to three times. `retained`/`dropped` stay lazy views
    * that re-scan `df` when acted on (cache `df` upstream if both
    * are consumed).
    */
  def run(df: DataFrame, rules: Seq[Rule]): Result = {
    val lazyRes = apply(df, rules)
    val rows = lazyRes.metrics.collect()
    val failNames = rules.filter(_.action == Fail).map(_.name).toSet
    val bad = rows.filter(r => failNames.contains(r.getString(0)) && r.getLong(2) > 0)
      .map(r => s"${r.getString(0)} (${r.getLong(2)} rows)")
    if (bad.nonEmpty)
      throw new IllegalStateException(s"expectation(s) failed: ${bad.mkString(", ")}")
    val localMetrics = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), lazyRes.metrics.schema)
    lazyRes.copy(metrics = localMetrics)
  }

  /** Enforce Fail rules: runs the metrics scan and throws if any
    * `Fail` rule has violations — the `expect_or_fail` gate a
    * pipeline runner calls before publishing a table.
    */
  def enforce(df: DataFrame, rules: Seq[Rule]): Unit = {
    val failRules = rules.filter(_.action == Fail)
    if (failRules.nonEmpty) {
      val bad = metrics(df, failRules).filter(col("n_fail") > 0)
        .collect().map(r => s"${r.getString(0)} (${r.getLong(2)} rows)")
      if (bad.nonEmpty)
        throw new IllegalStateException(
          s"expectation(s) failed: ${bad.mkString(", ")}")
    }
  }
}
