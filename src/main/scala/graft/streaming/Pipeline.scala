package graft.streaming

import graft.operators.Expectations
import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** A miniature declarative pipeline DSL — the DLT engine analog.
  *
  * The reference declares tables with `@dlt.table` decorators plus
  * dependencies via `dlt.read`/`dlt.read_stream`, and the DLT engine
  * resolves the DAG and runs it on a trigger
  * (pos-dlt `03_Bronze-to-Silver ETL.py` decorators,
  * `05_DLT Job Scheduling.py`, `pipelines.trigger.interval`).
  * Here: tables are named builders over their dependencies; `run()`
  * topologically sorts, applies each table's expectations
  * (Warn/Drop/Fail — see [[graft.operators.Expectations]]), and
  * materializes the DAG once; `runEvery` is the triggered-pipeline
  * analog that re-runs the DAG on an interval.
  */
final class Pipeline {

  final case class TableDef(
      name: String,
      deps: Seq[String],
      build: Map[String, DataFrame] => DataFrame,
      expectations: Seq[Expectations.Rule])

  private val defs = mutable.LinkedHashMap[String, TableDef]()

  /** Declare a table. `build` receives the resolved dependency
    * frames by name.
    */
  def table(name: String, deps: String*)(
      build: Map[String, DataFrame] => DataFrame): Pipeline = {
    tableWithExpectations(name, deps, Nil)(build)
    this
  }

  def tableWithExpectations(
      name: String, deps: Seq[String],
      expectations: Seq[Expectations.Rule])(
      build: Map[String, DataFrame] => DataFrame): Pipeline = {
    require(!defs.contains(name), s"duplicate table $name")
    defs(name) = TableDef(name, deps, build, expectations)
    this
  }

  /** Dependency-ordered table names (cycle -> IllegalArgumentException). */
  def order: Seq[String] = {
    val visiting = mutable.Set[String]()
    val done = mutable.LinkedHashSet[String]()
    def visit(n: String): Unit = {
      if (!done.contains(n)) {
        require(!visiting.contains(n), s"dependency cycle through $n")
        val d = defs.getOrElse(n,
          throw new IllegalArgumentException(s"unknown table $n"))
        visiting += n
        d.deps.foreach(visit)
        visiting -= n
        done += n
      }
    }
    defs.keys.foreach(visit)
    done.toSeq
  }

  /** Build every table in dependency order. Expectations: Drop/Fail
    * rules filter the published frame, Fail rules are enforced
    * (throw on violation), Warn rules only shape the metrics
    * callback.
    *
    * Cost: ONE metrics aggregate per expectation-bearing table per
    * run ([[Expectations.run]] — the Fail gate and the callback
    * share its collected result). The published (retained) frame is
    * a lazy view that re-scans its inputs when downstream tables
    * consume it — callers chaining heavy tables can `.cache()`
    * inside `build`.
    */
  def run(onMetrics: (String, DataFrame) => Unit = (_, _) => ()): Map[String, DataFrame] = {
    val built = mutable.LinkedHashMap[String, DataFrame]()
    order.foreach { name =>
      val d = defs(name)
      val raw = d.build(d.deps.map(dep => dep -> built(dep)).toMap)
      val published =
        if (d.expectations.isEmpty) raw
        else {
          val res = Expectations.run(raw, d.expectations)
          onMetrics(name, res.metrics)
          res.retained
        }
      built(name) = published
    }
    built.toMap
  }

  /** Triggered-pipeline analog: re-run the DAG every `intervalMs`
    * for `rounds` rounds (the test-friendly, bounded form of
    * `pipelines.trigger.interval`).
    */
  def runEvery(intervalMs: Long, rounds: Int)(
      onRound: Map[String, DataFrame] => Unit): Unit =
    (1 to rounds).foreach { r =>
      onRound(run())
      if (r < rounds) Thread.sleep(intervalMs)
    }
}
