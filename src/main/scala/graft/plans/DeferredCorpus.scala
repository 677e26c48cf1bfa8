package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}

/** A corpus-producing statement whose pipeline is INHERENTLY EAGER
  * (iterative connected-component resolution with data-dependent
  * convergence — `Dedup.deduplicate`'s localCheckpoint loop), carried
  * through parsing and planning as a LAZY leaf: the parser returns
  * this node with the statement's schema only; `EXPLAIN`, plan
  * caching, and re-parses never run a job. The pipeline executes
  * exactly once, inside [[DeferredCorpusExec.doExecute]], when the
  * statement's rows are actually demanded.
  *
  * `build` must return a frame with exactly `output`'s schema and is
  * responsible for its own cache hygiene (release intermediate
  * persists once its RESULT no longer references them — e.g. after
  * the dedup losers frame is checkpointed).
  */
case class DeferredCorpusPlan(
    label: String,
    output: Seq[Attribute],
    @transient build: () => DataFrame) extends LeafNode {
  // size unknown until the pipeline runs — defaultSizeInBytes keeps
  // the node out of any broadcast-join auto-selection
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = conf.defaultSizeInBytes)
  override def simpleString(maxFields: Int): String =
    s"DeferredCorpus $label"
}

/** Physical side of [[DeferredCorpusPlan]]: runs the deferred
  * pipeline at execution time and hands back its rows. The inner
  * frame's own query execution plans and runs within this node's
  * execute — its eager steps (checkpoint loops, scoped caches) happen
  * HERE, never at parse/explain time.
  */
case class DeferredCorpusExec(
    output: Seq[Attribute],
    label: String,
    @transient build: () => DataFrame) extends LeafExecNode {

  private def built: DataFrame = {
    val df = build()
    require(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        output.map(a => (a.name, a.dataType)),
      s"deferred corpus '$label' produced schema ${df.schema.simpleString}, " +
        s"declared ${output.map(a => s"${a.name}:${a.dataType.simpleString}").mkString(",")}")
    df
  }

  override protected def doExecute(): RDD[InternalRow] =
    built.queryExecution.toRdd

  override def simpleString(maxFields: Int): String =
    s"DeferredCorpus $label"
}

/** Plans [[DeferredCorpusPlan]] leaves; a no-op for everything else.
  * Registered by [[GraftExtensions]].
  */
class DeferredCorpusStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case d: DeferredCorpusPlan =>
      DeferredCorpusExec(d.output, d.label, d.build) :: Nil
    case _ => Nil
  }
}
