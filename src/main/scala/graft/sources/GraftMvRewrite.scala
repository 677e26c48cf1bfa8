package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Automatic materialized-view answering: a grouped aggregate over a
  * graft base table whose shape a registered incrementally-maintained
  * view ([[MaterializedViews]]) covers rewrites to a scan of the view
  * — O(view rows) instead of O(base table), the rewrite that makes a
  * maintained view WORTH maintaining at 100 TB. The claim ladder, all
  * checks conservative (any failure keeps the always-correct base
  * aggregate):
  *
  *  1. STRUCTURE (pure, no I/O — the fixpoint-safe pre-check): the
  *     node is `Aggregate` grouped on exactly one bare column over
  *     the un-versioned base relation (at most a column-pruning
  *     Project between — a Filter means the query wants a SUBSET of
  *     the base and the whole-table view cannot answer), and every
  *     output is the grouping column or a DISTINCT-free, FILTER-free
  *     `sum`/`count(*)`/`min`/`max` the view's kind stores. A `sum`
  *     or extremum must target the view's value column (modulo an
  *     exact widening cast).
  *  2. FRESHNESS (two sidecar reads, only after 1 matches):
  *     [[MaterializedViews.isFresh]] — the view's folded-through
  *     watermark covers the base's current version.
  *
  * The replacement reads the view through its own relation (tombstone
  * groups filtered by `cnt != 0`), casts the exact decimal
  * accumulators back to each original aggregate's result type — a
  * lossless cast by the registry's exact-value-column contract — and
  * re-anchors the original output `exprId`s so parent operators are
  * untouched. Injected BEFORE [[GraftScanRewrite]]: within each
  * optimizer pass the aggregate must match while the base relation is
  * still addressable; the view relation this rule emits is then
  * itself lazified by the scan rewrite in the same pass.
  */
class GraftMvRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  import MaterializedViews.MvSpec

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MaterializedViews.isEmpty) plan
    else plan.transform {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] =
    for {
      rel <- baseRelationOf(agg.child)
      groupAttr <- agg.groupingExpressions match {
        case Seq(a: AttributeReference) => Some(a)
        case _ => None
      }
      resolver = spark.sessionState.conf.resolver
      candidates = MaterializedViews.viewsOf(spark, rel.path)
        .filter(s => resolver(s.groupCol, groupAttr.name))
      if candidates.nonEmpty
      rewritten <- candidates.view.flatMap { spec =>
        mapOutputs(agg, groupAttr, spec, resolver)
          .filter(_ => MaterializedViews.isFresh(spark, spec))
          .flatMap(build(agg, spec, _))
      }.headOption
    } yield rewritten

  /** The base relation under at most a column-pruning Project. */
  private def baseRelationOf(p: LogicalPlan): Option[GraftRelation] = p match {
    case l: LogicalRelation => l.relation match {
      case g: GraftRelation if g.version.isEmpty => Some(g)
      case _ => None
    }
    case proj: Project
        if proj.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      baseRelationOf(proj.child)
    case _ => None
  }

  /** Per original output, the view column expression answering it —
    * None if any output is outside the view's vocabulary. Pure.
    */
  private def mapOutputs(agg: Aggregate, groupAttr: AttributeReference,
      spec: MvSpec, resolver: (String, String) => Boolean)
      : Option[Seq[Column]] = {
    val sumKinds = Set("sum_count", "moments")
    def valueMatch(e: Expression): Boolean = e match {
      case a: AttributeReference => resolver(a.name, spec.valueCol)
      case c: Cast if exactWidening(c.child.dataType, c.dataType) =>
        valueMatch(c.child)
      case _ => false
    }
    def one(o: NamedExpression): Option[Column] = o match {
      case a: AttributeReference if a.exprId == groupAttr.exprId =>
        Some(col(spec.groupCol))
      case al: Alias => al.child match {
        case a: AttributeReference if a.exprId == groupAttr.exprId =>
          Some(col(spec.groupCol))
        case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case s: Sum if sumKinds(spec.kind) && valueMatch(s.child) =>
              Some(col("sum_value").cast(al.dataType))
            case c: Count if c.children.forall(ch =>
                ch.foldable && ch.eval() != null) =>
              Some(col("cnt"))
            case m: Min if spec.kind == "min_max" && valueMatch(m.child) =>
              Some(col("min_value").cast(al.dataType))
            case m: Max if spec.kind == "min_max" && valueMatch(m.child) =>
              Some(col("max_value").cast(al.dataType))
            case _ => None
          }
        case _ => None
      }
      case _ => None
    }
    val mapped = agg.aggregateExpressions.map(one)
    if (mapped.forall(_.isDefined)) Some(mapped.map(_.get)) else None
  }

  /** Value-preserving widenings only — a cast that could truncate
    * breaks the "same values as the base aggregate" contract.
    */
  private def exactWidening(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (ByteType | ShortType | IntegerType | LongType, LongType) => true
      case (ByteType, ShortType | IntegerType) => true
      case (ShortType, IntegerType) => true
      case (f: DecimalType, t: DecimalType) =>
        t.scale >= f.scale &&
          t.precision - t.scale >= f.precision - f.scale
      case (ByteType | ShortType | IntegerType | LongType, t: DecimalType) =>
        t.precision - t.scale >= 20
      case _ => false
    }

  /** Assemble the replacement plan; any failure (view unreadable,
    * schema drift) falls back to the original aggregate.
    */
  private def build(agg: Aggregate, spec: MvSpec,
      cols: Seq[Column]): Option[LogicalPlan] =
    try {
      val viewDf = spark.read.format("graft").load(spec.view)
        .filter(col("cnt") =!= 0L)
      val projected = viewDf.select(cols.zipWithIndex.map {
        case (c, i) => c.as(s"__mv_$i")
      }: _*)
      val newPlan = projected.queryExecution.analyzed
      if (newPlan.output.length != agg.aggregateExpressions.length) None
      else Some(Project(
        newPlan.output.zip(agg.aggregateExpressions).map { case (na, o) =>
          Alias(na, o.name)(exprId = o.exprId, qualifier = o.qualifier,
            explicitMetadata = Some(o.metadata))
        }, newPlan))
    } catch { case scala.util.control.NonFatal(_) => None }
}
