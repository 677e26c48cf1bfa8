package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Optimizer rewrite for the catalog/`format("graft")` READ surface:
  * `LogicalRelation(GraftRelation)` — the V1 relation whose
  * `buildScan` plans an opaque pre-pruned RDD — becomes the LAZY
  * skipping plan ([[DataSkipping.lazyScanPlan]]): a standard
  * `HadoopFsRelation` over a [[SkippingFileIndex]] that evaluates the
  * manifest under the query's own filters at listing time. What this
  * buys on the name-addressed surface, none of which the V1 route can
  * have (`PrunedFilteredScan` hands sources a flat-attribute `Filter`
  * vocabulary and an opaque scan node):
  *
  *  - NESTED struct-path predicates (`t.m.uid > x`) reach the
  *    manifest's nested per-file stats AND the parquet reader —
  *    SURVEY §7.2b(i), closed.
  *  - Native dynamic partition pruning: a fact⋈dim join on a
  *    partition column prunes the fact's files at runtime with the
  *    dim's build-side keys — automatically, no
  *    `DynamicFilePruning.joinPruned` call (the `04` SQL porter's
  *    plain-SQL joins now prune).
  *  - Whole-stage codegen over the scan, nested schema pruning,
  *    parquet row-group pushdown.
  *
  * The rule runs in the operator-optimization batch (BEFORE Spark's
  * `PartitionPruning`, so DPP sees the file-source shape) via
  * [[graft.plans.GraftExtensions]]. It deliberately SKIPS any
  * aggregate subtree the metadata-aggregate strategy
  * ([[GraftMetaAggStrategy]]) would claim — those answer O(manifest)
  * from the V1 relation at planning and must keep their shape. Writes
  * are untouched: V1 insert commands hold their target relation
  * outside the optimized query tree, so `INSERT INTO/OVERWRITE` keep
  * the `InsertableRelation` route.
  *
  * Install via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (session build time — required for DPP), or
  * [[GraftScanRewrite.install]] on a live session (pushdown and
  * nested pruning only: `experimental.extraOptimizations` runs after
  * `PartitionPruning`).
  */
class GraftScanRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private lazy val metaAgg = new GraftMetaAggStrategy(spark)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val hasGraft = plan.exists {
      case l: LogicalRelation => l.relation.isInstanceOf[GraftRelation]
      case _ => false
    }
    if (!hasGraft) plan else rewriteTree(plan)
  }

  private def rewriteTree(p: LogicalPlan): LogicalPlan = p match {
    // a metadata-answerable aggregate keeps its V1 shape for the
    // planner strategy (the probe is the strategy itself, so the two
    // can never disagree about claimability). The PURE structural
    // pre-test gates the probe: the strategy's full claim check does
    // manifest/sidecar I/O, and this rule runs once per fixpoint
    // iteration — an aggregate that can never push down must cost
    // zero filesystem probes per pass.
    case agg: Aggregate
        if metaAgg.structurallyClaimable(agg) && metaAgg(agg).nonEmpty => agg
    case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] =>
      rewriteRelation(lr)
    case other => other.mapChildren(rewriteTree)
  }

  private def rewriteRelation(lr: LogicalRelation): LogicalPlan = {
    val g = lr.relation.asInstanceOf[GraftRelation]
    val rewritten =
      try DataSkipping.lazyScanPlan(spark, g.path, g.version)
      catch {
        // never fail OPTIMIZATION over the rewrite — the V1 relation
        // is always a correct (if unpruned-at-plan-time) fallback
        case scala.util.control.NonFatal(_) => None
      }
    rewritten match {
      case None => lr
      case Some(df) =>
        // the spliced subtree is an ANALYZED plan injected AFTER the
        // optimizer's hint batch already ran — fold any ResolvedHint
        // (the DV probe's broadcast hint) into its Join node here, or
        // the planner rejects the leftover hint operator outright
        val newPlan = org.apache.spark.sql.catalyst.optimizer
          .EliminateResolvedHint(df.queryExecution.analyzed)
        // re-anchor on the ORIGINAL output attributes: parents above
        // reference the relation's exprIds, so each new column is
        // aliased back to its old identity. Names resolve with the
        // SESSION's resolver (case sensitivity is a user conf, not
        // ours), and anything unresolvable or ambiguous — a schema
        // with case-twin columns under caseSensitive=true, a lazy
        // plan that lost a column — keeps the always-correct V1
        // relation instead of failing the query.
        val resolver = spark.sessionState.conf.resolver
        val out: Seq[Option[NamedExpression]] = lr.output.map { o =>
          newPlan.output.filter(a => resolver(a.name, o.name)) match {
            case Seq(one) =>
              Some(Alias(one, o.name)(exprId = o.exprId,
                qualifier = o.qualifier,
                explicitMetadata = Some(o.metadata)))
            case _ => None
          }
        }
        if (out.exists(_.isEmpty)) lr
        else Project(out.map(_.get), newPlan)
    }
  }
}

object GraftScanRewrite {
  /** Install on a live session (idempotent). Note: this channel runs
    * AFTER Spark's PartitionPruning batch, so it provides pushdown
    * and nested pruning but not DPP — use
    * `spark.sql.extensions=graft.plans.GraftExtensions` for the full
    * surface.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[GraftScanRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new GraftScanRewrite(spark)
}
