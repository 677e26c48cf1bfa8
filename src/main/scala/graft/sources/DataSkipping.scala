package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.functions._

/** File-level data skipping — the Delta-Lake-style min/max manifest,
  * re-expressed over plain parquet (reference: pos-dlt stores its
  * tables as Delta, whose transaction log carries per-file column
  * stats used to prune scans).
  *
  * Parquet footers already hold row-group stats, but the engine must
  * OPEN every footer to use them — at 100 TB that is millions of
  * remote reads before the first data byte. A manifest is one
  * KB-to-MB-sized sidecar holding per-file min/max: planning-time
  * pruning selects the file subset BEFORE any footer is touched, and
  * the original predicate is re-applied to the surviving rows so
  * pruning can only ever remove whole files that provably contain no
  * match — never change results.
  *
  * The manifest lives under `<path>/_graft_stats`: the leading
  * underscore keeps it invisible to plain `spark.read.parquet(path)`
  * (Hadoop's default path filter hides `_`/`.` entries), so readers
  * that don't know about skipping see exactly the same table.
  *
  * Predicate support (the skippable subset): =, <, <=, >, >= against
  * literals, composed with AND/OR. Anything else is handled
  * CONSERVATIVELY — an unsupported conjunct prunes nothing, an
  * unsupported disjunct disables pruning of its OR — so correctness
  * never depends on the rewriter's coverage. Null semantics fall out
  * of SQL three-valued logic: an all-null file has null min/max, the
  * skip predicate evaluates null, and the file is (correctly)
  * dropped for any value comparison.
  */
object DataSkipping {

  val StatsDir = "_graft_stats"

  /** Write `df` as parquet at `path` plus a per-file min/max manifest
    * for `statsCols`. Stats are computed in ONE extra scan of the
    * written files, grouped by file (partial-agg shuffle keyed on
    * file path — one row per file crosses the wire).
    */
  def writeWithStats(df: DataFrame, path: String, statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "at least one stats column")
    df.write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    val written = spark.read.parquet(path)
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    written
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$StatsDir")
  }

  /** (files the predicate might match, all files) from the manifest. */
  def prunedFiles(
      spark: SparkSession, path: String,
      predicate: Column): (Seq[String], Seq[String]) = {
    val stats = spark.read.parquet(s"$path/$StatsDir")
    val tracked = stats.columns.collect { case c if c.startsWith("min_") => c.drop(4) }.toSet
    // resolve the user predicate against the table's own schema (the
    // analyzed Filter condition), then rewrite it over min_/max_
    val cond = spark.read.parquet(path).filter(predicate)
      .queryExecution.analyzed
      .collectFirst { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition }
      .getOrElse(sys.error("predicate did not analyze to a Filter"))
    val skip = rewrite(cond, tracked).getOrElse(lit(true))
    val all = stats.select("file").collect().map(_.getString(0)).toSeq
    val kept = stats.filter(skip).select("file").collect().map(_.getString(0)).toSeq
    (kept, all)
  }

  /** Read `path` under `predicate`, scanning only files whose stats
    * admit a match; the predicate is re-applied to surviving rows.
    */
  def readSkipping(spark: SparkSession, path: String, predicate: Column): DataFrame = {
    val (kept, all) = prunedFiles(spark, path, predicate)
    if (kept.isEmpty) spark.read.parquet(path).filter(lit(false))
    else if (kept.size == all.size) spark.read.parquet(path).filter(predicate)
    else spark.read.parquet(kept: _*).filter(predicate)
  }

  /** Rewrite a row predicate into a file-stats predicate over
    * min_/max_ columns. None = cannot skip on this expression.
    */
  private[sources] def rewrite(e: Expression, tracked: Set[String]): Option[Column] = e match {
    case And(l, r) =>
      // an unsupported conjunct restricts nothing: x AND unknown -> x
      (rewrite(l, tracked), rewrite(r, tracked)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (Some(a), None) => Some(a)
        case (None, Some(b)) => Some(b)
        case _ => None
      }
    case Or(l, r) =>
      // an unsupported disjunct could match anywhere: give up the OR
      for (a <- rewrite(l, tracked); b <- rewrite(r, tracked)) yield a || b
    case EqualTo(Attr(a), v: Literal) if tracked(a) =>
      Some(minC(a) <= litOf(v) && maxC(a) >= litOf(v))
    case EqualTo(v: Literal, Attr(a)) if tracked(a) =>
      Some(minC(a) <= litOf(v) && maxC(a) >= litOf(v))
    case GreaterThan(Attr(a), v: Literal) if tracked(a) =>
      Some(maxC(a) > litOf(v))
    case GreaterThan(v: Literal, Attr(a)) if tracked(a) =>
      Some(minC(a) < litOf(v)) // v > a  <=>  a < v
    case GreaterThanOrEqual(Attr(a), v: Literal) if tracked(a) =>
      Some(maxC(a) >= litOf(v))
    case GreaterThanOrEqual(v: Literal, Attr(a)) if tracked(a) =>
      Some(minC(a) <= litOf(v))
    case LessThan(Attr(a), v: Literal) if tracked(a) =>
      Some(minC(a) < litOf(v))
    case LessThan(v: Literal, Attr(a)) if tracked(a) =>
      Some(maxC(a) > litOf(v))
    case LessThanOrEqual(Attr(a), v: Literal) if tracked(a) =>
      Some(minC(a) <= litOf(v))
    case LessThanOrEqual(v: Literal, Attr(a)) if tracked(a) =>
      Some(maxC(a) >= litOf(v))
    case _ => None
  }

  /** Column name of a (resolved or unresolved) attribute node. */
  private object Attr {
    def unapply(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => Some(u.name)
      case _ => None
    }
  }

  private def minC(a: String): Column = col(s"min_$a")
  private def maxC(a: String): Column = col(s"max_$a")
  private def litOf(v: Literal): Column =
    lit(org.apache.spark.sql.catalyst.CatalystTypeConverters
      .convertToScala(v.value, v.dataType))
}
