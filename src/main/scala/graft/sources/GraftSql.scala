package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** SQL surface for graft-table maintenance — the Delta SQL-command
  * analog (`OPTIMIZE` / `VACUUM` / `DESCRIBE HISTORY` / `DESCRIBE
  * DETAIL` / `RESTORE` / `ALTER TABLE ... ADD|DROP CONSTRAINT`,
  * reference pos-dlt runs on exactly this operational surface), so a
  * user can maintain stats tables from SQL without touching the Scala
  * API:
  *
  * {{{
  *   OPTIMIZE '/path/to/table'
  *   OPTIMIZE '/path/to/table' ZORDER BY (x, y)
  *   VACUUM '/path/to/table' [RETAIN 168 HOURS]
  *   DESCRIBE HISTORY '/path/to/table'
  *   DESCRIBE DETAIL '/path/to/table'
  *   RESTORE '/path/to/table' [TO] VERSION AS OF 3
  *   ALTER TABLE '/path/to/table' ADD CONSTRAINT nm CHECK (expr)
  *   ALTER TABLE '/path/to/table' DROP CONSTRAINT nm
  * }}}
  *
  * Tables are addressed by PATH literal (Delta's `delta.`/path``
  * shape) — the graft format has no catalog, so a path IS the table
  * identity, matching every other [[DataSkipping]] entry point.
  *
  * Wiring: [[GraftSqlParser]] is a delegating `ParserInterface` —
  * statements it recognizes become [[LeafRunnableCommand]] plans
  * (planned by Spark's own command machinery, visible in `EXPLAIN`),
  * everything else passes VERBATIM to the session's normal parser, so
  * injecting it changes nothing about standard SQL. Sessions built
  * with `graft.plans.GraftExtensions` (`spark.sql.extensions`) get it
  * automatically; [[GraftSql.sql]] runs the same grammar against ANY
  * session without extensions.
  *
  * This is the one place the engine uses a custom parser/plan-node
  * rung: maintenance statements are not expressible as operators or
  * expressions — SURVEY §3's escalation-ladder note records it.
  */
object GraftSql {

  private val Optimize =
    """(?is)^\s*OPTIMIZE\s+'([^']+)'\s*(?:ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*$""".r
  private val Vacuum =
    """(?is)^\s*VACUUM\s+'([^']+)'\s*(?:RETAIN\s+(\d+)\s+HOURS?)?\s*(DRY\s+RUN)?\s*;?\s*$""".r
  private val History =
    """(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+'([^']+)'\s*;?\s*$""".r
  private val Detail =
    """(?is)^\s*DESC(?:RIBE)?\s+DETAIL\s+'([^']+)'\s*;?\s*$""".r
  private val Restore =
    """(?is)^\s*RESTORE\s+'([^']+)'\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  private val AddConstraint =
    """(?is)^\s*ALTER\s+TABLE\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.*)\)\s*;?\s*$""".r
  private val DropConstraint =
    """(?is)^\s*ALTER\s+TABLE\s+'([^']+)'\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*$""".r
  private val RenameCol =
    """(?is)^\s*ALTER\s+TABLE\s+'([^']+)'\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*$""".r
  private val DropCol =
    """(?is)^\s*ALTER\s+TABLE\s+'([^']+)'\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*$""".r
  private val Convert =
    """(?is)^\s*CONVERT\s+TO\s+GRAFT\s+'([^']+)'\s+STATS\s+BY\s*\(([^)]*)\)\s*;?\s*$""".r
  private val Reorg =
    """(?is)^\s*REORG\s+TABLE\s+'([^']+)'\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$""".r
  private val AddGenerated =
    """(?is)^\s*ALTER\s+TABLE\s+'([^']+)'\s+ALTER\s+COLUMN\s+(\w+)\s+SET\s+GENERATED\s+ALWAYS\s+AS\s*\((.*)\)\s*;?\s*$""".r
  private val DropGenerated =
    """(?is)^\s*ALTER\s+TABLE\s+'([^']+)'\s+ALTER\s+COLUMN\s+(\w+)\s+DROP\s+GENERATED\s*;?\s*$""".r
  private val AddIdentity =
    """(?is)^\s*ALTER\s+TABLE\s+'([^']+)'\s+ALTER\s+COLUMN\s+(\w+)\s+SET\s+GENERATED\s+ALWAYS\s+AS\s+IDENTITY\s*(?:\(\s*START\s+WITH\s+(-?\d+)\s+(?:INCREMENT|STEP)\s+BY\s+(-?\d+)\s*\))?\s*;?\s*$""".r

  /** The graft statement grammar: Some(command plan) when `sqlText`
    * is a maintenance statement, None to mean "not ours" (the caller
    * falls through to the standard parser).
    */
  def parse(sqlText: String): Option[LeafRunnableCommand] = sqlText match {
    case Optimize(path, null)  => Some(OptimizeGraftCommand(path, Nil))
    case Optimize(path, zCols) =>
      val cols = zCols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      Some(OptimizeGraftCommand(path, cols))
    case Vacuum(path, hours, dry) =>
      Some(VacuumGraftCommand(path, Option(hours).map(_.toLong), dry != null))
    case History(path)         => Some(DescribeHistoryGraftCommand(path))
    case Detail(path)          => Some(DescribeDetailGraftCommand(path))
    case Restore(path, v)      => Some(RestoreGraftCommand(path, v.toLong))
    case AddConstraint(path, name, expr) =>
      Some(AddConstraintGraftCommand(path, name, expr.trim))
    case DropConstraint(path, name) =>
      Some(DropConstraintGraftCommand(path, name))
    case RenameCol(path, from, to) =>
      Some(RenameColumnGraftCommand(path, from, to))
    case DropCol(path, name) =>
      Some(DropColumnGraftCommand(path, name))
    case Convert(path, cols) =>
      Some(ConvertGraftCommand(path,
        cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
    case Reorg(path) => Some(ReorgGraftCommand(path))
    // IDENTITY must match before the generic generated-expression
    // form (its expression body would otherwise swallow "IDENTITY")
    case AddIdentity(path, colName, start, step) =>
      Some(AddIdentityGraftCommand(path, colName,
        Option(start).map(_.toLong).getOrElse(1L),
        Option(step).map(_.toLong).getOrElse(1L)))
    case AddGenerated(path, colName, expr)
        if !expr.trim.isEmpty =>
      Some(AddGeneratedGraftCommand(path, colName, expr.trim))
    case DropGenerated(path, colName) =>
      Some(DropGeneratedGraftCommand(path, colName))
    case _ => None
  }

  /** Run a statement against ANY session (no extension install
    * needed): graft maintenance statements execute their command,
    * everything else is `spark.sql`.
    */
  def sql(spark: SparkSession, sqlText: String): DataFrame =
    parse(sqlText) match {
      case Some(cmd) =>
        val schema = StructType(cmd.output.map(a =>
          StructField(a.name, a.dataType, a.nullable)))
        spark.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(cmd.run(spark)).asJava,
          schema)
      case None => spark.sql(sqlText)
    }
}

/** `OPTIMIZE '<path>'` → [[DataSkipping.compactTable]];
  * `OPTIMIZE '<path>' ZORDER BY (...)` → [[DataSkipping.zorderTable]]
  * with the file target derived from live bytes at the compaction
  * default (128 MiB per file) — Delta's OPTIMIZE picks its own file
  * count the same way.
  */
case class OptimizeGraftCommand(path: String, zCols: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("result_files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val files =
      if (zCols.isEmpty) DataSkipping.compactTable(spark, path)
      else {
        val bytes = DataSkipping.tableDetail(spark, path)
          .select("size_bytes").head.getLong(0)
        val target = math.max(1L, (bytes + (128L << 20) - 1) / (128L << 20)).toInt
        DataSkipping.zorderTable(spark, path, zCols, targetFiles = target)
      }
    val op = if (zCols.isEmpty) "OPTIMIZE"
      else s"OPTIMIZE ZORDER BY (${zCols.mkString(", ")})"
    Seq(Row(path, op, files.toLong))
  }
}

/** `VACUUM '<path>' [RETAIN n HOURS] [DRY RUN]` →
  * [[DataSkipping.vacuumTable]] / [[DataSkipping.vacuumDryRun]]
  * (default retention = the table default, Delta's 7 days). DRY RUN
  * returns one row per file the vacuum WOULD delete, like Delta's.
  */
case class VacuumGraftCommand(path: String, retainHours: Option[Long],
    dryRun: Boolean = false)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val retention = retainHours.map(_ * 3600000L)
    if (dryRun) {
      val would = retention match {
        case Some(ms) => DataSkipping.vacuumDryRun(spark, path, ms)
        case None     => DataSkipping.vacuumDryRun(spark, path)
      }
      would.map(Row(_))
    } else {
      retention match {
        case Some(ms) => DataSkipping.vacuumTable(spark, path, ms)
        case None     => DataSkipping.vacuumTable(spark, path)
      }
      Seq(Row(path))
    }
  }
}

/** `DESCRIBE HISTORY '<path>'` → [[DataSkipping.describeHistory]]. */
case class DescribeHistoryGraftCommand(path: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("op_time", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    DataSkipping.describeHistory(spark, path).collect().toSeq
}

/** `DESCRIBE DETAIL '<path>'` → [[DataSkipping.tableDetail]]. */
case class DescribeDetailGraftCommand(path: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_rows_physical", LongType, nullable = false)(),
    AttributeReference("dv_entries", LongType, nullable = false)(),
    AttributeReference("earliest_version", LongType, nullable = false)(),
    AttributeReference("latest_version", LongType, nullable = false)(),
    AttributeReference("features", StringType, nullable = false)(),
    AttributeReference("stats_columns", StringType, nullable = false)(),
    AttributeReference("num_constraints", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    DataSkipping.tableDetail(spark, path).collect().toSeq
}

/** `RESTORE '<path>' [TO] VERSION AS OF n` →
  * [[DataSkipping.restoreTable]].
  */
case class RestoreGraftCommand(path: String, version: Long)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("restored_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    DataSkipping.restoreTable(spark, path, version)
    Seq(Row(path, version))
  }
}

/** `ALTER TABLE '<path>' ADD CONSTRAINT nm CHECK (expr)` →
  * [[DataSkipping.addCheckConstraint]] (validates existing rows, like
  * Delta's ADD CONSTRAINT).
  */
case class AddConstraintGraftCommand(path: String, name: String, exprSql: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("constraint", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    DataSkipping.addCheckConstraint(spark, path, name, exprSql)
    Seq(Row(path, name))
  }
}

/** `ALTER TABLE '<path>' DROP CONSTRAINT nm` →
  * [[DataSkipping.dropCheckConstraint]].
  */
case class DropConstraintGraftCommand(path: String, name: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("constraint", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    DataSkipping.dropCheckConstraint(spark, path, name)
    Seq(Row(path, name))
  }
}

/** `ALTER TABLE '<path>' RENAME COLUMN a TO b` →
  * [[DataSkipping.renameColumn]] (metadata-only, zero data rewritten).
  */
case class RenameColumnGraftCommand(path: String, from: String, to: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("column", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    DataSkipping.renameColumn(spark, path, from, to)
    Seq(Row(path, to))
  }
}

/** `ALTER TABLE '<path>' DROP COLUMN c` →
  * [[DataSkipping.dropColumn]] (metadata-only).
  */
case class DropColumnGraftCommand(path: String, column: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("column", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    DataSkipping.dropColumn(spark, path, column)
    Seq(Row(path, column))
  }
}

/** `CONVERT TO GRAFT '<path>' STATS BY (c1, c2)` →
  * [[DataSkipping.convertToStats]] (the Delta CONVERT TO DELTA
  * analog — zero data rewritten).
  */
case class ConvertGraftCommand(path: String, statsCols: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val n = DataSkipping.convertToStats(spark, path, statsCols)
    Seq(Row(path, n))
  }
}

/** Delegating parser: graft maintenance statements parse to their
  * command plans; every other string goes to the wrapped parser
  * untouched. Injected by `graft.plans.GraftExtensions`
  * (`ext.injectParser`).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSql.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** `REORG TABLE '<path>' APPLY (PURGE)` →
  * [[DataSkipping.purgeDeletionVectors]] (rewrites only the
  * vector's files).
  */
case class ReorgGraftCommand(path: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("rows_purged", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(path, DataSkipping.purgeDeletionVectors(spark, path)))
}

/** `ALTER TABLE '<path>' ALTER COLUMN c SET GENERATED ALWAYS AS
  * (expr)` → [[DataSkipping.addGeneratedColumn]].
  */
case class AddGeneratedGraftCommand(path: String, column: String,
    exprSql: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("column", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    DataSkipping.addGeneratedColumn(spark, path, column, exprSql)
    Seq(Row(path, column))
  }
}

/** `ALTER TABLE '<path>' ALTER COLUMN c DROP GENERATED` →
  * [[DataSkipping.dropGeneratedColumn]].
  */
case class DropGeneratedGraftCommand(path: String, column: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("column", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    DataSkipping.dropGeneratedColumn(spark, path, column)
    Seq(Row(path, column))
  }
}

/** `ALTER TABLE '<path>' ALTER COLUMN c SET GENERATED ALWAYS AS
  * IDENTITY [(START WITH n STEP BY m)]` →
  * [[DataSkipping.addIdentityColumn]].
  */
case class AddIdentityGraftCommand(path: String, column: String,
    start: Long, step: Long) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("column", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    DataSkipping.addIdentityColumn(spark, path, column, start, step)
    Seq(Row(path, column))
  }
}
