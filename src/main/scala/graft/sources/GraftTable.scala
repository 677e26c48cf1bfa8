package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** The fluent table handle — the `io.delta.tables.DeltaTable` API
  * analog, so a reference user's operational code ports call-for-call:
  *
  * {{{
  *   val t = GraftTable.forPath(spark, "/data/inventory")
  *   t.toDF.filter(...)                        // pruned read
  *   t.delete(col("stale") === true)
  *   t.update(col("qty") < 0, Map("qty" -> lit(0)))
  *   t.merge(cdcBatch, Seq("item_id"))
  *     .whenMatchedDelete(col("s.op") === "D")
  *     .whenMatchedUpdateAll()
  *     .whenNotMatchedInsertAll()
  *     .execute()
  *   t.optimize(); t.vacuum(); t.history(); t.detail()
  *   t.restoreToVersion(3)
  * }}}
  *
  * Every method delegates to the [[DataSkipping]] entry points (so
  * column mapping, deletion vectors, CDF, constraints and txn
  * idempotency all apply identically); the merge builder assembles
  * [[MergeClause]]s for [[DataSkipping.mergeInto]] — clause
  * conditions and SET values reference the target as `t.<col>` and
  * the source as `s.<col>`.
  */
class GraftTable private (spark: SparkSession, val path: String) {

  def toDF: DataFrame = DataSkipping.readSkipping(spark, path, lit(true))

  def where(predicate: Column): DataFrame =
    DataSkipping.readSkipping(spark, path, predicate)

  def asOfVersion(version: Long): DataFrame =
    DataSkipping.readSkippingAt(spark, path, version, lit(true))

  def asOfTimestamp(tsMillis: Long): DataFrame =
    DataSkipping.readSkippingAtTime(spark, path, tsMillis, lit(true))

  def delete(predicate: Column): Long =
    DataSkipping.deleteWhere(spark, path, predicate)

  def update(predicate: Column, set: Map[String, Column]): Long =
    DataSkipping.updateWhere(spark, path, predicate, set)

  def merge(source: DataFrame, keyCols: Seq[String]): GraftMergeBuilder =
    new GraftMergeBuilder(spark, path, source, keyCols)

  def optimize(): Int = DataSkipping.compactTable(spark, path)

  def optimizeZOrderBy(cols: String*): Int = {
    val bytes = DataSkipping.tableDetail(spark, path)
      .select("size_bytes").head.getLong(0)
    val target = math.max(1L, (bytes + (128L << 20) - 1) / (128L << 20)).toInt
    DataSkipping.zorderTable(spark, path, cols.toSeq, targetFiles = target)
  }

  def vacuum(): Unit = DataSkipping.vacuumTable(spark, path)
  def vacuum(retentionMs: Long): Unit =
    DataSkipping.vacuumTable(spark, path, retentionMs)

  def history(): DataFrame = DataSkipping.describeHistory(spark, path)
  def detail(): DataFrame = DataSkipping.tableDetail(spark, path)

  def restoreToVersion(version: Long): Long =
    DataSkipping.restoreTable(spark, path, version)

  def cloneTo(target: String): Long =
    DataSkipping.cloneTable(spark, path, target)

  /** `REORG TABLE ... APPLY (PURGE)`: materialize the deletion
    * vector by rewriting only its files. Returns positions purged.
    */
  def reorgPurge(): Long = DataSkipping.purgeDeletionVectors(spark, path)

  /** Declare `name` GENERATED ALWAYS AS (`exprSql`); appends may
    * omit it from then on.
    */
  def addGeneratedColumn(name: String, exprSql: String): GraftTable = {
    DataSkipping.addGeneratedColumn(spark, path, name, exprSql); this
  }

  def dropGeneratedColumn(name: String): GraftTable = {
    DataSkipping.dropGeneratedColumn(spark, path, name); this
  }

  /** Declare `name` GENERATED ALWAYS AS IDENTITY; appends must omit
    * it and the engine deals dense grid ids.
    */
  def addIdentityColumn(name: String, start: Long = 1L,
      step: Long = 1L): GraftTable = {
    DataSkipping.addIdentityColumn(spark, path, name, start, step); this
  }

  def dropIdentityColumn(name: String): GraftTable = {
    DataSkipping.dropIdentityColumn(spark, path, name); this
  }

  /** Compact the small-file tail if it has reached `minSmallFiles`
    * (the autoOptimize trigger, callable on any cadence).
    */
  def autoCompact(minSmallFiles: Int = 16): Boolean =
    DataSkipping.autoCompact(spark, path, minSmallFiles = minSmallFiles)
}

object GraftTable {

  def forPath(spark: SparkSession, path: String): GraftTable = {
    require(isGraftTable(spark, path),
      s"$path is not a graft stats table (no schema sidecar) — write with " +
        "DataSkipping.writeWithStats / format(\"graft\"), or convert a plain " +
        "parquet dir with GraftTable.convertFromParquet")
    new GraftTable(spark, path)
  }

  /** The `DeltaTable.forName` analog: resolve a catalog-registered
    * graft table (`CREATE TABLE n USING graft LOCATION p` /
    * `saveAsTable`) by NAME and hand back the same handle `forPath`
    * gives. Loud when the name is absent or not a graft table.
    */
  def forName(spark: SparkSession, name: String): GraftTable =
    GraftSql.graftTableLocation(spark, name) match {
      case Some(p) => forPath(spark, p)
      case None => throw new IllegalArgumentException(
        s"$name is not a catalog-registered graft table — create one with " +
          "CREATE TABLE ... USING graft LOCATION '<path>' or " +
          "df.write.format(\"graft\").saveAsTable")
    }

  def isGraftTable(spark: SparkSession, path: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(
      DataSkipping.manifestDir(spark, path), DataSkipping.SchemaFile))
  }

  /** `CONVERT TO GRAFT` then hand back the handle (the
    * `DeltaTable.convertToDelta` shape).
    */
  def convertFromParquet(spark: SparkSession, path: String,
      statsCols: Seq[String]): GraftTable = {
    DataSkipping.convertToStats(spark, path, statsCols)
    new GraftTable(spark, path)
  }
}

/** Accumulates [[MergeClause]]s in call order (first-match-wins
  * within each family) and runs [[DataSkipping.mergeInto]].
  */
class GraftMergeBuilder private[sources] (spark: SparkSession, path: String,
    source: DataFrame, keyCols: Seq[String]) {

  import MergeClause._

  private val clauses = scala.collection.mutable.ArrayBuffer.empty[MergeClause]
  private var txn: Option[(String, Long)] = None

  def whenMatchedUpdate(set: Map[String, Column]): this.type =
    { clauses += MatchedUpdate(None, set); this }

  def whenMatchedUpdate(condition: Column, set: Map[String, Column]): this.type =
    { clauses += MatchedUpdate(Some(condition), set); this }

  /** UPDATE SET * — every column takes the source row's value. */
  def whenMatchedUpdateAll(): this.type = { clauses += MatchedUpdate(None, allFromSource); this }

  def whenMatchedUpdateAll(condition: Column): this.type =
    { clauses += MatchedUpdate(Some(condition), allFromSource); this }

  def whenMatchedDelete(): this.type = { clauses += MatchedDelete(None); this }

  def whenMatchedDelete(condition: Column): this.type =
    { clauses += MatchedDelete(Some(condition)); this }

  def whenNotMatchedInsertAll(): this.type =
    { clauses += NotMatchedInsert(None); this }

  def whenNotMatchedInsertAll(condition: Column): this.type =
    { clauses += NotMatchedInsert(Some(condition)); this }

  def whenNotMatchedBySourceUpdate(set: Map[String, Column]): this.type =
    { clauses += BySourceUpdate(None, set); this }

  def whenNotMatchedBySourceUpdate(condition: Column, set: Map[String, Column]): this.type =
    { clauses += BySourceUpdate(Some(condition), set); this }

  def whenNotMatchedBySourceDelete(): this.type =
    { clauses += BySourceDelete(None); this }

  def whenNotMatchedBySourceDelete(condition: Column): this.type =
    { clauses += BySourceDelete(Some(condition)); this }

  /** Idempotency stamp (the Delta txnAppId/txnVersion shape). */
  def withTxn(appId: String, version: Long): this.type =
    { txn = Some(appId -> version); this }

  /** (updated, deleted, inserted). */
  def execute(): (Long, Long, Long) =
    DataSkipping.mergeInto(spark, path, source, keyCols, clauses.toSeq, txn = txn)

  private def allFromSource: Map[String, Column] =
    DataSkipping.tableLogicalSchema(spark, path).fieldNames
      .map(c => c -> org.apache.spark.sql.functions.col(s"s.$c")).toMap
}
