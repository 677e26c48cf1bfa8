package graft.streaming

import graft.sources.{DataSkipping, ManifestFileIndex}
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.{FileStatusWithMetadata, HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Offset for [[StatsTableSource]]: the SET of named manifest commits
  * this stream has observed. Commit names are `[A-Za-z0-9._-]+`
  * (enforced at append), so the JSON needs no escaping. Progress is
  * the set difference between two offsets — commits carry no global
  * order (two writers may land markers concurrently), and a set is
  * exactly the structure that makes replay deterministic anyway.
  */
private[streaming] case class StatsCommitOffset(commits: Seq[String]) extends Offset {
  override def json: String =
    commits.sorted.map(c => "\"" + c + "\"").mkString("{\"commits\":[", ",", "]}")
}

private[streaming] object StatsCommitOffset {
  def from(o: org.apache.spark.sql.connector.read.streaming.Offset): StatsCommitOffset =
    o match {
      case s: StatsCommitOffset => s
      case other => parse(other.json)
    }

  def parse(json: String): StatsCommitOffset = {
    val body = json.trim.stripPrefix("{\"commits\":[").stripSuffix("]}")
    if (body.isEmpty) StatsCommitOffset(Nil)
    else StatsCommitOffset(
      body.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq)
  }
}

/** Streaming source FROM a [[DataSkipping]] stats table — the Delta
  * streaming-source analog, and the half that closes DLT's
  * `dlt.read_stream(table)` loop end-to-end: [[StatsTableSink]]
  * writes each micro-batch INTO the manifest as a named commit;
  * this source turns each named commit BACK into one micro-batch
  * for the next pipeline stage (reference: pos-dlt's silver tables
  * read the bronze Delta table as a stream,
  * `03_Bronze-to-Silver ETL.py:249-324`).
  *
  * Mechanics: a named commit is one manifest file whose rows describe
  * exactly the data files of that batch. `getOffset` LISTS the
  * manifest dir for marker names (one small listing — no data-file
  * listing, no footer read); `getBatch` reads the NEW markers' rows
  * (tiny parquet files) and serves the recorded (path, size, mtime)
  * statuses straight to the parquet reader through a
  * [[ManifestFileIndex]] — planning cost is O(batch files), never
  * O(table files). Unnamed appends and base `writeWithStats` files
  * are NOT streamed (they carry no commit identity to make replay
  * exactly-once); feed continuously-written tables through
  * [[StatsTableSink]]'s named commits.
  *
  * Exactly-once: offsets are commit-name sets persisted in the query
  * checkpoint; a restart replays the last uncommitted batch by
  * re-reading the same markers — same rows, same files. Run
  * [[DataSkipping.compactTable]] only when downstream streams are
  * CAUGHT UP (markers survive compaction but are re-created
  * zero-row, so an in-flight batch replayed after a compaction would
  * read empty) — with the default retention the replaced data files
  * themselves stay readable for the whole window.
  */
final class StatsTableSource(
    sqlContext: SQLContext, path: String) extends Source {

  private val spark =
    sqlContext.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
  private def fs = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override val schema: StructType = DataSkipping.tableSchema(spark, path)

  /** Marker names currently committed (manifest files that are not
    * plain `part-` pieces). One listing of the manifest dir.
    */
  private def markerNames(): Seq[String] = {
    val dir = DataSkipping.manifestDir(spark, path)
    if (!fs.exists(new Path(dir))) Seq.empty
    else fs.listStatus(new Path(dir)).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("part-") &&
        !n.startsWith("_") && !n.startsWith("."))
      .map(_.stripSuffix(".parquet"))
  }

  override def getOffset: Option[Offset] = {
    val names = markerNames()
    if (names.isEmpty) None else Some(StatsCommitOffset(names))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val done = start.map(o => StatsCommitOffset.from(o).commits.toSet)
      .getOrElse(Set.empty[String])
    val todo = StatsCommitOffset.from(end).commits.filterNot(done).sorted
    val dir = DataSkipping.manifestDir(spark, path)
    val markerPaths = todo.map(n => s"$dir/$n.parquet")
      .filter(p => fs.exists(new Path(p)))
    val statuses: Seq[FileStatusWithMetadata] =
      if (markerPaths.isEmpty) Seq.empty
      else spark.read.parquet(markerPaths: _*)
        .select("file", "file_size", "mod_time").collect().toSeq
        .map(r => FileStatusWithMetadata(new FileStatus(
          r.getLong(1), false, 1, 128L * 1024 * 1024, r.getLong(2),
          new Path(r.getString(0)))))
    // MicroBatchExecution requires an isStreaming=true frame; an
    // empty batch (all-new markers were zero-row) is a streaming
    // LocalRelation with no rows
    if (statuses.isEmpty)
      org.apache.spark.sql.graft.GraftSqlShims.ofRows(spark,
        LocalRelation(DataTypeUtils.toAttributes(schema), Nil, isStreaming = true))
    else {
      val relation = HadoopFsRelation(
        new ManifestFileIndex(new Path(path), statuses),
        partitionSchema = new StructType(),
        dataSchema = schema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat,
        options = Map.empty)(spark)
      org.apache.spark.sql.graft.GraftSqlShims.ofRows(spark,
        LogicalRelation(relation, isStreaming = true))
    }
  }

  override def stop(): Unit = ()

  override def toString: String = s"StatsTableSource[$path]"
}

/** `spark.readStream.format(classOf[StatsTableSourceProvider].getName)
  * .option("path", table).load()` — the registration glue.
  */
final class StatsTableSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-stats-table"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-stats-table source requires .option(\"path\", <stats table dir>)"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      DataSkipping.tableSchema(sqlContext.sparkSession, path(parameters))))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new StatsTableSource(sqlContext, path(parameters))
}
