package graft.streaming

import graft.sources.{DataSkipping, ManifestFileIndex}
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow, Offset => OffsetV2}
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
  // Sorted in json AND in equality terms: the engine compares
  // consecutive offsets by case-class equality to decide whether a
  // batch fires, and a filesystem listing carries no order contract.
  private val normalized: Seq[String] = commits.sorted
  override def json: String =
    normalized.map(c => "\"" + c + "\"").mkString("{\"commits\":[", ",", "]}")
  override def equals(o: Any): Boolean = o match {
    case s: StatsCommitOffset => normalized == s.commits.sorted
    case _ => false
  }
  override def hashCode(): Int = normalized.hashCode()
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
  * [[ManifestFileIndex]] — planning cost is O(batch files) after the
  * first batch, never O(table files).
  *
  * INITIAL SNAPSHOT (Delta-source semantics): a FRESH consumer's
  * first batch is the table's current committed snapshot — the plain
  * manifest parts (base write, unnamed appends, compaction folds)
  * plus the markers its first offset covers — so a stream started on
  * a long-lived, already-compacted table begins from current state
  * instead of silently skipping folded history. Unnamed appends
  * landing AFTER the first batch are not streamed (they carry no
  * commit identity); feed continuously-written tables through
  * [[StatsTableSink]]'s named commits.
  *
  * Exactly-once: offsets are commit-name sets persisted in the query
  * checkpoint; a restart replays the last uncommitted batch by
  * re-reading the same markers — same rows, same files. A marker
  * named by the replayed offset range that has VANISHED from the
  * manifest (expired by a compaction that outran this consumer)
  * fails LOUDLY rather than delivering an empty batch as success.
  * Marker lifetime is [[DataSkipping.compactTable]]'s `retentionMs`
  * (markers older than the window are dropped at compaction — the
  * Delta txn-retention analog that keeps offsets and manifest
  * listings bounded by the window's commit count instead of growing
  * forever); run compaction only when downstream streams are within
  * the retention window, and prefer caught-up streams — a surviving
  * marker is re-created zero-row, so an in-flight batch replayed
  * across a compaction reads empty (indistinguishable from a
  * legitimately empty commit). Row-level DML
  * ([[DataSkipping.deleteWhere]]/`updateWhere`/`mergeUpsert`) is
  * gentler: a commit none of whose files were rewritten survives the
  * new generation VERBATIM and replays unchanged; only commits whose
  * files the DML op touched fold to zero-row. Rewrites themselves
  * are never re-streamed (the Delta skipChangeCommits analog —
  * already-delivered rows are not retracted).
  *
  * ADMISSION CONTROL ([[SupportsTriggerAvailableNow]]): the source
  * answers `latestOffset(start, limit)` directly, so
  * `Trigger.AvailableNow` runs the real multi-batch drain (marker
  * set pinned once at query start) instead of the lossy
  * single-batch fallback, and `maxCommitsPerTrigger` (default 128)
  * caps the named commits admitted per micro-batch — a backlogged
  * consumer catches up in bounded batches (bounded manifest reads,
  * bounded file-status lists) instead of one batch holding the whole
  * backlog.
  */
final class StatsTableSource(
    sqlContext: SQLContext, path: String,
    maxCommitsPerTrigger: Int = StatsTableSource.DefaultMaxCommitsPerTrigger)
  extends Source with SupportsTriggerAvailableNow {

  require(maxCommitsPerTrigger > 0,
    s"maxCommitsPerTrigger must be positive, got $maxCommitsPerTrigger")

  private val spark =
    sqlContext.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
  private def fs = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // renamed/dropped tables are refused (Delta's rule for streaming
  // reads without a schema-tracking location): batches are served
  // under physical names, and silently diverging from the table's
  // logical view would be a correctness trap
  require(!DataSkipping.hasNonIdentityMapping(spark, path),
    s"$path has renamed or dropped columns (column mapping) — streaming " +
      "reads of a mapped table are not supported; read it as a batch " +
      "(readSkipping / format(\"graft\"))")

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

  /** Marker set pinned by [[prepareForTriggerAvailableNow]]: under
    * `Trigger.AvailableNow` the run drains exactly the commits that
    * existed at query start, then terminates; commits landing mid-run
    * wait for the next run.
    */
  @volatile private var availableNowCeiling: Option[Set[String]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCeiling = Some(markerNames().toSet)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxFiles(maxCommitsPerTrigger)

  /** Markers OBSERVED by this query but not yet admitted into an
    * offset. Accumulating them (instead of re-deriving from the live
    * listing each trigger) closes a capped-admission loss window: a
    * queued marker that compaction expires BEFORE it was admitted
    * would silently vanish from a live listing — from the
    * accumulator it is still admitted, and `getBatch`'s
    * vanished-marker check then fails LOUDLY, the same contract as
    * an expired already-admitted marker. The accumulator is
    * query-lifetime state: across a RESTART the protection is the
    * table's marker retention window itself (compaction must not
    * expire markers faster than consumers drain — the documented
    * `compactTable` retention contract).
    */
  @volatile private var pendingObserved: Set[String] = Set.empty

  /** Admission control: admit at most `limit` NEW named commits past
    * `startOffset` (a `ReadMaxFiles` counts commit markers here —
    * one marker = one logical commit). Deterministic order: new
    * marker names sorted, first N. The initial-snapshot batch (fresh
    * consumer, null start) is not capped below its first offset —
    * snapshot semantics need the whole current marker set in one
    * consistent batch. Offsets stay BOUNDED by the marker-retention
    * window: already-delivered names that have expired from the
    * manifest are pruned from the next offset (they can never be
    * re-delivered — a re-created marker is zero-row by contract).
    */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val start = Option(startOffset)
      .map(StatsCommitOffset.from(_).commits.toSet).getOrElse(Set.empty[String])
    val live = markerNames().toSet
    pendingObserved =
      (pendingObserved ++ availableNowCeiling.getOrElse(live)) -- start
    val fresh = pendingObserved.toSeq.sorted
    val admitted = (Option(startOffset), limit) match {
      case (Some(_), mf: ReadMaxFiles) => fresh.take(mf.maxFiles())
      case _ => fresh
    }
    StatsCommitOffset((start.filter(live) ++ admitted).toSeq.sorted)
  }

  override def reportLatestOffset(): OffsetV2 =
    StatsCommitOffset(markerNames().sorted)

  // Always an offset (possibly the empty set) once the table exists:
  // the INITIAL SNAPSHOT batch must fire even on a fully-compacted
  // table whose markers have all expired — `None` here would mean
  // "no data ever", and the engine would never call getBatch. Equal
  // consecutive offsets (sorted-set equality) trigger no new batch.
  // Retained for engines driving the plain v1 path; admission-control
  // engines call latestOffset above instead.
  override def getOffset: Option[Offset] =
    Some(StatsCommitOffset(markerNames()))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val done = start.map(o => StatsCommitOffset.from(o).commits.toSet)
      .getOrElse(Set.empty[String])
    val todo = StatsCommitOffset.from(end).commits.filterNot(done).sorted
    val dir = DataSkipping.manifestDir(spark, path)
    val markerPaths = todo.map { n =>
      val p = s"$dir/$n.parquet"
      // a named commit this consumer still owes downstream has been
      // EXPIRED from the manifest: delivering an empty batch here
      // would record it consumed with its rows silently lost — fail
      // loudly instead (the consumer lagged past the table's marker
      // retention; raise retentionMs or keep streams within it)
      require(fs.exists(new Path(p)) || start.isEmpty,
        s"stats-table stream at $path: commit marker '$n' is named by this " +
          "batch's offset range but no longer exists in the manifest — a " +
          "compaction expired it before this consumer caught up; its rows " +
          "cannot be replayed. Raise compactTable's retentionMs (marker " +
          "lifetime) or keep downstream streams within the retention window")
      p
    }.filter(p => fs.exists(new Path(p)))
    // fresh consumer: first batch = the current committed snapshot
    // (plain manifest parts) + the markers this offset covers
    val partPaths: Seq[String] =
      if (start.isDefined) Seq.empty
      else fs.listStatus(new Path(dir)).toSeq.map(_.getPath)
        .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        .map(_.toString)
    val manifestPaths = partPaths ++ markerPaths
    val statuses: Seq[FileStatusWithMetadata] =
      if (manifestPaths.isEmpty) Seq.empty
      else spark.read.parquet(manifestPaths: _*)
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

object StatsTableSource {
  /** Default cap on named commits per micro-batch: bounds marker
    * reads and file-status lists for a backlogged consumer while
    * letting ingest-cadence streams (a few commits per trigger)
    * drain in one batch.
    */
  val DefaultMaxCommitsPerTrigger = 128
}

/** `spark.readStream.format(classOf[StatsTableSourceProvider].getName)
  * .option("path", table)[.option("maxCommitsPerTrigger", n)].load()`
  * — the registration glue.
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
    new StatsTableSource(sqlContext, path(parameters),
      parameters.get("maxCommitsPerTrigger").map(_.toInt)
        .getOrElse(StatsTableSource.DefaultMaxCommitsPerTrigger))
}
