package graft.streaming

import graft.sources.DataSkipping
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Offset for [[ChangeFeedSource]]: the highest committed table
  * version this stream has delivered. Versions are totally ordered
  * and immutable once committed, so a single long is a complete,
  * replay-deterministic offset.
  */
private[streaming] case class CdfVersionOffset(version: Long) extends Offset {
  override def json: String = s"""{"version":$version}"""
}

private[streaming] object CdfVersionOffset {
  def from(o: org.apache.spark.sql.connector.read.streaming.Offset): CdfVersionOffset =
    o match {
      case v: CdfVersionOffset => v
      case other => CdfVersionOffset(
        "\"version\"\\s*:\\s*(-?\\d+)".r.findFirstMatchIn(other.json)
          .map(_.group(1).toLong)
          .getOrElse(sys.error(s"malformed CDF offset: ${other.json}")))
    }
}

/** Streaming source over a stats table's CHANGE DATA FEED — the
  * `readStream ... option("readChangeFeed", "true")` Delta analog,
  * and the incremental-consumption half of
  * [[graft.sources.DataSkipping.readChangeFeed]]: every row-level
  * DML generation (DELETE / UPDATE / MERGE / RESTORE diff) becomes
  * one micro-batch of typed change rows (`_change_type`,
  * `_commit_version`) for a downstream pipeline stage — at 100 TB
  * the difference between re-reading the table after each merge and
  * shipping just the deltas.
  *
  * Mechanics: offset resolution is one small listing of
  * `_graft_stats` (no data-file listing); `getBatch` reads the
  * `_change_data` dirs of exactly the versions in `(start, end]` as
  * ONE [[graft.sources.ManifestFileIndex]]-served relation through
  * the stream's schema (older generations' narrower change files
  * surface nulls for later columns), recovering each row's
  * `_commit_version` from the generation dir in its file path — the
  * batch plan is a single scan however many versions it spans.
  * Versions without change data (appends, compaction, Z-ORDER)
  * contribute nothing — consume appends through
  * [[StatsTableSource]], exactly the Delta split between insert-only
  * commits and CDC commits.
  *
  * STARTING VERSION: by default the stream begins at the table's
  * current version when the query FIRST starts — only changes
  * committed after that are delivered (Delta's default). Pass
  * `.option("startingVersion", n)` to replay retained history from
  * version n. Either way the resolved start is persisted under the
  * query's checkpoint metadata on first start and re-read on
  * restart, so a crash before the first batch commit cannot slide
  * the window.
  *
  * Exactly-once: the version offset lives in the query checkpoint; a
  * restart re-reads the same immutable generation range — same
  * files, same rows. A version named by a replayed range whose
  * generation has been VACUUMED (the consumer lagged past the
  * retention window) fails LOUDLY rather than delivering silence —
  * the same contract as [[StatsTableSource]]'s expired markers.
  *
  * ADMISSION CONTROL ([[SupportsTriggerAvailableNow]]): the source
  * answers the engine's `latestOffset(start, limit)` directly, so
  *  - `Trigger.AvailableNow` runs the REAL multi-batch drain (end
  *    pinned once at query start by [[prepareForTriggerAvailableNow]])
  *    instead of the lossy single-batch fallback the engine warns
  *    about for plain v1 sources — batch boundaries are deterministic
  *    under load, and an uncommitted batch left by a crash cannot
  *    stop new data from being processed in the same run;
  *  - `maxVersionsPerTrigger` (default 128) caps the COMMITTED
  *    versions per micro-batch, so a `startingVersion=0` replay over
  *    a deep history planes out as bounded batches instead of one
  *    O(versions)-ary union plan.
  *
  * DATA-LOSS OPT-OUT: by default an owed version that is no longer
  * retained (vacuum outran the consumer) or missing mid-range
  * (out-of-band deletion, or a pre-contract build that burned a
  * version slot before the dense-versions contract existed) fails
  * the stream LOUDLY — silence there could lose change rows. Pass
  * `.option("failOnDataLoss", "false")` (Delta CDC's escape hatch)
  * to instead log a warning naming the skipped versions and deliver
  * the change rows that ARE retained; the offset still advances over
  * the hole, so the stream does not wedge permanently on an
  * unreclaimable gap.
  */
final class ChangeFeedSource(
    sqlContext: SQLContext, path: String, metadataPath: String,
    startingVersion: Option[Long],
    maxVersionsPerTrigger: Int = ChangeFeedSource.DefaultMaxVersionsPerTrigger,
    failOnDataLoss: Boolean = true)
  extends Source with SupportsTriggerAvailableNow
  with org.apache.spark.internal.Logging {

  require(maxVersionsPerTrigger > 0,
    s"maxVersionsPerTrigger must be positive, got $maxVersionsPerTrigger")

  private val spark =
    sqlContext.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
  private def fs = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  require(DataSkipping.changeFeedEnabled(spark, path),
    s"$path has no change data feed — create with writeWithStats(" +
      "changeFeed = true) or call enableChangeFeed first")

  // same rule as StatsTableSource: a renamed/dropped table is refused
  // rather than silently streamed under physical names
  require(!DataSkipping.hasNonIdentityMapping(spark, path),
    s"$path has renamed or dropped columns (column mapping) — streaming " +
      "the change feed of a mapped table is not supported; use the batch " +
      "readChangeFeed, which serves the current logical view")

  override val schema: StructType = StructType(
    DataSkipping.tableSchema(spark, path).fields ++ Seq(
      StructField(DataSkipping.ChangeTypeCol, StringType),
      StructField(DataSkipping.CommitVersionCol, LongType, nullable = false)))

  /** First version this stream owes its consumer, resolved ONCE at
    * first start and pinned in the stream's metadata dir: an
    * explicit `startingVersion`, else current-version-plus-one at
    * the moment of first start. Restart re-reads the pin — the
    * window cannot slide even if the first batch never committed.
    */
  private val firstVersion: Long = {
    val pin = new Path(metadataPath, "graft-cdf-start")
    if (!fs.exists(pin)) {
      val resolved = startingVersion.getOrElse(
        DataSkipping.tableVersions(spark, path)
          .maxOption.map(_ + 1).getOrElse(0L))
      fs.mkdirs(new Path(metadataPath))
      // write-aside + rename: the pin is never visible half-written
      // (a crash mid-write leaves only the hidden temp, and the next
      // start resolves afresh); a lost publication race just reads
      // the winner's pin below
      val tmp = new Path(metadataPath,
        s".graft-cdf-start-${java.util.UUID.randomUUID}")
      val out = fs.create(tmp, false)
      try out.write(resolved.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, pin)) fs.delete(tmp, false)
    }
    val in = fs.open(pin)
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    finally in.close()
  }

  /** Highest committed version, floored at "delivered nothing yet"
    * (`firstVersion - 1`) so a fresh stream on a DML-free table has a
    * stable offset. One small generation-dir listing.
    */
  private def latestVersion: Long =
    DataSkipping.tableVersions(spark, path).maxOption
      .getOrElse(firstVersion - 1).max(firstVersion - 1)

  /** End version pinned by [[prepareForTriggerAvailableNow]]: under
    * `Trigger.AvailableNow` every `latestOffset` answer is capped
    * here, so the run drains exactly the data that existed at query
    * start and then terminates — DML landing mid-run waits for the
    * next run.
    */
  @volatile private var availableNowCeiling: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCeiling = Some(latestVersion)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxFiles(maxVersionsPerTrigger)

  /** Admission control: advance at most `limit` COMMITTED versions
    * past `startOffset` (a `ReadMaxFiles` counts versions here — one
    * generation = one logical commit). When the remaining committed
    * versions all fit, the offset jumps straight to the ceiling so
    * trailing no-change versions (appends, compaction) are absorbed
    * without an extra empty batch.
    */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val start = Option(startOffset).map(CdfVersionOffset.from(_).version)
      .getOrElse(firstVersion - 1)
    // one generation-dir listing per trigger, shared by ceiling + cap
    val versions = DataSkipping.tableVersions(spark, path)
    val ceiling = availableNowCeiling
      .getOrElse(versions.maxOption.getOrElse(firstVersion - 1))
      .max(start)
    val end = limit match {
      case mf: ReadMaxFiles =>
        val pending = versions.filter(v => v > start && v <= ceiling)
        if (pending.length <= mf.maxFiles()) ceiling
        else pending(mf.maxFiles() - 1)
      case _ => ceiling
    }
    CdfVersionOffset(end)
  }

  override def reportLatestOffset(): OffsetV2 = CdfVersionOffset(latestVersion)

  // Offset even when nothing is pending (the engine diffs
  // consecutive offsets; equal case-class values fire no batch).
  // firstVersion - 1 = "delivered nothing yet". Retained for engines
  // that drive the plain v1 path; admission-control engines call
  // latestOffset above instead.
  override def getOffset: Option[Offset] =
    Some(CdfVersionOffset(latestVersion))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(o => CdfVersionOffset.from(o).version + 1)
      .getOrElse(firstVersion)
    val endV = CdfVersionOffset.from(end).version
    val statsDir = s"$path/${DataSkipping.StatsDir}"
    // Committed versions are DENSE by contract: a crashed generation
    // build's slot is reclaimed by the next writer after a grace
    // window (commitBuildAs occupant reclaim), and vacuum removes
    // superseded generations oldest-first (removal timestamps are
    // supersede-order monotone), so the retained committed set is a
    // contiguous suffix. Two loud failures guard the two ways that
    // invariant can be broken from outside: (1) an owed version below
    // the earliest retained one — vacuum outran this consumer;
    // (2) an owed version MISSING mid-range — out-of-band deletion
    // (manual cleanup, object-store loss); silence there could lose
    // change rows, so the stream refuses rather than skips.
    val have = DataSkipping.tableVersions(spark, path)
    if (failOnDataLoss) {
      require(fromV > endV || have.headOption.exists(_ <= fromV),
        s"change-feed stream at $path: versions from $fromV are named by " +
          "this batch's offset range but are no longer retained " +
          s"(earliest retained: ${have.headOption.getOrElse("none")}) — " +
          "vacuum outran this consumer and its change rows cannot be " +
          "proven replayable. Raise the table's retentionMs, keep " +
          "downstream streams within the retention window, or accept " +
          "the loss explicitly with .option(\"failOnDataLoss\", \"false\")")
      val owed = have.filter(v => v >= fromV && v <= endV)
      require(fromV > endV || owed.size == (endV - fromV + 1),
        s"change-feed stream at $path: committed versions " +
          s"${(fromV to endV).filterNot(owed.contains).mkString("[", ",", "]")} " +
          "are named by this batch's offset range but are missing from " +
          "the generation directory — committed versions are dense by " +
          "contract, so a mid-range hole means out-of-band deletion (or " +
          "a pre-contract build that burned the slot) and the stream " +
          "cannot prove the missing change rows were empty. Accept the " +
          "loss explicitly with .option(\"failOnDataLoss\", \"false\")")
    } else if (fromV <= endV) {
      // opt-out: name every owed-but-absent version, deliver the rest
      val missing = (fromV to endV).filterNot(have.contains)
      if (missing.nonEmpty) logWarning(
        s"change-feed stream at $path: skipping versions " +
          s"${missing.mkString("[", ",", "]")} owed by this batch's " +
          "offset range but no longer present (vacuumed, deleted " +
          "out-of-band, or a burned pre-contract slot) — their change " +
          "rows, if any, are LOST to this consumer " +
          "(failOnDataLoss=false)")
    }
    // ONE relation over every owed version's change files (plan arity
    // O(1) regardless of versions in the batch — a deep replay batch
    // is one scan, not an O(versions)-ary union): the per-file
    // `_commit_version` is recovered from the generation dir in the
    // file's own path instead of a per-version literal stamp. Older
    // generations' narrower change files surface nulls for later
    // columns straight from the parquet reader.
    val files = have.filter(v => v >= fromV && v <= endV).flatMap { v =>
      val cd = new Path(new Path(statsDir, s"v$v"), DataSkipping.ChangeDataDir)
      if (!fs.exists(cd)) Nil
      else fs.listStatus(cd).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(f => org.apache.spark.sql.execution.datasources
          .FileStatusWithMetadata(f))
    }
    if (files.isEmpty)
      org.apache.spark.sql.graft.GraftSqlShims.ofRows(spark,
        LocalRelation(DataTypeUtils.toAttributes(schema), Nil, isStreaming = true))
    else {
      val readSchema = StructType(schema.fields
        .filterNot(_.name == DataSkipping.CommitVersionCol))
      // small batches serve straight from the driver-side part cache
      // (change files are generation state, write-once like manifest
      // parts — r18 verdict #7): the micro-batch becomes a streaming
      // LocalRelation, zero scan jobs. Any over-budget version falls
      // the WHOLE batch back to the one-relation scan (plan arity
      // stays O(1) regardless of versions in the batch).
      val localRows: Option[Seq[org.apache.spark.sql.catalyst.InternalRow]] = {
        val perVersion = have.filter(v => v >= fromV && v <= endV).map { v =>
          val cd = new Path(new Path(statsDir, s"v$v"),
            DataSkipping.ChangeDataDir)
          if (!fs.exists(cd)) Some(Nil)
          else {
            val parts = fs.listStatus(cd).toSeq.filter(f =>
              f.isFile && f.getPath.getName.endsWith(".parquet"))
            graft.sources.DataSkipping
              .localPartRows(spark, cd.toString, parts, readSchema)
              .map(_.map(r => (r, v)))
          }
        }
        if (perVersion.exists(_.isEmpty)) None
        else {
          val toInternal = org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToCatalystConverter(schema)
          Some(perVersion.flatMap(_.get).map { case (r, v) =>
            toInternal(org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v))
              .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
          })
        }
      }
      localRows match {
        case Some(rows) =>
          org.apache.spark.sql.graft.GraftSqlShims.ofRows(spark,
            LocalRelation(DataTypeUtils.toAttributes(schema), rows,
              isStreaming = true))
        case None =>
          val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
            new graft.sources.ManifestFileIndex(new Path(statsDir), files),
            partitionSchema = new StructType(),
            dataSchema = readSchema,
            bucketSpec = None,
            fileFormat = new org.apache.spark.sql.execution.datasources
              .parquet.ParquetFileFormat,
            options = Map.empty)(spark)
          org.apache.spark.sql.graft.GraftSqlShims.ofRows(spark,
            org.apache.spark.sql.execution.datasources.LogicalRelation(
              relation, isStreaming = true))
            .withColumn(DataSkipping.CommitVersionCol,
              org.apache.spark.sql.functions.regexp_extract(
                org.apache.spark.sql.functions.col("_metadata.file_path"),
                "/v(\\d+)/" + DataSkipping.ChangeDataDir + "/", 1)
                .cast(org.apache.spark.sql.types.LongType))
      }
    }
  }

  override def stop(): Unit = ()

  override def toString: String = s"ChangeFeedSource[$path]"
}

object ChangeFeedSource {
  /** Default cap on committed versions per micro-batch: bounds the
    * per-batch union plan (and task count) when replaying a deep
    * history, while letting steady-state maintenance (a handful of
    * versions per refresh) still drain in one batch.
    */
  val DefaultMaxVersionsPerTrigger = 128
}

/** `spark.readStream.format(classOf[ChangeFeedSourceProvider].getName)
  * .option("path", table)[.option("startingVersion", n)]
  * [.option("maxVersionsPerTrigger", n)]
  * [.option("failOnDataLoss", "false")].load()`.
  */
final class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-change-feed"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-change-feed source requires .option(\"path\", <stats table dir>)"))

  private def feedSchema(sqlContext: SQLContext, p: String): StructType =
    StructType(DataSkipping.tableSchema(sqlContext.sparkSession, p).fields ++ Seq(
      StructField(DataSkipping.ChangeTypeCol, StringType),
      StructField(DataSkipping.CommitVersionCol, LongType, nullable = false)))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(feedSchema(sqlContext, path(parameters))))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedSource(sqlContext, path(parameters), metadataPath,
      parameters.get("startingVersion").map(_.toLong),
      parameters.get("maxVersionsPerTrigger").map(_.toInt)
        .getOrElse(ChangeFeedSource.DefaultMaxVersionsPerTrigger),
      failOnDataLoss = parameters.get("failOnDataLoss")
        .forall(_.toBoolean))
}
