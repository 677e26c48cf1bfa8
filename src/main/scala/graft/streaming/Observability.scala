package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.checkpointing.{CommitLog, OffsetSeqLog}

import graft.sources.DataSkipping

/** Streaming BACKLOG observability — the first question an operator
  * asks of a 100 TB pipeline: how far behind is each consumer? For a
  * Kafka stream the answer is consumer-group lag; for the graft
  * stats-table / change-feed sources the equivalent is the distance
  * between the TABLE's committed state and the consumer CHECKPOINT's
  * last committed offset:
  *
  *  - [[StatsTableSource]] progresses over the SET of named commit
  *    markers → lag = live markers the checkpoint has not committed
  *    ([[TableLag.statsTableLag]]);
  *  - [[ChangeFeedSource]] progresses over table VERSIONS → lag =
  *    latest committed version minus the checkpoint's version
  *    ([[TableLag.changeFeedLag]]).
  *
  * Cost is MANIFEST-ONLY on the table side (one directory listing /
  * one version listing — no data files touched, no stream started)
  * plus two tiny checkpoint-log reads, so polling this at 10 s
  * cadence on a thousand-table lakehouse is free. Offsets are read
  * from the last COMMITTED batch (`commits/` log), not the last
  * WRITTEN one (`offsets/` log): an in-flight batch has not durably
  * consumed anything yet, which is exactly how the engine itself
  * replays after a crash.
  */
object TableLag {

  /** One consumer's backlog against one table. `behind` is the
    * universal headline number; the kind-specific fields carry the
    * evidence (pending commit names / version distance).
    */
  sealed trait Lag {
    def table: String
    def checkpoint: String
    def behind: Long
  }

  /** Stats-table (append-stream) consumer lag: `pending` are the
    * live named commits the checkpoint has not committed through.
    */
  final case class CommitLag(table: String, checkpoint: String,
      available: Long, committed: Long, pending: Seq[String]) extends Lag {
    def behind: Long = pending.size.toLong
  }

  /** Change-feed consumer lag in table versions. `committedVersion`
    * is -1 when the checkpoint has not committed any batch yet (the
    * whole retained feed is pending).
    */
  final case class VersionLag(table: String, checkpoint: String,
      latestVersion: Long, committedVersion: Long) extends Lag {
    def behind: Long = math.max(0L, latestVersion - committedVersion)
  }

  /** The table's LIVE named commit markers — the same listing the
    * source's admission control walks (manifest-dir only).
    */
  def liveCommitMarkers(spark: SparkSession, tablePath: String): Seq[String] = {
    val dir = DataSkipping.manifestDir(spark, tablePath)
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir))) Seq.empty
    else fs.listStatus(new Path(dir)).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("part-") &&
        !n.startsWith("_") && !n.startsWith("."))
      .map(_.stripSuffix(".parquet"))
  }

  /** The raw offset JSONs of the checkpoint's last COMMITTED batch —
    * one slot per source in the query's source order (None = that
    * source had no offset in the batch). Empty when no batch has
    * committed (a fresh or never-started checkpoint: the consumer
    * has durably consumed nothing).
    */
  def committedOffsetJsons(spark: SparkSession,
      checkpoint: String): Seq[Option[String]] = {
    val fs = new Path(checkpoint)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(checkpoint, "commits"))) return Seq.empty
    val commitLog = new CommitLog(spark, new Path(checkpoint, "commits").toString)
    commitLog.getLatest() match {
      case None => Seq.empty
      case Some((batchId, _)) =>
        val offsetLog = new OffsetSeqLog(spark,
          new Path(checkpoint, "offsets").toString)
        offsetLog.get(batchId).toSeq
          .flatMap(_.offsets.map(_.map(_.json)))
    }
  }

  /** Backlog of a [[StatsTableSource]] consumer (a `readStream
    * .format("graft")` query, a pipeline stats table, a merge sink):
    * live commit markers minus the ones the checkpoint committed.
    * `sourceIndex` picks the source within a multi-source query
    * (stream-stream joins), default first.
    */
  def statsTableLag(spark: SparkSession, tablePath: String,
      checkpoint: String, sourceIndex: Int = 0): CommitLag = {
    val live = liveCommitMarkers(spark, tablePath)
    val committed = offsetAt(spark, checkpoint, sourceIndex) match {
      case Some(json) if json.contains("\"commits\"") =>
        StatsCommitOffset.parse(json).commits.toSet
      case Some(json) => sys.error(
        s"checkpoint $checkpoint source $sourceIndex is not a stats-table " +
          s"offset: $json")
      case None => Set.empty[String]
    }
    // only LIVE pending markers count — a vacuumed marker the
    // consumer missed is gone either way (same contract as restart)
    CommitLag(tablePath, checkpoint, live.size.toLong,
      live.count(committed).toLong, live.filterNot(committed).sorted)
  }

  /** Backlog of a [[ChangeFeedSource]] consumer in versions.
    * `latestVersion` is -1 for a table with no committed generations
    * yet (a monitoring poll must report clean zero lag there, not
    * crash on the one table that hasn't produced data).
    */
  def changeFeedLag(spark: SparkSession, tablePath: String,
      checkpoint: String, sourceIndex: Int = 0): VersionLag = {
    val latest = DataSkipping.tableVersions(spark, tablePath)
      .maxOption.getOrElse(-1L)
    val committed = offsetAt(spark, checkpoint, sourceIndex) match {
      case Some(json) if json.contains("\"version\"") =>
        CdfVersionOffset.from(
          org.apache.spark.sql.execution.streaming.SerializedOffset(json)).version
      case Some(json) => sys.error(
        s"checkpoint $checkpoint source $sourceIndex is not a change-feed " +
          s"offset: $json")
      case None => -1L
    }
    VersionLag(tablePath, checkpoint, latest, committed)
  }

  private def offsetAt(spark: SparkSession, checkpoint: String,
      sourceIndex: Int): Option[String] = {
    val offs = committedOffsetJsons(spark, checkpoint)
    if (sourceIndex < offs.size) offs(sourceIndex) else None
  }
}
