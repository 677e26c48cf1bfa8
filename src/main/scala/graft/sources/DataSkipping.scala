package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

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
  * MANIFEST GENERATIONS (the Delta-log-checkpoint analog): the stats
  * dir holds versioned generation dirs `v0, v1, ...`, each a COMPLETE
  * manifest snapshot — part files, sidecars, named commit markers —
  * made visible by an atomic `_COMMIT` marker file created LAST.
  * Readers resolve the highest committed generation and plan against
  * it; [[compactTable]] builds the next generation offline (invisible
  * until its marker lands) and commits with ONE file create — there
  * is no delete-then-rename window and therefore no repair path. A
  * crash mid-build leaves an uncommitted generation dir that readers
  * never see, reclaimed by the next vacuum. Appends land INSIDE the
  * current generation (the manifest gains rows, the generation does
  * not change — generations are compaction/migration events, exactly
  * like Delta checkpoints vs commits). Pre-generation FLAT manifests
  * (parts directly under `_graft_stats`) are still read and appended
  * compatibly; compaction migrates them to `v0`.
  *
  * RETENTION (the Delta-VACUUM analog): maintenance never deletes a
  * file a concurrent reader could still be scanning. Compaction
  * records every file it replaces (and the generation it supersedes)
  * in the new generation's removal log with a timestamp;
  * [[vacuumTable]] deletes a recorded file only `retentionMs` after
  * its removal, and unrecorded debris (crashed-append orphans, stale
  * staging dirs) only `retentionMs` after its last modification. A
  * reader that planned against generation N keeps every data file it
  * resolved for at least the retention window after a concurrent
  * compaction commits N+1 — at 100 TB, long-running queries
  * overlapping maintenance are the NORMAL case, which is exactly why
  * Delta's VACUUM defaults to 7 days. Pass `retentionMs = 0` only
  * when no reader can be in flight (tests, exclusive maintenance
  * windows).
  *
  * SCHEMA EVOLUTION on append (`mergeSchema = true`, the Auto-Loader
  * addNewColumns analog at the storage layer): a batch may carry NEW
  * columns. The widened schema sidecars are written FIRST (every
  * crash point leaves a consistently-readable table), old data files
  * read through the widened schema yield nulls for the new columns,
  * and old MANIFEST rows read through the widened manifest schema
  * yield null min/max/null-counts — which the rewriter interprets
  * exactly right: null min/max = "no non-null values in this file"
  * prunes value predicates, and `coalesce(nulls_c, n_rows)` backfills
  * the null count so `IS NULL` keeps pre-evolution files and
  * `IS NOT NULL` prunes them.
  *
  * Predicate support (the skippable subset): =, <, <=, >, >=, IN,
  * ASCII startsWith, and — on manifests carrying per-file null
  * counts (the "nulls" feature, Delta's nullCount analog; written by
  * default, legacy tables upgraded by compactTable) — IS NULL /
  * IS NOT NULL, composed with AND/OR. Anything else is handled
  * CONSERVATIVELY — an unsupported conjunct prunes nothing, an
  * unsupported disjunct disables pruning of its OR — so correctness
  * never depends on the rewriter's coverage. Null semantics fall out
  * of SQL three-valued logic: an all-null file has null min/max, the
  * skip predicate evaluates null, and the file is (correctly)
  * dropped for any value comparison.
  */
/** A clause of the full conditional MERGE ([[DataSkipping.mergeInto]]
  * — the Delta `whenMatched`/`whenNotMatched`/`whenNotMatchedBySource`
  * builder's clause model). Clause conditions and UPDATE SET values
  * reference the target row as `t.<col>` and (for matched clauses)
  * the pairing source row as `s.<col>`; insert conditions see only
  * `s.<col>`, by-source clauses only `t.<col>`. First matching clause
  * wins within each family; a row matching no clause carries
  * unchanged.
  */
sealed trait MergeClause
object MergeClause {
  case class MatchedUpdate(condition: Option[Column], set: Map[String, Column]) extends MergeClause
  case class MatchedDelete(condition: Option[Column]) extends MergeClause
  case class NotMatchedInsert(condition: Option[Column]) extends MergeClause
  case class BySourceUpdate(condition: Option[Column], set: Map[String, Column]) extends MergeClause
  case class BySourceDelete(condition: Option[Column]) extends MergeClause
}

/** A generation commit lost an optimistic race against a concurrent
  * writer (another maintenance/DML op committed the version number
  * first, or a concurrent append landed mid-build). The losing op is
  * safe to RE-RUN against the new table state — every op's inputs
  * are declarative (predicates, key sets, target versions), so
  * re-execution is exactly the write-serializable ordering Delta's
  * optimistic concurrency produces. [[DataSkipping]]'s entry points
  * retry internally ([[DataSkipping.ConcurrentRetries]] attempts);
  * this surfaces only under pathological sustained contention.
  */
class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

object DataSkipping extends org.apache.spark.internal.Logging {

  val StatsDir = "_graft_stats"
  val SchemaFile = "_table_schema.json"
  val StatsColsFile = "_stats_cols.txt"
  val FeaturesFile = "_manifest_features.txt"
  val ManifestSchemaFile = "_manifest_schema.json"
  val CommitFile = "_COMMIT"
  val RemovedFile = "_removed.txt"

  /** Per-generation operation record (`_op.json`: operation name +
    * entry timestamp) — the DESCRIBE HISTORY analog's storage. Absent
    * on generations written before this sidecar existed (and on a
    * `writeWithStats` v0, which IS the WRITE operation).
    */
  val OpFile = "_op.json"

  /** Per-generation idempotent-writer sidecar (`_txn.json`: a JSON
    * map of application id → last applied transaction version — the
    * Delta `txnAppId`/`txnVersion` analog). Written by DML ops passed
    * a `txn` stamp and CARRIED FORWARD verbatim into every later
    * generation (compaction, restore, unrelated DML), so the
    * watermark survives vacuum of the generation that wrote it. An
    * at-least-once writer (foreachBatch's crash window: its DML
    * committed but its stream offset didn't) checks
    * [[txnVersion]] before re-applying a batch — replaying an
    * already-stamped version is a detectable no-op, not a silent
    * double-apply.
    */
  val TxnFile = "_txn.json"

  /** Manifest feature flag: this table records a CHANGE DATA FEED
    * (the Delta `enableChangeDataFeed` table-property analog). See
    * [[writeWithStats]] / [[readChangeFeed]].
    */
  val CdfFeature = "changefeed"

  /** Manifest feature flag + sidecar for a PARTITION-CONVERTED table
    * (Delta's `CONVERT TO DELTA ... PARTITIONED BY` analog): the data
    * files live in Hive-style `col=value` subdirectories and do NOT
    * physically contain the partition columns — values are derived
    * from directory names at planning time and served through the
    * relation's partition schema (never read from data bytes). The
    * sidecar lists the partition column names in directory-nesting
    * order; their types live in the ordinary schema sidecar. The
    * feature flag makes pre-partitioning readers refuse loudly
    * instead of returning all-null partition columns.
    */
  val PartitionColsFile = "_partition_cols.txt"
  val PartitionedFeature = "partitioned"

  /** Per-generation clustering-state sidecar (`_clustered.txt`): the
    * liquid-clustering analog. First line = the table's clustering
    * spec (`<curve>:<zcol1>,<zcol2>[,...]`, physical names); each
    * further line = the NAME of a data file whose rows were written
    * in clustered order. `OPTIMIZE ZORDER` (full rewrite) sets it;
    * [[optimizeIncremental]] reclusters only manifest files NOT
    * listed here, then extends the list. DML rewrites and appends
    * simply produce files that are not on the list (their carried
    * sidecar names the replaced file, which is no longer in the
    * manifest — stale names are pruned at the next incremental run,
    * and UUID file names make a stale-name collision impossible), so
    * "unclustered backlog" is always derivable from (manifest files)
    * minus (this list) with no bookkeeping on the write path.
    */
  val ClusteredFile = "_clustered.txt"

  /** Per-generation change-data subdir (`v<N>/_change_data`): the
    * leading underscore hides it from the generation's own parquet
    * manifest read, and living INSIDE the generation dir makes it
    * atomic with the `_COMMIT` marker and reclaimed by the same
    * vacuum that reclaims the generation — the CDF availability
    * window IS the time-travel retention window, exactly Delta's
    * CDF-vs-VACUUM coupling.
    */
  val ChangeDataDir = "_change_data"
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  /** DELETION VECTORS (the Delta deletion-vector analog — merge-on-
    * read DELETE/UPDATE): a parquet dir inside the generation holding
    * `(file, row_index)` positions that are DELETED from otherwise-
    * untouched data files. [[deleteWhereDV]]/[[updateWhereDV]] write
    * O(changed rows) instead of rewriting files — at 100 TB, deleting
    * 0.1% of rows costs the DV rows, not a copy of every touched
    * file. Every read and every DML-internal scan applies the DV as a
    * BROADCAST-hash LEFT ANTI join on (`_metadata.file_path`,
    * `_metadata.row_index`) — O(1) probe per row, no shuffle of the
    * data side; file stats stay valid as UPPER bounds (a DV only
    * removes rows, so min/max/nulls pruning can only over-keep, never
    * over-prune). Generations CARRY the DV forward minus rewritten/
    * removed files; [[compactTable]] MATERIALIZES it (rewrites files
    * without the dead rows and clears the vector) — the broadcast's
    * size bound is therefore the deletes between compactions, the
    * same maintenance contract Delta's OPTIMIZE has. Living inside
    * the generation dir makes the vector atomic with `_COMMIT`,
    * time-travel-consistent (each version reads ITS OWN vector) and
    * vacuumed with its generation.
    */
  val DvDir = "_dv"

  /** CHECK constraints (the Delta `ALTER TABLE ADD CONSTRAINT`
    * analog): a JSON sidecar mapping constraint name → SQL boolean
    * expression, carried forward by every generation like [[TxnFile]].
    * SQL CHECK semantics — a row violates only when the expression is
    * FALSE (NULL passes). Enforcement happens at the single choke
    * point every new row passes through: the STAGED files of an
    * append or DML rewrite are validated before the move-in/commit,
    * so a violating batch aborts with the table untouched (only
    * inert staging debris remains, reclaimed by vacuum) and costs
    * one extra read of the staged batch — O(batch), never O(table).
    * [[addCheckConstraint]] validates existing rows first (or
    * `validate = false` registers a monitoring-only constraint for
    * staged rollout — [[constraintViolations]] reports its live
    * counts). A RESTORE carries the CURRENT constraint set and does
    * NOT re-validate the restored rows (validation pins the state at
    * add time; auditing a restore is [[constraintViolations]]'s job).
    */
  val ConstraintsFile = "_constraints.json"

  /** GENERATED COLUMNS (`_generated.json`, the Delta
    * `GENERATED ALWAYS AS (expr)` analog): logical column name →
    * generation SQL expression. Two behaviors compose:
    *
    *  - COMPUTE on append: a batch that OMITS a generated column
    *    gets it computed from the stored expression before any
    *    schema check — the writer convenience that makes derived
    *    pruning columns (event_day from a timestamp) maintenance-
    *    free. With min/max file stats on the generated column this
    *    is the graft equivalent of Delta's partition pruning via
    *    generation expressions: filter the derived column, prune
    *    files, zero writer discipline required.
    *  - ENFORCE everywhere else: registration also installs the
    *    paired CHECK constraint `_gen_<col>` asserting
    *    `col <=> (expr)`, so a batch (or DML rewrite) that SUPPLIES
    *    the column with non-conforming values aborts at the same
    *    staged-write choke point every constraint uses — the table
    *    can never hold a row whose generated column disagrees with
    *    its expression (validated back to add time, like Delta).
    *
    * Expressions are stored in LOGICAL names (the compute runs on
    * the logical batch before any column-mapping translation); the
    * paired constraint goes through [[addCheckConstraint]]'s
    * physical binding, so enforcement survives RENAME COLUMN.
    */
  val GeneratedFile = "_generated.json"

  /** IDENTITY COLUMNS (`_identity.json`, the Delta `GENERATED ALWAYS
    * AS IDENTITY` analog): logical column name → `"start,step,next"`
    * where `next` is the high-water mark — the next id this table
    * will issue. Appends must OMIT the column (GENERATED ALWAYS);
    * the engine assigns each batch row a fresh id from the
    * arithmetic sequence `start + k*step` and advances `next` by
    * `step * batchRows` SIDECAR-FIRST, so a crash between the
    * watermark advance and the data move burns ids (a gap — legal
    * for identity, Delta's contract too) but can never issue the
    * same id twice. Ids are allocated densely per batch with NO
    * global sort and NO window: `monotonically_increasing_id`
    * decomposes into (partition, row-in-partition), per-partition
    * counts (O(tasks) driver rows, the partition-count pattern) turn
    * into exclusive prefix offsets broadcast-joined back, and the id
    * is pure arithmetic — codegen the whole way. The batch is pinned
    * (persist) across the count and write passes so a recomputation
    * cannot re-deal rows across partitions between them.
    *
    * DML keeps stored ids verbatim (rewrites carry rows; MERGE
    * sources carry the full schema and thus supply ids — the
    * caller's contract, like Delta's `GENERATED BY DEFAULT` inserts);
    * UPDATE refuses to assign an identity column. The sidecar rides
    * DML generations and clones forward; RESTORE carries the CURRENT
    * watermark (content rewinds, issued ids are never re-issued —
    * the same never-rewind rule as `_txn.json`).
    *
    * RETRIED WRITERS: because the watermark advances sidecar-first, a
    * failing or engine-retried append burns a batch-sized id gap on
    * EVERY retry — unless the append carries a `commitName`, whose
    * early idempotency short-circuit (already-committed name → no-op)
    * runs BEFORE the identity hook. Streaming/foreachBatch writers
    * into identity tables should therefore always pass a commitName
    * derived from the batch id; anonymous retries are legal (gaps
    * are Delta's identity contract too) but waste id space fast.
    */
  val IdentityFile = "_identity.json"

  /** Default reader-safety window (Delta VACUUM's default): nothing a
    * manifest ever claimed is deleted sooner than this after being
    * replaced.
    */
  val RetentionDefaultMs: Long = 7L * 24 * 60 * 60 * 1000
  private val SwapPrefix = ".stats-swap-"
  private val GenRe = "^v(\\d+)$".r

  /** The generation version a manifest dir path names (None for a
    * legacy flat manifest dir).
    */
  private def obsVersionOf(dir: String): Option[Long] =
    GenRe.findFirstMatchIn(new Path(dir).getName).map(_.group(1).toLong)

  // -----------------------------------------------------------------
  // Generation resolution
  // -----------------------------------------------------------------

  /** (version, status) of every `v<N>` generation dir, ascending. */
  private def genDirs(fs: org.apache.hadoop.fs.FileSystem,
      statsDir: Path): Seq[(Long, FileStatus)] =
    if (!fs.exists(statsDir)) Seq.empty
    else fs.listStatus(statsDir).toSeq.flatMap { f =>
      f.getPath.getName match {
        case GenRe(v) if f.isDirectory => Some(v.toLong -> f)
        case _ => None
      }
    }.sortBy(_._1)

  private def isCommittedGen(fs: org.apache.hadoop.fs.FileSystem, gen: Path): Boolean =
    fs.exists(new Path(gen, CommitFile))

  /** Highest committed generation, if the table is versioned. */
  private def currentGen(fs: org.apache.hadoop.fs.FileSystem,
      statsDir: Path): Option[(Long, Path)] =
    genDirs(fs, statsDir)
      .filter { case (_, f) => isCommittedGen(fs, f.getPath) }
      .lastOption.map { case (v, f) => v -> f.getPath }

  /** The directory the CURRENT manifest lives in: the highest
    * committed generation for a versioned table, the flat stats dir
    * for a legacy one (completing any torn pre-generation swap
    * first). Everything the planner needs — manifest parts, sidecars,
    * commit markers — is under this one dir.
    */
  def manifestDir(spark: SparkSession, path: String): String = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    manifestDirOf(fs, path)
  }

  private def manifestDirOf(fs: org.apache.hadoop.fs.FileSystem, path: String): String = {
    val statsDir = new Path(s"$path/$StatsDir")
    currentGen(fs, statsDir) match {
      case Some((_, gen)) => gen.toString
      case None =>
        repairStatsSwap(fs, path)
        // the repaired swap may itself carry generations (a versioned
        // stats dir torn loose by pre-generation-era maintenance)
        currentGen(fs, statsDir).map(_._2.toString).getOrElse(statsDir.toString)
    }
  }

  /** Manifest rows of the table's current generation, read through
    * the persisted manifest schema (no footer reads; post-evolution
    * parts wider than older ones surface nulls for the added
    * columns). Falls back to a merged-footer read for manifests
    * written before the schema sidecar existed.
    */
  def readManifest(spark: SparkSession, path: String): DataFrame =
    readManifestIn(spark, manifestDir(spark, path))

  /** Feature flags THIS build implements. Everything else in a
    * manifest's `_manifest_features.txt` came from a NEWER writer
    * whose semantics this reader cannot honor — and ignoring a
    * feature is not merely slow: a different stats encoding or
    * row-visibility rule would make an ignorant read WRONG. So every
    * manifest consumer (reads, metadata aggregates, appends,
    * compaction, DML, vacuum — they all plan through
    * [[readManifestIn]]) REFUSES unknown features loudly — the Delta
    * reader/writer-protocol rule, feature-name-granular like Delta's
    * table features. `describeHistory`/`tableVersions` stay readable
    * (inspection needs no feature semantics).
    */
  private def unknownFeatures(feats: Set[String]): Set[String] =
    feats.filterNot(f =>
      f == "nulls" || f == CdfFeature || f == PartitionedFeature ||
        f.startsWith("bloom:"))

  private def readManifestIn(spark: SparkSession, dir: String): DataFrame = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val unknown = unknownFeatures(manifestFeatures(fs, dir))
    require(unknown.isEmpty,
      s"manifest at $dir requires table feature(s) " +
        s"[${unknown.toSeq.sorted.mkString(", ")}] this build does not " +
        "implement — refusing to read rather than silently ignoring them " +
        "(a newer writer's stats encoding or visibility rule could make an " +
        "ignorant read wrong, not just slow); upgrade the library")
    readSidecar(spark, dir, ManifestSchemaFile) match {
      case Some(json) =>
        spark.read.schema(DataType.fromJson(json).asInstanceOf[StructType]).parquet(dir)
      case None => spark.read.option("mergeSchema", "true").parquet(dir)
    }
  }

  /** How many optimistic-commit races a DML/maintenance entry point
    * absorbs by re-running itself before giving up.
    */
  val ConcurrentRetries = 8

  /** Re-run `body` on [[ConcurrentWriteException]] — the optimistic
    * retry loop every generation-building entry point wraps itself
    * in. Each retry re-executes the WHOLE op from scratch, so it
    * re-plans against whatever state the winning writer committed
    * (declarative inputs make that the correct serial order). Small
    * jittered backoff so a herd of contenders interleaves instead of
    * re-colliding.
    */
  private def withConcurrentRetry[T](op: String)(body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: ConcurrentWriteException =>
          attempt += 1
          if (attempt >= ConcurrentRetries)
            throw new ConcurrentWriteException(
              s"$op lost $attempt consecutive optimistic-commit races " +
                s"(last: ${e.getMessage}) — sustained writer contention; " +
                "coordinate maintenance or retry later")
          Thread.sleep(5L + scala.util.Random.nextInt(45))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The manifest dir's current *.parquet file names (parts + named
    * commit markers) — the OBSERVED SET an optimistic writer pins its
    * carried-rows read to and hands to [[publishGeneration]], which
    * treats anything beyond it as a concurrent append to ride
    * forward verbatim.
    */
  private def listManifestNames(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Set[String] = {
    val p = new Path(dir)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet
  }

  /** [[readManifestIn]] PINNED to an explicit file-name set: the
    * returned frame reads exactly those files, so a concurrent
    * append landing after the listing can never half-appear in a
    * generation build (it is either wholly beyond the pin — and
    * ridden forward verbatim at publish — or wholly inside it).
    */
  private def readManifestPinned(spark: SparkSession, dir: String,
      names: Set[String]): DataFrame = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val unknown = unknownFeatures(manifestFeatures(fs, dir))
    require(unknown.isEmpty,
      s"manifest at $dir requires table feature(s) " +
        s"[${unknown.toSeq.sorted.mkString(", ")}] this build does not implement")
    if (names.isEmpty) readManifestIn(spark, dir).limit(0)
    else {
      val paths = names.toSeq.sorted.map(n => s"$dir/$n")
      readSidecar(spark, dir, ManifestSchemaFile) match {
        case Some(json) =>
          spark.read.schema(DataType.fromJson(json).asInstanceOf[StructType])
            .parquet(paths: _*)
        case None =>
          spark.read.option("mergeSchema", "true").parquet(paths: _*)
      }
    }
  }

  /** Complete a torn LEGACY manifest swap: the pre-generation
    * compactTable swapped via delete + rename — a crash between the
    * two leaves the table without a flat manifest but WITH the
    * fully-built swap dir, which this finishes. Generation commits
    * made the window structurally impossible; this survives only so
    * tables written by the old layout still open. One `exists` check
    * when the table is healthy.
    */
  private def repairStatsSwap(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val statsDir = new Path(s"$path/$StatsDir")
    if (fs.exists(statsDir) || !fs.exists(new Path(path))) return
    val swaps = fs.listStatus(new Path(path))
      .filter(f => f.isDirectory && f.getPath.getName.startsWith(SwapPrefix))
    if (swaps.nonEmpty) {
      // single-writer maintenance ⇒ at most one swap is mid-flight;
      // take the newest (older ones are pre-delete debris)
      val chosen = swaps.maxBy(_.getModificationTime)
      require(fs.rename(chosen.getPath, statsDir),
        s"completing torn stats swap ${chosen.getPath} failed")
    }
  }

  // -----------------------------------------------------------------
  // Write / append
  // -----------------------------------------------------------------

  /** Write `df` as parquet at `path` plus a per-file manifest for
    * `statsCols`: min/max per column, row count, and the file's SIZE
    * and MODIFICATION TIME (from the scan's `_metadata` struct — no
    * extra filesystem listing), so a pruned read can build its file
    * index purely from the manifest. The table schema is persisted
    * alongside (`_table_schema.json`) so planning never touches a
    * data-file footer. Stats are computed in ONE extra scan of the
    * written files, grouped by file (partial-agg shuffle keyed on
    * file path — one row per file crosses the wire).
    */
  def writeWithStats(df: DataFrame, path: String, statsCols: Seq[String]): Unit =
    writeWithStats(df, path, statsCols, Nil)

  /** As above, plus per-file BLOOM filters for `bloomCols` — the
    * Delta bloom-filter-index analog for point lookups on
    * high-cardinality columns where min/max ranges are useless (an
    * unclustered id spans every file's range, so range stats keep
    * everything; a per-file Bloom keeps ~1 file + fpp stragglers).
    * Costs `bloomBits/8` bytes per file per column in the manifest
    * (8 KB at the 64 Ki default) — opt in for the tables you point-
    * look-up, not everywhere.
    *
    * `changeFeed = true` enables the table's CHANGE DATA FEED (the
    * Delta `enableChangeDataFeed` analog, a manifest feature flag):
    * every row-level DML generation additionally materializes its
    * changed rows under `_change_data/v<N>` for [[readChangeFeed]].
    * Appends need no change files — they stream as inserts through
    * [[graft.streaming.StatsTableSource]] (exactly Delta's
    * insert-only-commit optimization); compaction changes nothing
    * logically and records nothing.
    *
    * `partitionBy` non-empty writes a NATIVE HIVE-PARTITIONED graft
    * table (the Delta `partitionBy` writer analog): rows route into
    * `col=value` directories, each partition column is tracked
    * implicitly (per-file min = max = the directory value — exact
    * file-level partition pruning straight from the manifest), and
    * the result is byte-for-byte the table [[convertToStats]]'s
    * PARTITIONED BY form produces — every partitioned capability
    * (appends, DML, merges, OPTIMIZE, Z-order, restore, feed)
    * applies. Partition column TYPES are the DataFrame's own (the
    * sidecar schema is authoritative; directory strings cast back to
    * it at read time), so a `bigint` partition column stays `bigint`
    * even where bare directory discovery would narrow it.
    */
  /** Overwrite a NON-graft target by STAGING: run the write job into
    * a hidden dir under the target first, then clear the old entries
    * and move the staged children up. Reached only when `path` holds
    * no committed graft table (fresh dir, plain parquet, crashed
    * first-write debris) — an existing graft table overwrites through
    * [[overwriteGeneration]] instead (one atomic generation commit,
    * old files on the removal log). Ordering still matters here: the
    * write job (which may READ the target) completes against the
    * intact old files before anything is deleted, so a self-reading
    * overwrite is simply correct, and a write-job failure leaves the
    * old dir byte-identical. The swap itself is NOT atomic — new
    * files move in first (flat names can't collide: UUID part names;
    * a colliding old entry, e.g. a partition dir of the same
    * `col=value` name or a stale _SUCCESS, is deleted just-in-time
    * inside the move loop), then the remaining old entries clear — so
    * a crash inside the move/delete phase can leave a MIX of old and
    * new files in a plain directory. That is the accepted contract
    * for a target that was never a graft table (no manifest existed,
    * so no manifest can be lost); graft tables never take this path.
    * The staging dir is dot-prefixed so listing-based readers never
    * see it.
    */
  private def stagedOverwrite(spark: SparkSession, path: String,
      write: String => Unit): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(root,
      s".overwrite-staging-${java.util.UUID.randomUUID}")
    try write(staging.toString)
    catch {
      case e: Throwable =>
        // failed write job: the old table is untouched — remove the
        // partial staging dir and surface the failure
        try fs.delete(staging, true)
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
    // swap, NEW FILES FIRST: snapshot the old entries, move the
    // staged children up (UUID part names can't collide; a stale
    // same-named marker like _SUCCESS is itself an old entry —
    // cleared just-in-time), THEN delete the old entries (old data
    // files, old _graft_stats generations). Ordering shrinks the
    // crash exposure: up to the deletes, the old manifest still
    // references only intact old files (a crash strands the new
    // files as manifest-invisible orphans, never a missing table);
    // only the delete phase itself — pure metadata ops, no job — can
    // leave a torn state, and the caller's fresh v0 commit is the
    // reader-visible switch.
    val old = fs.listStatus(root)
      .filterNot(_.getPath.getName == staging.getName)
    val movedNames = fs.listStatus(staging).map { e =>
      val dest = new Path(root, e.getPath.getName)
      if (fs.exists(dest)) fs.delete(dest, true)
      require(fs.rename(e.getPath, dest),
        s"staged overwrite of $path: rename ${e.getPath} -> $dest failed")
      e.getPath.getName
    }.toSet
    fs.delete(staging, true)
    // a replaced-in-place name (e.g. _SUCCESS) now IS the new file —
    // the old-entry sweep must not delete it
    old.filterNot(e => movedNames(e.getPath.getName))
      .foreach(e => fs.delete(e.getPath, true))
  }

  /** Does `path` hold a COMMITTED graft table — a committed
    * generation, or a legacy flat manifest (repairing a torn
    * pre-generation swap first, like [[manifestDirOf]])? Decides
    * whether an overwrite must commit through the generation
    * machinery ([[overwriteGeneration]]) or may build a fresh v0
    * ([[stagedOverwrite]] — nothing committed exists to protect).
    */
  private def committedTableAt(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Boolean = {
    val statsDir = new Path(s"$path/$StatsDir")
    currentGen(fs, statsDir).nonEmpty || {
      if (fs.exists(statsDir)) repairStatsSwap(fs, path)
      currentGen(fs, statsDir).nonEmpty ||
        (fs.exists(statsDir) && fs.listStatus(statsDir).exists(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet")))
    }
  }

  /** Overwrite an EXISTING graft table as ONE atomic generation
    * commit — the Delta overwrite contract: stage the new files, then
    * publish generation v(N+1) whose manifest references ONLY them,
    * with every old data file on the new generation's removal log for
    * retention vacuum (never deleted inline). Consequences, all
    * load-bearing at 100 TB:
    *
    *  - ATOMIC to concurrent readers: the table flips old→new at the
    *    single `_COMMIT` create; there is no window where a reader
    *    resolves no manifest (the pre-r17 swap deleted the old
    *    generations before the fresh v0 committed — minutes of
    *    O(files) object-store deletes with the table unreadable).
    *  - CRASH-SAFE: a failure at ANY point before the commit leaves
    *    the old generation current and every old file intact; the
    *    staged/moved new files are manifest-invisible orphans,
    *    reclaimed by [[vacuumTable]]'s orphan pass.
    *  - IN-FLIGHT-READER-SAFE: a reader pinned to the old generation
    *    keeps its files for the retention window, like after any
    *    compaction or DML.
    *  - TIME-TRAVELABLE: the pre-overwrite state stays readable via
    *    `versionAsOf` and restorable via [[restoreTable]] until
    *    retention expires; `describeHistory` records the OVERWRITE.
    *
    * Semantics are CREATE OR REPLACE: the batch defines the new
    * schema, tracked columns, partitioning and feature flags;
    * declarations (CHECK constraints, column mapping, generated /
    * identity columns, clustering state) reset rather than riding
    * forward — exactly what the pre-r17 delete-everything swap
    * produced, now without its torn-table windows. The old
    * declarations remain in the superseded generations for time
    * travel. Old commit markers fold to zero-row (their batches are
    * no longer replayable — the compaction caveat, table-wide), which
    * still short-circuits an at-least-once writer's replays.
    *
    * The write job runs against the INTACT old table, so a
    * self-reading overwrite (`INSERT OVERWRITE t SELECT … FROM t`)
    * stays correct. Optimistic concurrency is the standard contract:
    * strict observed+1 commit targeting, whole-op retry on a lost
    * race; a concurrent APPEND beyond the observed pin rides into the
    * new generation verbatim (serialized after the overwrite).
    */
  private def overwriteGeneration(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String, df: DataFrame,
      statsCols: Seq[String], bloom: Option[(Seq[String], Int, Int)],
      changeFeed: Boolean, partitionBy: Seq[String]): Unit =
      withConcurrentRetry("overwrite") {
    val opStart = System.currentTimeMillis()
    val dir = manifestDirOf(fs, path)
    // observed pin BEFORE the manifest read — the optimistic-commit
    // contract (anything landing later rides forward verbatim)
    val observed = listManifestNames(fs, dir)
    // every old data file → the removal log (bounded manifest-rows
    // collect, like every maintenance op); a partless manifest
    // (freshly bootstrapped empty table) removes nothing
    val removed =
      if (observed.isEmpty) Seq.empty[String]
      else readManifestPinned(spark, dir, observed)
        .select("file").distinct().collect()
        .map(r => rootRelativeOrName(fs, path, r.getString(0))).toSeq
    val staging = new Path(path,
      s".overwrite-staging-${java.util.UUID.randomUUID}")
    try {
      if (partitionBy.isEmpty) df.write.parquet(staging.toString)
      else df.write.partitionBy(partitionBy: _*).parquet(staging.toString)
    } catch {
      case e: Throwable =>
        try fs.delete(staging, true)
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
    val moved =
      if (partitionBy.isEmpty) moveIn(fs, staging, new Path(path))
      else moveInPartitioned(fs, staging, new Path(path))
    require(moved.nonEmpty,
      s"overwrite of $path wrote no data files (empty input) — " +
        "an empty overwrite is refused, like the fresh-table write path")
    val (schema, tracked, written) =
      if (partitionBy.isEmpty) {
        // read-back schema like the fresh flat write (nullable)
        val w = spark.read.parquet(moved: _*)
        (w.schema, statsCols, w)
      } else {
        // same schema construction + part-aware stats scan as the
        // fresh partitioned write — but restricted to the MOVED
        // files (the root still holds the old generation's files)
        val sch = StructType(
          (df.schema.filterNot(f => partitionBy.contains(f.name)) ++
            partitionBy.map(c => df.schema(df.schema.fieldIndex(c))))
            .map(_.copy(nullable = true)))
        (sch, statsCols ++ partitionBy,
          partAwareStatusScanCols(spark, path, partitionBy, sch,
            statusesFor(fs, moved)))
      }
    val stats = statsFor(written, tracked, withNulls = true, bloom)
    val feats = Set("nulls") ++
      (if (partitionBy.nonEmpty) Set(PartitionedFeature)
       else Set.empty[String]) ++
      bloom.map(b => bloomFeatureLine(b)).toSet ++
      (if (changeFeed) Set(CdfFeature) else Set.empty[String])
    publishGeneration(spark, fs, path, dir, stats, schema, tracked,
      feats, stats.schema,
      removedData = removed,
      markerRetentionMs = RetentionDefaultMs, opStartMs = opStart,
      verbatimMarkers = Set.empty,
      changeData = None, op = "OVERWRITE", txn = None, dv = None,
      clustered = None, observedParts = Some(observed),
      resetDeclarations = true,
      partitionColsNew = Some(partitionBy).filter(_.nonEmpty))
    vacuumTable(spark, path, RetentionDefaultMs)
  }

  def writeWithStats(df: DataFrame, path: String, statsCols: Seq[String],
      bloomCols: Seq[String], bloomBits: Int = 1 << 16,
      bloomHashes: Int = 7, changeFeed: Boolean = false,
      partitionBy: Seq[String] = Nil): Unit = {
    require(statsCols.nonEmpty, "at least one stats column")
    val spark = df.sparkSession
    val bloom = if (bloomCols.isEmpty) None
      else Some((bloomCols, bloomBits, bloomHashes))
    if (partitionBy.nonEmpty) {
      partitionBy.foreach(c => require(df.columns.contains(c),
        s"partition column $c is not in the DataFrame ${df.schema.simpleString}"))
      require(statsCols.intersect(partitionBy).isEmpty &&
          bloomCols.intersect(partitionBy).isEmpty,
        "partition columns are tracked implicitly (min=max=directory " +
          "value); statsCols / bloomCols must name data columns")
      requireVisiblePartitionNames(partitionBy)
    }
    val tfs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (committedTableAt(tfs, path)) {
      // replacing a LIVE graft table: one atomic generation commit,
      // old files on the removal log — never the delete-then-recommit
      // swap (see overwriteGeneration)
      overwriteGeneration(spark, tfs, path, df, statsCols, bloom,
        changeFeed, partitionBy)
    } else if (partitionBy.isEmpty) {
      stagedOverwrite(spark, path, s => df.write.mode("overwrite").parquet(s))
      val written = spark.read.parquet(path)
      val stats = statsFor(written, statsCols, withNulls = true, bloom)
      // v0, committed by its marker — the overwrite above cleared the
      // table dir, so this is always the first generation
      val gen = s"$path/$StatsDir/v0"
      stats.write.mode("overwrite").parquet(gen)
      writeSidecars(spark, gen, written.schema, statsCols,
        Set("nulls") ++ bloom.map(b => bloomFeatureLine(b)).toSet ++
          (if (changeFeed) Set(CdfFeature) else Set.empty),
        manifestSchema = Some(stats.schema))
      commitGen(spark, new Path(gen))
    } else {
      // Staged like the flat branch (write job first, destructive
      // clear after) — and the explicit clear also keeps "this is
      // always the first generation" under spark.sql.sources
      // .partitionOverwriteMode=dynamic, where a direct partitioned
      // overwrite replaces only the partitions the batch touches and
      // stale UNCOMMITTED `_stats` debris would otherwise survive
      // under the fresh v0 below. Staging into a fresh empty dir
      // neutralizes dynamic mode for the write itself (every
      // partition is "touched" in an empty target).
      stagedOverwrite(spark, path,
        s => df.write.mode("overwrite").partitionBy(partitionBy: _*).parquet(s))
      // NULLABLE sidecar, matching the flat path's read-back schemas:
      // a later evolution batch may omit a column, and a REQUIRED
      // column missing from a file fails the parquet reader
      val schema = StructType(
        (df.schema.filterNot(f => partitionBy.contains(f.name)) ++
          partitionBy.map(c => df.schema(df.schema.fieldIndex(c))))
          .map(_.copy(nullable = true)))
      // v0 stats run through the SAME part-aware scan every append and
      // read uses (partition values cast from the raw directory
      // segments via castPartValue), NOT through spark.read.parquet
      // discovery: for a STRING partition column holding a
      // numeric-looking, non-canonical value ('01'), discovery narrows
      // to int 1 and the cast back yields '1', while the read path
      // serves the raw '01' — a `= '01'` predicate would then prune
      // the file against its own manifest and silently drop rows.
      val fs = new Path(path).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val written = partAwareStatusScanCols(spark, path, partitionBy, schema,
        listPartitionedDataFiles(fs, new Path(path)))
      val tracked = statsCols ++ partitionBy
      val stats = statsFor(written, tracked, withNulls = true, bloom)
      val gen = s"$path/$StatsDir/v0"
      stats.write.mode("overwrite").parquet(gen)
      writeSidecars(spark, gen, schema, tracked,
        Set("nulls", PartitionedFeature) ++
          bloom.map(b => bloomFeatureLine(b)).toSet ++
          (if (changeFeed) Set(CdfFeature) else Set.empty),
        manifestSchema = Some(stats.schema))
      val out = fs.create(new Path(gen, PartitionColsFile), true)
      try out.write(partitionBy.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      commitGen(spark, new Path(gen))
    }
  }

  /** CONVERT TO GRAFT (the Delta `CONVERT TO DELTA` analog): build a
    * stats-table manifest OVER an existing plain parquet directory —
    * ZERO data bytes rewritten, so converting a 100 TB dataset costs
    * one stats scan (the same per-file grouped aggregate every write
    * runs), not a rewrite. After conversion the directory is a
    * first-class graft table: pruned reads, appends, DML, time
    * travel, OPTIMIZE — everything. The original files simply become
    * generation v0's data files; `describeHistory` records CONVERT.
    *
    * Refused on a directory that already has a stats dir (already a
    * graft table) or holds no parquet files.
    *
    * PARTITIONED LAYOUTS (`partitionBy` non-empty — Delta's
    * `CONVERT TO DELTA ... PARTITIONED BY` analog): the source is a
    * Hive-partitioned dataset (`path/a=1/b=x/part-*.parquet`).
    * Partition values come from DIRECTORY NAMES, never data bytes —
    * still zero rewrite. Each partition column becomes a tracked
    * stats column (its per-file min = max = the directory value), so
    * partition-predicate pruning is exact FILE-level manifest
    * pruning: no directory listing at plan time, strictly better
    * than Hive-style partition enumeration at 10^5 partitions. The
    * names land in the [[PartitionColsFile]] sidecar and the
    * [[PartitionedFeature]] flag, and reads serve the values through
    * the relation's partition schema (see [[readSkippingIn]]). A
    * partition-converted table is FULLY MUTABLE: appends
    * ([[appendPartitioned]] routes each batch into the partition
    * layout), copy-on-write and deletion-vector DELETE/UPDATE +
    * PURGE with the change feed, keyed merges (partition migration
    * included), within-partition OPTIMIZE/Z-order/incremental
    * recluster, RESTORE, streaming reads and writes, and metadata
    * DDL (RENAME of data AND partition columns, DROP of data
    * columns, generated and identity columns; partition-column DROP
    * and identity-on-partition-column are refused with narrow
    * rules) and mergeSchema SCHEMA EVOLUTION (new nullable data
    * columns, omitted data columns; the partition frame itself is
    * fixed — a batch always carries every partition column and can
    * never add one). `partitionBy` must name
    * the directory levels in nesting order; partition column types
    * are inferred exactly as `spark.read.parquet` infers them.
    *
    * With `partitionBy` empty, the source must be a plain FLAT
    * parquet dataset; a directory holding `col=value` subdirectories
    * is refused with a pointer at the partitioned form — only
    * layouts that are neither flat nor Hive-partitioned (arbitrary
    * nested dirs, mixed flat+partitioned) are genuinely
    * unconvertible.
    *
    * Returns the number of data files the manifest now tracks.
    */
  def convertToStats(spark: SparkSession, path: String, statsCols: Seq[String],
      bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 16,
      bloomHashes: Int = 7, changeFeed: Boolean = false,
      partitionBy: Seq[String] = Nil): Long = {
    require(statsCols.nonEmpty, "at least one stats column")
    requireVisiblePartitionNames(partitionBy)
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(s"$path/$StatsDir")),
      s"$path already has a stats dir — it is already a graft table")
    val entries = fs.listStatus(new Path(path))
    val nested = entries.filter(f =>
      f.isDirectory && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
    val topFiles = entries.filter { f =>
      val n = f.getPath.getName
      f.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }
    val bloom = if (bloomCols.isEmpty) None
      else Some((bloomCols, bloomBits, bloomHashes))

    if (partitionBy.isEmpty) {
      require(nested.isEmpty,
        s"$path holds subdirectories (${nested.map(_.getPath.getName).take(3).mkString(",")}" +
          ") — pass partitionBy (SQL: CONVERT ... PARTITIONED BY) for a " +
          "Hive-partitioned layout; other nested layouts are not convertible")
      require(topFiles.nonEmpty, s"no top-level parquet data files at $path to convert")
      val existing = spark.read.parquet(path)
      val stats = statsFor(existing, statsCols, withNulls = true, bloom)
      val gen = s"$path/$StatsDir/v0"
      stats.write.mode("overwrite").parquet(gen)
      writeSidecars(spark, gen, existing.schema, statsCols,
        Set("nulls") ++ bloom.map(b => bloomFeatureLine(b)).toSet ++
          (if (changeFeed) Set(CdfFeature) else Set.empty),
        manifestSchema = Some(stats.schema))
      writeOpFile(fs, new Path(gen), "CONVERT", opStart)
      commitGen(spark, new Path(gen))
      topFiles.length.toLong
    } else {
      require(topFiles.isEmpty,
        s"$path mixes top-level parquet files with partition directories " +
          "— a mixed flat+partitioned layout is not convertible")
      require(nested.nonEmpty, s"no partition directories at $path to convert")
      val notPart = nested.filterNot(
        _.getPath.getName.startsWith(partitionBy.head + "="))
      require(notPart.isEmpty,
        s"subdirectories (${notPart.map(_.getPath.getName).take(3).mkString(",")}) " +
          s"are not '${partitionBy.head}=' partition dirs — the layout does not " +
          s"match PARTITIONED BY (${partitionBy.mkString(", ")})")
      require(statsCols.intersect(partitionBy).isEmpty &&
          bloomCols.intersect(partitionBy).isEmpty,
        "partition columns are tracked implicitly (min=max=directory value); " +
          "STATS BY / bloom columns must name data columns")
      // row-level DML commits on partition-converted tables, so the
      // feed has real rows to record — the change files materialize
      // the partition columns from the part-aware touched scan, and
      // feed readers serve them flat.
      // Spark's own partition discovery parses the directory keys and
      // infers their types; the discovered columns land LAST in the
      // schema, which is the canonical order the sidecar keeps.
      val existing = spark.read.parquet(path)
      val discovered = existing.schema.fieldNames.toSeq
      require(discovered.takeRight(partitionBy.size) == partitionBy,
        s"discovered partition columns ${discovered.takeRight(partitionBy.size)
          .mkString("(", ", ", ")")} do not match PARTITIONED BY " +
          s"(${partitionBy.mkString(", ")}) — names must be given in " +
          "directory-nesting order")
      val tracked = statsCols ++ partitionBy
      val stats = statsFor(existing, tracked, withNulls = true, bloom)
      val gen = s"$path/$StatsDir/v0"
      stats.write.mode("overwrite").parquet(gen)
      writeSidecars(spark, gen, existing.schema, tracked,
        Set("nulls", PartitionedFeature) ++
          bloom.map(b => bloomFeatureLine(b)).toSet ++
          (if (changeFeed) Set(CdfFeature) else Set.empty),
        manifestSchema = Some(stats.schema))
      val out = fs.create(new Path(gen, PartitionColsFile), true)
      try out.write(partitionBy.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      writeOpFile(fs, new Path(gen), "CONVERT", opStart)
      commitGen(spark, new Path(gen))
      spark.read.parquet(gen).count()
    }
  }

  /** Partition column names of a partition-converted table (empty
    * for ordinary flat graft tables). Directory-nesting order.
    */
  def tablePartitionColumns(spark: SparkSession, path: String): Seq[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    partitionColsIn(fs, manifestDirOf(fs, path))
  }

  /** The partition columns under their CURRENT LOGICAL names (the
    * sidecar stores PHYSICAL names — stable directory keys that a
    * RENAME never moves; users declare partitioning in logical
    * names, so comparisons against a declaration must translate).
    */
  def tablePartitionColumnsLogical(spark: SparkSession,
      path: String): Seq[String] = {
    val phys = tablePartitionColumns(spark, path)
    if (phys.isEmpty) phys
    else {
      val inverse = columnMapping(spark, path).map(_.swap)
      phys.map(p => inverse.getOrElse(p, p))
    }
  }

  /** Shared writer-entry guard: a caller-declared `partitionBy` must
    * either be empty (appends always route by the table's OWN
    * layout) or name exactly the table's partition columns — in
    * LOGICAL names, so the check survives a partition-column
    * rename. Silently ignoring a mismatched declaration would leave
    * the user believing a layout that does not exist.
    */
  private[graft] def requireDeclaredPartitioning(spark: SparkSession,
      path: String, declared: Seq[String], what: String): Unit =
    if (declared.nonEmpty) {
      val logical = tablePartitionColumnsLogical(spark, path)
      require(declared == logical,
        s"$what: partitionBy(${declared.mkString(",")}) does not match the " +
          s"table's partition columns (${logical.mkString(",")}) — writes " +
          "route by the table's own layout; omit partitionBy or match it")
    }

  private[sources] def partitionColsIn(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Seq[String] =
    readSidecarIn(fs, dir, PartitionColsFile)
      .map(_.linesIterator.filter(_.nonEmpty).toSeq).getOrElse(Nil)

  /** A partition column named with a leading '_' or '.' would
    * produce `_col=value` directories that Spark's OWN hidden-path
    * convention (and every walker in this file) skips — the batch
    * would be written and then silently invisible to stats, moves
    * and reads. Refuse loudly at every partitioned write entry.
    */
  private def requireVisiblePartitionNames(partCols: Seq[String]): Unit =
    partCols.foreach(c => require(
      !c.startsWith("_") && !c.startsWith("."),
      s"partition column name '$c' starts with '_' or '.' — its " +
        s"'$c=value' directories would be treated as HIDDEN paths by " +
        "Spark's listing convention (silent data loss); rename the " +
        "column before partitioning by it"))

  /** Every data file under a partitioned table root: walks the
    * `col=value` tree, skipping hidden ('_'/'.'-prefixed) dirs and
    * files — the manifest dir, crash-staging dirs, _SUCCESS. One
    * driver-side recursive listing, O(partition dirs + files), used
    * only by the v0 write (append/DML paths track their own moved
    * files and never re-list).
    */
  private def listPartitionedDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Seq[FileStatusWithMetadata] = {
    def walk(d: Path): Seq[FileStatusWithMetadata] =
      fs.listStatus(d).toSeq.flatMap { f =>
        val n = f.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (f.isDirectory) walk(f.getPath)
        else if (n.endsWith(".parquet")) Seq(FileStatusWithMetadata(f))
        else Nil
      }
    walk(root)
  }

  /** `col=value` partition values for one data file, parsed from its
    * path — raw (still-escaped-string) form; [[castPartValue]] turns
    * them into typed partition-row values. Only segments BELOW the
    * table root are considered: a root directory that itself looks
    * like `col=value` (e.g. `/data/shard=5/tbl`) must not silently
    * supply a partition value when the real per-file segment is
    * missing — that case keeps the loud error below. Both paths are
    * qualified through the table's filesystem before relativizing, so
    * a RELATIVE or differently-qualified root (`tmp/t` handed to a
    * table whose manifest stores `file:/cwd/tmp/t/...`) aligns by URI
    * prefix instead of tripping a misaligned segment count. A file
    * that does not resolve under the root at all (a shallow CLONE's
    * manifest names the SOURCE table's files) parses the partition
    * dirs nesting immediately above the file instead — contiguous
    * `col=value` segments of tracked columns only, so a source root
    * that itself looks like `col=value` still cannot supply a phantom
    * value past a non-partition segment.
    */
  private def parsePartValues(fs: org.apache.hadoop.fs.FileSystem,
      tableRoot: String, filePath: String, partCols: Seq[String]): Seq[String] = {
    val rootUri = fs.makeQualified(new Path(tableRoot)).toUri.getPath
      .stripSuffix("/") + "/"
    val fileUri = fs.makeQualified(new Path(filePath)).toUri.getPath
    def colOf(seg: String): Option[String] = {
      val i = seg.indexOf('=')
      if (i <= 0) None
      else Some(ExternalCatalogUtils.unescapePathName(seg.substring(0, i)))
    }
    val segs: Seq[String] =
      if (fileUri.startsWith(rootUri))
        fileUri.substring(rootUri.length)
          .split('/').toSeq.filter(_.nonEmpty)
      else fileUri.split('/').filter(_.nonEmpty)
        .dropRight(1).reverseIterator
        .takeWhile(seg => colOf(seg).exists(partCols.contains))
        .toSeq.reverse
    val kv = segs.flatMap(seg =>
      colOf(seg).map(_ -> seg.substring(seg.indexOf('=') + 1))).toMap
    partCols.map(c => kv.getOrElse(c, sys.error(
      s"data file $filePath carries no '$c=' partition segment — the " +
        "manifest names a file outside the table's partition layout")))
  }

  /** One raw directory value → the typed value a partition row
    * carries, via the SAME cast Spark's partition discovery uses
    * conceptually: unescape, null for the Hive default-partition
    * marker, then a UTC string cast to the sidecar type.
    */
  private def castPartValue(raw: String, dt: DataType): Any =
    if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
    else org.apache.spark.sql.catalyst.expressions.Cast(
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString(
        ExternalCatalogUtils.unescapePathName(raw)),
        org.apache.spark.sql.types.StringType), dt, Some("UTC"))
      .eval(InternalRow.empty)

  /** Turn on the change data feed for an EXISTING stats table (the
    * `ALTER TABLE ... SET TBLPROPERTIES (enableChangeDataFeed=true)`
    * analog): stamps [[CdfFeature]] into the current generation's
    * feature sidecar. Takes effect for row-level DML committed AFTER
    * this call — history is not backfilled (same as Delta: the feed
    * starts at the version where the property landed). The sidecar is
    * replaced via write-aside + atomic overwrite-rename: a crash at
    * any point leaves either the old or the new flag set, never a
    * truncated file (an empty features file would silently drop the
    * "nulls"/bloom flags and make the next compaction rebuild the
    * manifest without them). Single-writer like all maintenance ops.
    */
  def enableChangeFeed(spark: SparkSession, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    require(fs.exists(new Path(dir, SchemaFile)),
      s"$path is not a stats table with a schema sidecar; use writeWithStats first")
    val feats = manifestFeatures(fs, dir) + CdfFeature
    val tmp = new Path(dir, s".features-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(feats.toSeq.sorted.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(tmp.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new Path(dir, FeaturesFile),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The atomic generation commit: one `_COMMIT` file create. The
    * file CONTAINS the commit instant (epoch millis, IN-COMMIT
    * timestamps — Delta's fix for the same problem): an object-store
    * migration or a plain `cp -r` rewrites file mtimes, and a
    * TIMESTAMP AS OF keyed on mtime would silently resolve to wrong
    * versions on the copied table. Readers fall back to the mtime
    * for legacy empty `_COMMIT`s ([[commitInstant]]).
    */
  private def commitGen(spark: SparkSession, gen: Path): Unit = {
    val fs = gen.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Monotonicity clamp (Delta enforces the same invariant): a clock
    // regression between two commits (NTP step, VM migration) must
    // not record v(n+1) with an instant earlier than v(n) — a
    // TIMESTAMP AS OF keyed on `filter(_ <= ts).max` would then
    // resolve an instant to a version that did not yet exist at that
    // wall clock. Write max(prevInstant + 1, now).
    val prev: Long = """v(\d+)$""".r.findFirstMatchIn(gen.getName)
      .map(_.group(1).toLong).filter(_ > 0L)
      .map(n => new Path(gen.getParent, s"v${n - 1}"))
      .filter(p => fs.exists(new Path(p, CommitFile)))
      .map(p => commitInstant(fs, p))
      .getOrElse(Long.MinValue)
    val instant = math.max(
      if (prev == Long.MinValue) Long.MinValue else prev + 1L,
      System.currentTimeMillis())
    val out = fs.create(new Path(gen, CommitFile), false)
    try out.write(instant.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** A generation's commit instant: the in-commit timestamp written
    * by [[commitGen]], falling back to the `_COMMIT` mtime for
    * legacy tables committed before in-commit timestamps existed.
    */
  private def commitInstant(fs: org.apache.hadoop.fs.FileSystem,
      gen: Path): Long = {
    val p = new Path(gen, CommitFile)
    val st = fs.getFileStatus(p)
    if (st.getLen == 0L) st.getModificationTime
    else {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
      txt.toLongOption.getOrElse(st.getModificationTime)
    }
  }

  private def bloomFeatureLine(b: (Seq[String], Int, Int)): String =
    s"bloom:${b._2}:${b._3}:${b._1.mkString(",")}"

  private def ndvFeatureLine(n: (Seq[String], Int)): String =
    s"ndv:${n._2}:${n._1.mkString(",")}"

  /** Parse the `ndv:<p>:<cols>` feature line — per-file HLL register
    * sets at precision p for those columns.
    */
  private def ndvFeature(features: Set[String]): Option[(Seq[String], Int)] =
    features.collectFirst { case f if f.startsWith("ndv:") =>
      val parts = f.split(":", 3)
      (parts(2).split(",").toSeq, parts(1).toInt)
    }

  /** Parse the `bloom:<bits>:<hashes>:<cols>` feature line. */
  private def bloomFeature(features: Set[String]): Option[(Seq[String], Int, Int)] =
    features.collectFirst { case f if f.startsWith("bloom:") =>
      val parts = f.split(":", 4)
      (parts(3).split(",").toSeq, parts(1).toInt, parts(2).toInt)
    }

  /** col -> probe count for the bloom-indexed columns actually
    * present in the manifest (the feature line and the `bloom_`
    * column must both agree before the rewriter may probe).
    */
  private def bloomIndex(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, statsColumns: Array[String]): Map[String, Int] =
    bloomFeature(manifestFeatures(fs, dir)) match {
      case Some((cols, _, hashes)) =>
        cols.filter(c => statsColumns.contains(s"bloom_$c"))
          .map(_ -> hashes).toMap
      case None => Map.empty
    }

  /** Per-file stats rows (one output row per input file) for a scan
    * that carries `_metadata`: min/max per stats column, row count,
    * file size and mtime. Partial-agg shuffle keyed on file path —
    * one row per file crosses the wire.
    */
  private def statsFor(scan: DataFrame, statsCols: Seq[String],
      withNulls: Boolean = true,
      bloom: Option[(Seq[String], Int, Int)] = None,
      ndv: Option[(Seq[String], Int)] = None): DataFrame = {
    if (bloom.isDefined) graft.plans.GraftFunctions.register(scan.sparkSession)
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")) ++
        // per-file null counts (Delta's nullCount analog) enable
        // IS [NOT] NULL pruning; emitted only when the table's
        // manifest generation carries them — a mixed-schema
        // manifest is exactly what the statsCols check forbids
        (if (withNulls)
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
        else Nil)) ++
      // per-file Bloom filters over xxhash64 of the column value
      bloom.toSeq.flatMap { case (cols, bits, hashes) =>
        cols.map(c => call_function("graft_bloom_agg",
          xxhash64(col(c)), lit(bits), lit(hashes)).as(s"bloom_$c"))
      } ++ Seq(
      count(lit(1)).as("n_rows"),
      max(col("_metadata.file_size")).as("file_size"),
      max(unix_millis(col("_metadata.file_modification_time"))).as("mod_time"))
    val base = scan.select(col("*"), col("_metadata"))
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
    // per-file HLL register sets (`ndv_<col>`: sorted sparse
    // (bucket, rho) structs, ≤ 2^p entries) — the column behind
    // [[approxDistinctMeta]]. Registers use EXACTLY the
    // [[graft.operators.Sketches.registerColumns]] hash chain, so a
    // fold over file registers is bit-identical to sketching the
    // rows. Needs its own per-(file, bucket) aggregate, hence the
    // extra write-time pass per column — opt in for columns you ask
    // distinct-count questions about. An all-null file (or a file
    // predating the column) joins to a NULL register set = the empty
    // sketch, exact because COUNT(DISTINCT) ignores nulls too.
    val withNdv = ndv.fold(base) { case (cols, p) =>
      cols.foldLeft(base) { (acc, c) =>
        val (bucket, rho) = graft.operators.Sketches.registerColumns(col(c), p)
        val regs = scan.select(col("_metadata.file_path").as("file"), col(c))
          .filter(col(c).isNotNull)
          .groupBy(col("file"), bucket.cast("int").as("b"))
          .agg(max(rho).cast("int").as("r"))
          .groupBy(col("file"))
          .agg(sort_array(collect_list(struct(col("b"), col("r"))))
            .as(s"ndv_$c"))
        acc.join(regs, Seq("file"), "left")
      }
    }
    withNdv.coalesce(1)
  }

  /** O(1) read of a small text/JSON sidecar in a manifest dir. */
  private def readSidecarIn(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, name: String): Option[String] = {
    val p = new Path(dir, name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  private def readSidecar(spark: SparkSession, dir: String,
      name: String): Option[String] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    readSidecarIn(fs, dir, name)
  }

  /** O(1) manifest feature flags ("nulls" = per-file null counts
    * present). Absent file = legacy manifest, no flags.
    */
  private def manifestFeatures(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Set[String] =
    readSidecarIn(fs, dir, FeaturesFile)
      .map(_.linesIterator.filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  /** Schema + tracked-columns + feature (+ manifest-schema) sidecars
    * into `dir` — the generation dir being built or appended to.
    */
  private def writeSidecars(spark: SparkSession, dir: String,
      schema: StructType, statsCols: Seq[String],
      features: Set[String] = Set("nulls"),
      manifestSchema: Option[StructType] = None): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(name: String, content: String): Unit = {
      val out = fs.create(new Path(dir, name), true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    put(SchemaFile, schema.json)
    put(StatsColsFile, statsCols.mkString("\n"))
    put(FeaturesFile, features.toSeq.sorted.mkString("\n"))
    manifestSchema.foreach(ms => put(ManifestSchemaFile, ms.json))
  }

  /** Tracked stats columns from the sidecar (O(1)); falls back to a
    * manifest listing + footer read for pre-sidecar tables.
    */
  private def trackedCols(spark: SparkSession, dir: String): Set[String] =
    readSidecar(spark, dir, StatsColsFile) match {
      case Some(content) => content.linesIterator.filter(_.nonEmpty).toSet
      case None => spark.read.parquet(dir).columns
        .collect { case c if c.startsWith("min_") => c.drop(4) }.toSet
    }

  /** Append a batch to an existing stats table WITHOUT touching what
    * is already there: data files are written to a hidden staging dir
    * and moved into the table root, then the manifest GAINS rows for
    * exactly those files (parquet append into the CURRENT generation
    * — appends never create generations). Nothing lists or re-scans
    * the existing table — the writer knows its own files, the same
    * reason Delta's commit can be O(batch): at ingest cadence on a
    * 100 TB table, the alternative (writeWithStats over everything)
    * re-reads and re-writes the world per batch. Driver memory is
    * O(files in this batch) — bounded by the batch itself.
    *
    * Snapshot order: data files move first (manifest readers still
    * see the old file set — complete and consistent), the manifest
    * rows land second and are the visibility point. A crash in
    * between leaves orphan data files that manifest readers never
    * see; plain-path readers see them as extra rows until the next
    * [[vacuumTable]] pass reclaims them (after retention).
    *
    * SCHEMA: by default the batch schema must equal the stored
    * sidecar schema (name + type, nullability ignored). With
    * `mergeSchema = true` the batch may ADD columns (the Auto-Loader
    * addNewColumns analog; see class doc for why every crash point
    * stays consistent): the widened schema + tracked-column sidecars
    * are rewritten FIRST, old data files read through the widened
    * schema yield nulls, and old manifest rows yield null stats that
    * the rewriter backfills correctly. Dropping or retyping columns
    * is still rejected loudly. Evolution requires a versioned
    * (generation) manifest — run [[compactTable]] once to migrate a
    * legacy flat table.
    *
    * NAMED COMMITS (`commitName`) — the exactly-once hook for
    * at-least-once writers (Structured Streaming's foreachBatch): the
    * batch's manifest rows land as ONE parquet file named
    * `<commitName>.parquet` inside the manifest dir, and that file IS
    * the commit marker (an empty batch still writes a zero-row
    * marker — the marker's existence is the commit, unconditionally).
    * A replayed batch whose marker already exists is skipped up front
    * (returns false, nothing written); a crash after the data-file
    * move but before the marker leaves orphan data files that
    * manifest readers never see — the replay re-writes the batch and
    * commits, and the orphans are reclaimed by [[vacuumTable]] after
    * retention. Manifest-reader-visible state is therefore
    * exactly-once per commit name; names must not start with `part-`
    * (reserved for plain manifest parts, and how compaction tells
    * markers apart to preserve them).
    *
    * `statsCols` must match the table's tracked column set (with
    * `mergeSchema = true`: contain it — new columns extend it) — a
    * mixed-schema manifest would silently mis-prune.
    *
    * @return true if the batch committed; false if `commitName` was
    *         already present (idempotent replay skip)
    */
  /** AUTO-COMPACTION (the Delta autoOptimize/autoCompact analog,
    * opt-in): after an append lands, count the manifest's small
    * files (one aggregate over the manifest table — never a data
    * read or file listing) and trigger [[compactTable]] when the
    * small-file tail reaches `minSmallFiles`. The ingest-cadence
    * maintenance loop, automated: streaming appends stop degrading
    * read planning without an external OPTIMIZE scheduler, and the
    * threshold makes the compaction cost amortized — one rewrite
    * per `minSmallFiles` appends, not one per append.
    *
    * @param smallFileBytes files strictly below this are "small"
    * @param minSmallFiles  compact once at least this many exist
    * @return whether a compaction ran
    */
  def autoCompact(spark: SparkSession, path: String,
      smallFileBytes: Long = 32L * 1024 * 1024,
      minSmallFiles: Int = 16,
      targetFileBytes: Long = 128L * 1024 * 1024): Boolean = {
    require(smallFileBytes > 0 && minSmallFiles > 0)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val small = readManifestIn(spark, dir)
      .filter(col("file_size") < smallFileBytes)
      .limit(minSmallFiles).count()
    if (small < minSmallFiles) false
    else { compactTable(spark, path, targetFileBytes); true }
  }

  /** Column-mapping translation for an append batch: LOGICAL names
    * in, PHYSICAL names out. Mapped columns translate to their
    * physical names; NEW logical columns (mergeSchema evolution)
    * keep their names but must be fresh against the table's whole
    * physical history — a re-added dropped/renamed-away name binding
    * to the old physical column would resurrect dropped values. The
    * identity entries for new columns land BEFORE the data (the
    * sidecars-first crash-consistency order schema evolution uses).
    */
  private def translateBatchForAppend(path: String,
      fs: org.apache.hadoop.fs.FileSystem, dir: String, df0: DataFrame,
      statsCols0: Seq[String], mergeSchema: Boolean): (DataFrame, Seq[String]) =
    colMapIn(fs, dir) match {
      case None => (df0, statsCols0)
      case Some(m) =>
        val stored0 = tableSchemaIn(df0.sparkSession, path, dir)
        val physTaken = stored0.fieldNames.toSet ++ m.values
        val fresh = df0.columns.filterNot(m.contains).toSeq
        val alloc = fresh.map { n =>
          if (!physTaken(n)) n -> n
          else {
            // the logical name was used before (dropped or renamed
            // away): bind it to a FRESH physical column so the old
            // values can never resurrect
            var i = 1
            while (physTaken(s"${n}__p$i")) i += 1
            n -> s"${n}__p$i"
          }
        }.toMap
        val m2 = m ++ alloc
        if (mergeSchema && fresh.nonEmpty) writeColMap(fs, dir, m2)
        (toPhysicalInput(df0, m2), statsCols0.map(mapStatsKey(m2, _)))
    }

  /** A generation's tracked stats columns in FILE order (manifest
    * part columns are keyed to it); sorted-tracked fallback for
    * legacy generations without the sidecar.
    */
  private def statsColsInOrderOf(spark: SparkSession, dir: String): Seq[String] =
    readSidecar(spark, dir, StatsColsFile)
      .map(_.linesIterator.filter(_.nonEmpty).toSeq)
      .getOrElse(trackedCols(spark, dir).toSeq.sorted)

  def appendWithStats(
      df0in: DataFrame, path: String, statsCols0: Seq[String],
      commitName: Option[String] = None,
      mergeSchema: Boolean = false,
      autoCompactSmallFiles: Option[Int] = None): Boolean = {
    val s0 = df0in.sparkSession
    val f0 = new Path(path).getFileSystem(s0.sparkContext.hadoopConfiguration)
    val d0 = manifestDirOf(f0, path)
    val partCols0 = partitionColsIn(f0, d0)
    // idempotent-replay check FIRST: a replayed named commit must not
    // re-run the identity hook below (the watermark would advance and
    // burn a batch-sized id gap on every replay)
    if (commitName.exists(n => n.matches("[A-Za-z0-9][A-Za-z0-9._-]*") &&
        f0.exists(new Path(d0, s"$n.parquet")))) return false
    // GENERATED COLUMNS: a batch omitting a generated column gets it
    // computed here, on the LOGICAL batch, before any schema check
    // or column-mapping translation (expressions are stored logical
    // — see [[GeneratedFile]]). Columns are then re-ordered to the
    // stored schema so the strict shape check still compares equal.
    // A batch that SUPPLIES the column is left alone — the paired
    // _gen_ CHECK constraint verifies it at the staged choke point.
    // values computed (or supplied and checked) under THIS session's
    // timezone: a drift from the recorded one must poison the record
    // so temporal read-side derivation turns off instead of pruning
    // against mixed-epoch stored values — but only once the batch is
    // actually GOING IN (after validation/staging), so a failed
    // append never disables derivation for a table it didn't touch
    val poisonTzOnCommit = generatedIn(f0, d0).nonEmpty
    val dfGen = {
      val missing = generatedIn(f0, d0)
        .filterNot { case (n, _) => df0in.columns.contains(n) }
      if (missing.isEmpty) df0in
      else missing.toSeq.sortBy(_._1).foldLeft(df0in) {
        case (acc, (n, e)) => acc.withColumn(n, expr(e))
      }
    }
    // IDENTITY COLUMNS: the batch must omit them; the engine assigns
    // fresh ids and advances the watermark sidecar-first (see
    // [[IdentityFile]]). Both hooks may append columns out of stored
    // order — one reorder restores the strict shape check's frame.
    val (dfIds, idPinned) = assignIdentity(s0, d0, dfGen)
    val df0 =
      if (dfIds eq df0in) df0in
      else {
        val storedNames = tableSchemaIn(s0, path, d0).fieldNames
        val ordered = storedNames.filter(dfIds.columns.contains) ++
          dfIds.columns.filterNot(storedNames.contains)
        dfIds.select(ordered.map(col): _*)
      }
    try {
    // Column mapping: the batch and statsCols arrive in LOGICAL
    // names; [[translateBatchForAppend]] turns them physical (fresh
    // physical allocation for mergeSchema-new columns included).
    val (df, statsCols) =
      translateBatchForAppend(path, f0, d0, df0, statsCols0, mergeSchema)
    // PARTITIONED tables take the partition-routing path. The
    // generated/identity hooks above already ran (they are
    // layout-independent — a generated PARTITION column computes
    // before routing, exactly Delta's generated-partition shape), and
    // the batch is already physical-named.
    if (partCols0.nonEmpty)
      return appendPartitioned(df, path, statsCols, commitName,
        mergeSchema, autoCompactSmallFiles, f0, d0, partCols0,
        poisonTzOnCommit)
    require(statsCols.nonEmpty, "at least one stats column")
    commitName.foreach(n => require(
      n.matches("[A-Za-z0-9][A-Za-z0-9._-]*") && !n.startsWith("part-"),
      s"commitName '$n' must start with an alphanumeric and use only " +
        "[A-Za-z0-9._-] (a '_'/'.' prefix would HIDE the marker from the " +
        "manifest reader — a committed-then-vacuumed batch; 'part-' is " +
        "reserved for plain manifest parts)"))
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    require(fs.exists(new Path(dir, SchemaFile)),
      s"$path is not a stats table with a schema sidecar; use writeWithStats first")
    val marker = commitName.map(n => new Path(dir, s"$n.parquet"))
    if (marker.exists(fs.exists)) return false
    // appends write manifest rows without reading the manifest, so
    // the protocol gate (see readManifestIn) must run explicitly —
    // appending feature-ignorant rows to a newer writer's manifest
    // would corrupt whatever the feature encodes
    val unknownFeats = unknownFeatures(manifestFeatures(fs, dir))
    require(unknownFeats.isEmpty,
      s"manifest at $dir requires table feature(s) " +
        s"[${unknownFeats.toSeq.sorted.mkString(", ")}] this build does not " +
        "implement — refusing to append; upgrade the library")
    val tracked = trackedCols(spark, dir)
    val stored = tableSchemaIn(spark, path, dir)
    val storedByName = stored.map(f => f.name -> f.dataType).toMap
    val batchTypes = df.schema.map(f => (f.name, f.dataType))
    val newFields = df.schema.filterNot(f => storedByName.contains(f.name))

    val schema: StructType =
      if (!mergeSchema) {
        require(statsCols.toSet == tracked,
          s"statsCols [${statsCols.sorted.mkString(",")}] must equal the table's " +
            s"tracked columns [${tracked.toSeq.sorted.mkString(",")}] — a mixed-schema " +
            "manifest silently drops files from pruned reads")
        require(batchTypes == stored.map(f => (f.name, f.dataType)),
          s"append schema ${df.schema.simpleString} must match stored " +
            s"${stored.simpleString}; pass mergeSchema = true to add columns")
        stored
      } else {
        // shared columns must keep their types — evolution adds (or
        // omits: a missing stored column simply isn't in this batch's
        // files, nulls at read time), it never retypes
        stored.foreach { f =>
          df.schema.find(_.name == f.name).foreach(b =>
            require(b.dataType == f.dataType,
              s"column ${f.name}: batch type ${b.dataType.simpleString} must match " +
                s"stored ${f.dataType.simpleString} — evolution adds columns, never retypes"))
        }
        if (newFields.isEmpty) {
          require(statsCols.toSet == tracked,
            s"statsCols [${statsCols.sorted.mkString(",")}] must equal the table's " +
              s"tracked columns [${tracked.toSeq.sorted.mkString(",")}] unless the " +
              "batch carries new columns to track")
          stored
        } else {
          require(currentGen(fs, new Path(s"$path/$StatsDir")).isDefined,
            s"$path is a legacy flat-manifest table — run compactTable once to " +
              "migrate it to generations before evolving its schema")
          require(tracked.subsetOf(statsCols.toSet),
            s"statsCols [${statsCols.sorted.mkString(",")}] must contain the tracked " +
              s"columns [${tracked.toSeq.sorted.mkString(",")}] — evolution extends " +
              "the tracked set, never shrinks it")
          val newNames = newFields.map(_.name).toSet
          val extraTracked = statsCols.toSet -- tracked
          // a nested stats path (`meta.b`) counts as new when its
          // HEAD column is one of the batch's new columns
          extraTracked.foreach(c => require(newNames(c.takeWhile(_ != '.')),
            s"newly tracked column $c must be one of the batch's NEW columns " +
              s"[${newNames.toSeq.sorted.mkString(",")}] — tracking an existing " +
              "column needs a stats rewrite (compactTable), not an append"))
          // added columns are NULLABLE by construction — files written
          // before the evolution have no values for them, and a
          // required (non-null) missing column fails the parquet read
          val widened = StructType(stored.fields ++ newFields.map(_.copy(nullable = true)))
          // SIDECARS FIRST: a crash after this point leaves a widened
          // table whose old files read as nulls for the new columns —
          // consistent and correct (see class doc)
          val feats = manifestFeatures(fs, dir)
          val widenedManifest = widenedManifestSchema(spark, dir, statsCols,
            feats.contains("nulls"), newFields)
          writeSidecars(spark, dir, widened, statsCols, feats,
            manifestSchema = Some(widenedManifest))
          widened
        }
      }

    val staging = new Path(path, s".append-${java.util.UUID.randomUUID}")
    df.write.parquet(staging.toString)
    // validated under the TABLE schema (already widened if this batch
    // evolves it): a batch omitting a constrained column reads as
    // nulls — NULL passes CHECK, SQL semantics
    enforceConstraintsOnStaged(spark, fs, dir, staging, schema, "append")
    if (poisonTzOnCommit) poisonGeneratedTzOnDrift(spark, fs, dir)
    val moved = moveIn(fs, staging, new Path(path))
    val batchStats =
      if (moved.nonEmpty) {
        // match the table's manifest generation: appending null-count
        // or bloom columns to a legacy manifest (or vice versa) is
        // the mixed-schema mis-pruning the statsCols check forbids.
        // Legacy tables are upgraded wholesale by compactTable.
        val feats = manifestFeatures(fs, dir)
        statsFor(statusScan(spark, path, schema, statusesFor(fs, moved)),
          statsCols, withNulls = feats.contains("nulls"), bloom = bloomFeature(feats))
      }
      else readManifestIn(spark, dir).limit(0) // zero-row marker
    marker match {
      case None if moved.isEmpty => ()
      case None =>
        batchStats.write.mode("append").parquet(dir)
      case Some(dest) =>
        writeManifestFile(spark, fs, path, batchStats, dest)
    }
    // OPTIMISTIC RE-REGISTRATION: a maintenance op may have committed
    // a new generation while this append was in flight; its publisher
    // rides forward every manifest file it can SEE, but this batch's
    // rows may have landed after its final listing. Re-resolve the
    // current generation: if it moved, verify the batch is claimed
    // there and re-register if not. Named commits re-register under
    // their marker NAME (a collision with the publisher's own repair
    // collapses to one file — exactly-once); unnamed batches
    // re-register after a data-file claim check and are at-least-once
    // in the millisecond overlap window — the documented concurrency
    // contract (pass commitName for exactly-once under concurrency).
    if (moved.nonEmpty) {
      var registeredIn = dir
      var cur = manifestDirOf(fs, path)
      var hops = 0
      while (cur != registeredIn && hops < ConcurrentRetries) {
        hops += 1
        // a mergeSchema evolution's widened sidecars were written into
        // the OLD generation; a racing publisher that built from
        // pre-evolution sidecars must not silently narrow the table.
        // MERGE with cur's view rather than installing our own
        // stored++newFields — a CONCURRENT evolution's columns in cur
        // would otherwise be clobbered (their data silently stops
        // projecting).
        if (mergeSchema && newFields.nonEmpty) {
          val curSchema = tableSchemaIn(spark, path, cur)
          val missing = newFields
            .filterNot(f => curSchema.fieldNames.contains(f.name))
          if (missing.nonEmpty) {
            val mergedSchema = StructType(
              curSchema.fields ++ missing.map(_.copy(nullable = true)))
            val curTracked = statsColsInOrderOf(spark, cur)
            val mergedTracked =
              curTracked ++ statsCols.filterNot(curTracked.contains)
            writeSidecars(spark, cur, mergedSchema, mergedTracked,
              manifestFeatures(fs, cur),
              manifestSchema = Some(widenedManifestSchema(spark, cur,
                statsCols, manifestFeatures(fs, cur).contains("nulls"),
                missing.toSeq)))
          }
        }
        val claimed = commitName match {
          case Some(n) => fs.exists(new Path(cur, s"$n.parquet"))
          case None =>
            // compare by (unique) file NAME — the manifest records
            // `_metadata.file_path` URIs, moveIn records plain paths
            readManifestIn(spark, cur)
              .filter(element_at(split(col("file"), "/"), -1) ===
                new Path(moved.head).getName)
              .limit(1).count() > 0
        }
        if (!claimed) commitName match {
          case Some(n) =>
            // the publisher's reconcile may land the same marker name
            // concurrently — its exclusive rename makes one winner
            try writeManifestFile(spark, fs, path, batchStats,
              new Path(cur, s"$n.parquet"))
            catch { case _: IllegalArgumentException => () }
          case None =>
            batchStats.write.mode("append").parquet(cur)
        }
        registeredIn = cur
        cur = manifestDirOf(fs, path)
      }
    }
    // opt-in ingest-cadence maintenance: see [[autoCompact]]
    autoCompactSmallFiles.foreach(n =>
      autoCompact(spark, path, minSmallFiles = n))
    true
    } finally idPinned.foreach(_.unpersist())
  }

  /** The manifest schema after tracking `statsCols` over a table that
    * gained `newFields`: existing manifest columns keep their
    * positions, new stat columns append. Derived from the persisted
    * manifest schema when present (no footer reads), else from a
    * merged-footer read of the manifest parts.
    */
  private def widenedManifestSchema(spark: SparkSession, dir: String,
      statsCols: Seq[String], withNulls: Boolean,
      newFields: Seq[StructField]): StructType = {
    val existing = readSidecar(spark, dir, ManifestSchemaFile)
      .map(j => DataType.fromJson(j).asInstanceOf[StructType])
      .getOrElse(spark.read.option("mergeSchema", "true").parquet(dir).schema)
    val typesByName = newFields.map(f => f.name -> f.dataType).toMap
    // a stats key may be a NESTED path rooted at a new struct column
    // (`meta.b`) — resolve its leaf type through the struct
    def typeOfPath(c: String): Option[DataType] = {
      def walk(dt: DataType, rest: List[String]): Option[DataType] = rest match {
        case Nil => Some(dt)
        case head :: tail => dt match {
          case st: StructType =>
            st.fields.find(_.name == head).flatMap(f => walk(f.dataType, tail))
          case _ => None
        }
      }
      val parts = c.split("\\.").toList
      typesByName.get(parts.head).flatMap(walk(_, parts.tail))
    }
    val have = existing.fieldNames.toSet
    val added = statsCols.flatMap(c => typeOfPath(c).toSeq.flatMap { dt =>
      Seq(StructField(s"min_$c", dt), StructField(s"max_$c", dt)) ++
        (if (withNulls) Seq(StructField(s"nulls_$c", org.apache.spark.sql.types.LongType))
        else Nil)
    }).filterNot(f => have(f.name))
    StructType(existing.fields ++ added)
  }

  /** [[appendWithStats]] for a PARTITION-CONVERTED table — the batch
    * is staged `partitionBy` the table's partition columns, each
    * staged file moved into (creating as needed) its `col=value`
    * directory under the table root, and the manifest gains one row
    * per file with the partition columns' min = max = the directory
    * value — exactly the shape CONVERT wrote (see [[convertToStats]]),
    * so pruned reads treat appended files identically to converted
    * ones. Delta's CONVERT output is mutable; this closes the first
    * mutation a converting user hits. SCHEMA EVOLUTION works too
    * (r14, `mergeSchema = true`): new DATA columns append with the
    * flat path's exact contract (sidecars-first widening, nullable
    * by construction, shared columns never retype, newly-tracked
    * columns must be new) — partition columns are the one hard
    * frame: every batch must carry ALL of them (their values route
    * rows to directories) and a batch can never ADD a partition
    * column. Named-commit idempotency, CHECK constraints and opt-in
    * auto-compaction work exactly as on flat tables. The flat path's
    * optimistic re-registration loop applies unchanged below —
    * partitioned tables now take DML/OPTIMIZE/RESTORE generations,
    * so a racing publisher can strand a batch exactly as on flat
    * tables.
    */
  private def appendPartitioned(df0: DataFrame, path: String,
      statsCols0: Seq[String], commitName: Option[String],
      mergeSchema: Boolean, autoCompactSmallFiles: Option[Int],
      fs: org.apache.hadoop.fs.FileSystem, dir: String,
      partCols: Seq[String], poisonTzOnCommit: Boolean = false): Boolean = {
    val spark = df0.sparkSession
    if (commitName.exists(n => n.matches("[A-Za-z0-9][A-Za-z0-9._-]*") &&
        fs.exists(new Path(dir, s"$n.parquet")))) return false
    commitName.foreach(n => require(
      n.matches("[A-Za-z0-9][A-Za-z0-9._-]*") && !n.startsWith("part-"),
      s"commitName '$n' must start with an alphanumeric and use only " +
        "[A-Za-z0-9._-] (a '_'/'.' prefix would HIDE the marker; 'part-' " +
        "is reserved for plain manifest parts)"))
    val unknownFeats = unknownFeatures(manifestFeatures(fs, dir))
    require(unknownFeats.isEmpty,
      s"manifest at $dir requires table feature(s) " +
        s"[${unknownFeats.toSeq.sorted.mkString(", ")}] this build does not " +
        "implement — refusing to append; upgrade the library")
    val stored = tableSchemaIn(spark, path, dir)
    val tracked = trackedCols(spark, dir)
    partCols.foreach(c => require(df0.columns.contains(c),
      s"append batch must carry partition column $c — its values route " +
        "each row to its directory; partition columns can never be omitted"))
    val storedByName = stored.map(f => f.name -> f.dataType).toMap
    val newFields = df0.schema.filterNot(f => storedByName.contains(f.name))
    // callers may pass the table's full tracked set (the
    // tableStatsCols convention) — partition columns are tracked
    // implicitly, so strip them rather than refusing the synonym
    val statsData = statsCols0.filterNot(partCols.contains)
    val schema: StructType =
      if (!mergeSchema) {
        require(df0.schema.map(f => (f.name, f.dataType)).toSet ==
            stored.map(f => (f.name, f.dataType)).toSet,
          s"append schema ${df0.schema.simpleString} must carry exactly the " +
            s"stored columns ${stored.simpleString} — partition columns " +
            "included (their values route each row to its directory); pass " +
            "mergeSchema = true to add or omit data columns")
        require(statsData.toSet == tracked -- partCols,
          s"statsCols [${statsData.sorted.mkString(",")}] must equal the " +
            s"table's tracked DATA columns [${(tracked -- partCols).toSeq.sorted
              .mkString(",")}] — partition columns are tracked implicitly " +
            "(min=max=directory value)")
        stored
      } else {
        // the flat path's evolution contract, partition-framed:
        // shared columns keep their types, new DATA columns append
        // nullable, a missing stored column simply isn't in this
        // batch's files (nulls at read time)
        stored.foreach { f =>
          df0.schema.find(_.name == f.name).foreach(b =>
            require(b.dataType == f.dataType,
              s"column ${f.name}: batch type ${b.dataType.simpleString} must " +
                s"match stored ${f.dataType.simpleString} — evolution adds " +
                "columns, never retypes"))
        }
        if (newFields.isEmpty) {
          require(statsData.toSet == tracked -- partCols,
            s"statsCols [${statsData.sorted.mkString(",")}] must equal the " +
              s"table's tracked DATA columns [${(tracked -- partCols).toSeq
                .sorted.mkString(",")}] unless the batch carries new columns")
          stored
        } else {
          require((tracked -- partCols).subsetOf(statsData.toSet),
            s"statsCols [${statsData.sorted.mkString(",")}] must contain the " +
              s"tracked DATA columns [${(tracked -- partCols).toSeq.sorted
                .mkString(",")}] — evolution extends the tracked set, never " +
              "shrinks it")
          val newNames = newFields.map(_.name).toSet
          val extraTracked = statsData.toSet -- (tracked -- partCols)
          extraTracked.foreach(c => require(newNames(c),
            s"newly tracked column $c must be one of the batch's NEW columns " +
              s"[${newNames.toSeq.sorted.mkString(",")}] — tracking an " +
              "existing column needs a stats rewrite (compactTable), not an " +
              "append"))
          val widened = StructType(
            stored.fields ++ newFields.map(_.copy(nullable = true)))
          // SIDECARS FIRST, exactly the flat path's crash order
          val feats0 = manifestFeatures(fs, dir)
          val widenedManifest = widenedManifestSchema(spark, dir,
            statsData, feats0.contains("nulls"), newFields.toSeq)
          writeSidecars(spark, dir, widened,
            statsData ++ partCols, feats0,
            manifestSchema = Some(widenedManifest))
          widened
        }
      }
    // stage exactly the batch's columns, stored-schema order (a
    // mergeSchema batch may omit stored data columns — those simply
    // are not in this batch's files)
    val df = df0.select(
      schema.fieldNames.filter(df0.columns.contains).map(col).toSeq: _*)
    val staging = new Path(path, s".append-${java.util.UUID.randomUUID}")
    df.write.partitionBy(partCols: _*).parquet(staging.toString)
    enforceConstraintsOnStaged(spark, fs, dir, staging, schema, "append")
    if (poisonTzOnCommit) poisonGeneratedTzOnDrift(spark, fs, dir)
    val moved = moveInPartitioned(fs, staging, new Path(path))
    val feats = manifestFeatures(fs, dir)
    val batchStats =
      if (moved.nonEmpty)
        statsFor(partAwareStatusScanCols(spark, path, partCols, schema,
            statusesFor(fs, moved)),
          statsData ++ partCols, withNulls = feats.contains("nulls"),
          bloom = bloomFeature(feats))
      else readManifestIn(spark, dir).limit(0) // zero-row marker
    commitName.map(n => new Path(dir, s"$n.parquet")) match {
      case None if moved.isEmpty => ()
      case None => batchStats.write.mode("append").parquet(dir)
      case Some(dest) => writeManifestFile(spark, fs, path, batchStats, dest)
    }
    // OPTIMISTIC RE-REGISTRATION, same as the flat path: a racing
    // compaction/DML/restore may have committed a new generation
    // while this append was in flight and missed this batch's rows —
    // re-resolve the current generation and re-register until the
    // batch is claimed there (named commits exactly-once under the
    // marker's exclusive create; unnamed at-least-once in the
    // overlap window — the documented concurrency contract).
    if (moved.nonEmpty) {
      var registeredIn = dir
      var cur = manifestDirOf(fs, path)
      var hops = 0
      while (cur != registeredIn && hops < ConcurrentRetries) {
        hops += 1
        // a mergeSchema evolution's widened sidecars were written into
        // the OLD generation; a racing publisher that built from
        // pre-evolution sidecars must not silently narrow the table —
        // MERGED with cur's view, same reasoning as the flat path
        if (mergeSchema && newFields.nonEmpty) {
          val curSchema = tableSchemaIn(spark, path, cur)
          val missing = newFields
            .filterNot(f => curSchema.fieldNames.contains(f.name))
          if (missing.nonEmpty) {
            val mergedSchema = StructType(
              curSchema.fields ++ missing.map(_.copy(nullable = true)))
            val curTracked = statsColsInOrderOf(spark, cur)
            val mergedTracked = curTracked ++
              (statsData ++ partCols).filterNot(curTracked.contains)
            writeSidecars(spark, cur, mergedSchema, mergedTracked,
              manifestFeatures(fs, cur),
              manifestSchema = Some(widenedManifestSchema(spark, cur,
                statsData, manifestFeatures(fs, cur).contains("nulls"),
                missing.toSeq)))
          }
        }
        val claimed = commitName match {
          case Some(n) => fs.exists(new Path(cur, s"$n.parquet"))
          case None =>
            readManifestIn(spark, cur)
              .filter(element_at(split(col("file"), "/"), -1) ===
                new Path(moved.head).getName)
              .limit(1).count() > 0
        }
        if (!claimed) commitName match {
          case Some(n) =>
            try writeManifestFile(spark, fs, path, batchStats,
              new Path(cur, s"$n.parquet"))
            catch { case _: IllegalArgumentException => () }
          case None => batchStats.write.mode("append").parquet(cur)
        }
        registeredIn = cur
        cur = manifestDirOf(fs, path)
      }
    }
    // opt-in ingest-cadence maintenance, same as the flat path (the
    // partitioned compact collapses the tail within partitions)
    autoCompactSmallFiles.foreach(n =>
      autoCompact(spark, path, minSmallFiles = n))
    true
  }

  /** [[moveIn]] for a partition-staged batch: walks the staging dir's
    * `col=value` tree, re-creating each partition directory under the
    * table root and renaming the (job-UUID-unique) data files into
    * it. Returns the destination paths.
    */
  private def moveInPartitioned(fs: org.apache.hadoop.fs.FileSystem,
      staging: Path, table: Path): Seq[String] = {
    def walk(d: Path, rel: Seq[String]): Seq[String] =
      fs.listStatus(d).toSeq.flatMap { f =>
        val n = f.getPath.getName
        if (f.isDirectory && !n.startsWith(".")) walk(f.getPath, rel :+ n)
        else if (f.isFile && !n.startsWith("_") && !n.startsWith(".")) {
          val destDir = rel.foldLeft(table)((p, seg) => new Path(p, seg))
          fs.mkdirs(destDir)
          val dest = new Path(destDir, n)
          require(fs.rename(f.getPath, dest),
            s"rename ${f.getPath} -> $dest failed")
          Seq(dest.toString)
        } else Nil
      }
    val moved = walk(staging, Nil)
    fs.delete(staging, true)
    moved
  }

  /** Move a staging dir's data files into the table root under their
    * (job-UUID-unique) names; deletes the staging dir, returns the
    * destination paths.
    */
  private def moveIn(fs: org.apache.hadoop.fs.FileSystem,
      staging: Path, table: Path): Seq[String] = {
    val moved = fs.listStatus(staging)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map { f =>
        val dest = new Path(table, f.getPath.getName)
        require(fs.rename(f.getPath, dest), s"rename ${f.getPath} -> $dest failed")
        dest.toString
      }.toSeq
    fs.delete(staging, true)
    moved
  }

  /** Write `rows` as ONE parquet file at exactly `dest` (staged,
    * then renamed into place) — the single-file manifest commit
    * primitive behind named appends and preserved markers.
    */
  private def writeManifestFile(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, table: String,
      rows: DataFrame, dest: Path): Unit = {
    val tmp = new Path(table, s".stats-${java.util.UUID.randomUUID}")
    rows.coalesce(1).write.parquet(tmp.toString)
    val part = fs.listStatus(tmp)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(part.length == 1, s"expected one stats part, got ${part.length}")
    require(fs.rename(part.head.getPath, dest),
      s"stats commit rename to $dest failed")
    fs.delete(tmp, true)
  }

  // -----------------------------------------------------------------
  // Maintenance: compaction + retention vacuum
  // -----------------------------------------------------------------

  /** OPTIMIZE-style bin-packing: rewrite the table's CURRENT file set
    * (as the manifest defines it) into ~ceil(bytes/targetFileBytes)
    * files, commit the NEXT manifest generation, then vacuum
    * retention-expired debris. Ingest-cadence appends leave a long
    * tail of small files; at scale the per-file costs (open, footer,
    * task schedule, manifest row) dominate a scan of many small
    * files — this is the maintenance pass that pays that debt down,
    * the role OPTIMIZE plays for Delta.
    *
    * The GENERATION COMMIT is the snapshot point: the complete
    * replacement manifest — parts, sidecars, preserved markers,
    * removal log — is built inside the next `v<N+1>` dir (invisible:
    * readers only trust generations carrying `_COMMIT`), then made
    * visible by ONE atomic file create. Readers see the
    * pre-compaction file set until that instant and the
    * post-compaction one after — never a mix, with no
    * delete-then-rename window and no repair path. A crash mid-build
    * leaves an uncommitted generation dir readers never see
    * (vacuumed later). Named commit markers (see [[appendWithStats]])
    * SURVIVE compaction: their rows are folded into the rewritten
    * files, but each marker name is re-created as a zero-row manifest
    * file in the new generation, so a streaming replay after
    * compaction still short-circuits instead of re-appending an
    * already-folded batch — EXCEPT markers older than
    * `markerRetentionMs` (default 7 days), which are dropped (the
    * Delta txn-retention analog: without expiry, manifest listings
    * and [[graft.streaming.StatsTableSource]] offsets grow one entry
    * per commit forever). The driver materializes the file list
    * being replaced ((path) rows — the same O(snapshot files) any
    * OPTIMIZE planner holds). Legacy FLAT manifests are migrated to
    * `v0` by this pass (their flat files enter the removal log like
    * any replaced file).
    *
    * VACUUM (`vacuum = true`, default) runs [[vacuumTable]] with
    * `retentionMs`: replaced data files, superseded generations and
    * crash debris are deleted only after the retention window — a
    * reader that planned against the previous generation keeps every
    * file it resolved (see class doc). Vacuum runs EVEN when the
    * table already meets the size target (a no-op compact is still
    * the documented reclamation path). `vacuum = false` keeps
    * everything on disk (manifest-invisible) for manual rollback.
    * Compaction remains a single-WRITER maintenance op (concurrent
    * appends would race the snapshot); concurrent READERS are safe at
    * any retention ≥ their runtime.
    *
    * Returns the number of files after compaction, or 0 if the table
    * already meets the target (no rewrite — vacuum still runs).
    */
  def compactTable(
      spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs): Int =
      withConcurrentRetry("compactTable") {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(retentionMs >= 0, "retentionMs must be >= 0")
    require(markerRetentionMs >= 0, "markerRetentionMs must be >= 0")
    val opStart = System.currentTimeMillis()
    val statsDir = new Path(s"$path/$StatsDir")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val partCols = partitionColsIn(fs, dir)
    val observed = listManifestNames(fs, dir)
    val stats = readManifestPinned(spark, dir, observed)
    require(stats.columns.contains("file_size"),
      "compactTable needs a size-carrying manifest (rewrite with writeWithStats)")
    val statsCols = trackedCols(spark, dir).toSeq.sorted
    val old = stats.select(col("file"), col("file_size")).collect()
    val totalBytes = old.map(_.getLong(1)).sum
    val target = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val dv = readDvIn(spark, dir)
    if (target >= old.length && dv.isEmpty) {
      // no rewrite, but vacuum is still the reclamation path. (With a
      // deletion vector present compaction ALWAYS rewrites — resolving
      // the vector into clean files is one of its two jobs, and the
      // read path's broadcast bound depends on it.)
      if (vacuum) vacuumTable(spark, path, retentionMs)
      return 0
    }
    val schema = tableSchemaIn(spark, path, dir)
    // rewrite the current snapshot: coalesce (no shuffle) into the
    // target file count, staged hidden, then moved in — invisible to
    // manifest readers until the generation commit below. DV-dead
    // rows are filtered here — compaction MATERIALIZES the deletion
    // vector (the new generation carries none). A PARTITION-CONVERTED
    // table compacts WITHIN partitions: the snapshot hash-shuffles on
    // the partition columns (each partition value lands whole in one
    // task, so one task writes one file per partition it holds) and
    // stages `partitionBy` — the small-file tail collapses to one
    // file per partition value, Delta's per-partition bin-pack
    // reduced to its dominant case.
    val staging = new Path(path, s".compact-${java.util.UUID.randomUUID}")
    // legacy manifests may lack mod_time — fall back to a path-list
    // read there; status-carrying ones plan through ManifestFileIndex
    val snapshot =
      if (stats.columns.contains("mod_time"))
        applyDv(partAwareStatusScan(spark, path, dir, schema,
          statusesOf(stats)), dv)
      else spark.read.schema(schema).parquet(old.map(_.getString(0)): _*)
    if (partCols.isEmpty)
      snapshot.coalesce(target).write.parquet(staging.toString)
    else snapshot.repartition(target, partCols.map(col): _*)
      .write.partitionBy(partCols: _*).parquet(staging.toString)
    val moved =
      if (partCols.isEmpty) moveIn(fs, staging, new Path(path))
      else moveInPartitioned(fs, staging, new Path(path))
    // the rewrite always emits null counts (the legacy→v2 upgrade
    // moment) and preserves the table's bloom configuration
    val bloomCfg = bloomFeature(manifestFeatures(fs, dir))
    val newStats = statsFor(
      partAwareStatusScan(spark, path, dir, schema, statusesFor(fs, moved)),
      statsCols, withNulls = true, bloom = bloomCfg)
    val movedNames = moved.map(p => new Path(p).getName).toSet
    val replacedData = old.map(r => rootRelativeOrName(fs, path, r.getString(0)))
      .filterNot(rel => movedNames(new Path(rel).getName)).toSeq
    // compaction changes nothing logically, so it records NO change
    // data — but the feed feature flag must survive the rebuilt
    // feature set or the next DML would silently stop recording
    publishGeneration(spark, fs, path, dir, newStats, schema, statsCols,
      Set("nulls") ++ bloomCfg.map(bloomFeatureLine).toSet ++
        manifestFeatures(fs, dir).filter(_ == CdfFeature),
      manifestSchema = newStats.schema, removedData = replacedData,
      markerRetentionMs = markerRetentionMs, opStartMs = opStart,
      op = "OPTIMIZE", observedParts = Some(observed))
    if (vacuum) vacuumTable(spark, path, retentionMs)
    moved.size
  }

  /** Predicate-SCOPED compaction — Delta's `OPTIMIZE tbl WHERE
    * <partition predicate>`: bin-pack ONLY the files the predicate
    * touches, carry every other file verbatim. THE maintenance shape
    * at 100 TB: an hourly job compacts today's hot partition's
    * small-file tail in O(partition), while full [[compactTable]]
    * would rewrite the table. Selection is FILE-granular through the
    * same prune+touch probe row-level DML uses (for a partition
    * predicate, min=max stats make it exactly the partition's
    * files; a non-partition predicate simply compacts every file
    * holding a matching row — whole files rewrite, so the operation
    * is content-invisible either way). Deletion-vector entries on
    * the touched files MATERIALIZE (their rewrite scans DV-filtered
    * rows); entries on untouched files carry forward. Same
    * optimistic-commit, marker-verbatim, removal-log and retention
    * contract as every [[rewriteFiles]] op. Returns the number of
    * files compacted away (0 = nothing worth rewriting).
    */
  def compactWhere(spark: SparkSession, path: String, predicate: Column,
      targetFileBytes: Long = 128L * 1024 * 1024,
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs): Int =
      withConcurrentRetry("compactWhere") {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val pred = mapPred(spark, path, predicate)
    val (manifest, schema, _, touched, touchedScan, observed) =
      pruneAndTouch(spark, path, dir, pred, "compactWhere")
    val files = touched.map(_._1)
    if (files.isEmpty) {
      if (vacuum) vacuumTable(spark, path, retentionMs)
      return 0
    }
    val filesDf = spark.createDataset(files)(
      org.apache.spark.sql.Encoders.STRING).toDF("__f")
    val bytes = manifest.join(broadcast(filesDf),
        col("file") === col("__f"), "left_semi")
      .agg(sum(col("file_size"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    val target = math.max(1L,
      (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val dvTouches = readDvIn(spark, dir).exists { d =>
      !d.join(broadcast(filesDf), col("file") === col("__f"), "left_semi")
        .isEmpty
    }
    if (target >= files.size && !dvTouches) {
      // already at or under the bin target and no vector to resolve
      if (vacuum) vacuumTable(spark, path, retentionMs)
      return 0
    }
    val partCols = partitionColsIn(fs, dir)
    // whole-file rewrite: the touched scan is DV-filtered but NOT
    // predicate-filtered — boundary files' non-matching rows ride
    // into the compacted output (content-invisible by construction)
    val replacement =
      if (partCols.isEmpty) touchedScan.coalesce(target)
      else touchedScan.repartition(target, partCols.map(col): _*)
    rewriteFiles(spark, fs, path, dir, manifest, schema, files,
      Some(replacement), vacuum, retentionMs, markerRetentionMs, opStart,
      op = "OPTIMIZE WHERE", observedParts = Some(observed))
    files.size
  }

  /** Build the COMPLETE next manifest generation in a hidden dir and
    * publish it with ONE atomic `_COMMIT` create — the shared commit
    * path behind [[compactTable]], [[deleteWhere]], [[updateWhere]]
    * and [[mergeUpsert]]. Writes `manifestRows` as the generation's
    * parts, carries the table sidecars, re-creates the current
    * manifest's named commit markers as zero-row files (their data
    * rows are folded into `manifestRows`) — but only markers younger
    * than `markerRetentionMs` (the Delta txn-retention analog,
    * deliberately SEPARATE from the data retention — a
    * reader-exclusive retention-0 vacuum must not void replay
    * protection): a marker's only job after its rows are folded is
    * replay short-circuiting, and writers/consumers more than the
    * window behind are already outside the table's replay
    * guarantees; expiring them here keeps manifest listings and
    * streaming offsets bounded by the window's commit count instead
    * of growing forever. Records `removedData` (table-root-relative
    * names) plus the superseded generation — or, for a legacy flat
    * manifest being migrated, its top-level files — in the removal
    * log that [[vacuumTable]]'s retention window runs against. (The
    * hidden build keeps a concurrent LEGACY reader's recursive
    * parquet read of the flat stats dir clean during a one-time
    * migration; versioned readers never look at uncommitted dirs at
    * all.) Returns the committed version number.
    */
  /** The OPTIMISTIC generation commit: stamp a writer token into the
    * build dir, rename it to the target version, verify the token
    * survived, then create `_COMMIT` exclusively. A rename onto an
    * EXISTING directory does not fail — it NESTS the build inside
    * the winner's dir — so the token check is what detects the lost
    * race; the stray nested build is removed (dot-prefixed, so even
    * a crash between detection and cleanup leaves it invisible to
    * manifest reads) and [[ConcurrentWriteException]] signals the
    * caller's retry loop. Exactly one writer's token can sit at
    * `gen/<token>`, so exactly one writer ever creates the version's
    * `_COMMIT` — the single-committer invariant every reader trusts.
    */
  private def commitBuildAs(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, build: Path, gen: Path): Unit = {
    val token = s"_writer-${java.util.UUID.randomUUID}"
    fs.create(new Path(build, token), false).close()
    val renamed = fs.rename(build, gen)
    if (!renamed || !fs.exists(new Path(gen, token))) {
      if (renamed) fs.delete(new Path(gen, build.getName), true)
      else fs.delete(build, true)
      // An UNCOMMITTED occupant is either a live writer inside its
      // millisecond-wide rename→_COMMIT window, or debris (a crash
      // inside exactly that window, or foreign junk). Poll through
      // the live window: a `_COMMIT` appearing means a real winner
      // (retry against its state); an occupant that never commits is
      // reclaimed so strict version targeting cannot wedge on a slot
      // a crashed writer claimed but never committed. The re-check
      // immediately before the delete narrows the TOCTOU against a
      // writer committing at the last instant; the writer side's
      // post-commit token verification below closes it.
      if (fs.exists(gen) && !isCommittedGen(fs, gen)) {
        val deadline = System.currentTimeMillis() + OccupantGraceMs
        while (System.currentTimeMillis() < deadline &&
            fs.exists(gen) && !isCommittedGen(fs, gen))
          Thread.sleep(50)
        // Reclaim by RENAME-ASIDE, not delete: the occupant's writer
        // can stamp `_COMMIT` in the instant between our last check
        // and the reclaim, and a delete there would destroy a
        // just-committed generation a reader may already have
        // resolved. The rename is atomic, so we can re-check the
        // marker AFTER winning the move: committed after all → put
        // it back via [[restoreCommitted]] (which survives a third
        // writer stealing the slot in the rename-back instant); still
        // uncommitted → crash debris, delete the dot-prefixed
        // quarantine (invisible to readers even if we crash before
        // this line).
        if (fs.exists(gen) && !isCommittedGen(fs, gen)) {
          val aside = new Path(gen.getParent,
            s".reclaim-${gen.getName}-${java.util.UUID.randomUUID}")
          if (fs.rename(gen, aside)) {
            if (isCommittedGen(fs, aside)) restoreCommitted(fs, gen, aside)
            else fs.delete(aside, true)
          }
        }
      }
      throw new ConcurrentWriteException(
        s"generation ${gen.getName} was created by a concurrent writer")
    }
    commitGen(spark, gen)
    // Reclaim-race guard: a contender that deemed this dir debris may
    // have deleted it between our token check and the `_COMMIT`
    // create (which would silently re-create the dir with ONLY the
    // commit file — a corrupt committed generation). The token is
    // the witness: if it vanished, the generation was reclaimed —
    // undo the orphan commit and report the lost race so the retry
    // loop re-runs the whole op.
    if (!fs.exists(new Path(gen, token))) {
      // Undo EXACTLY the orphan marker, not the whole dir: by now a
      // contender may have reclaimed the slot and renamed its OWN
      // build in, so a wholesale delete could destroy another
      // writer's in-flight generation. Removing the marker restores
      // whatever occupies the slot to its uncommitted state; if the
      // dir is left empty (the pure delete-then-recreate corruption)
      // remove the husk too.
      fs.delete(new Path(gen, CommitFile), false)
      if (fs.exists(gen) && fs.listStatus(gen).isEmpty) fs.delete(gen, true)
      throw new ConcurrentWriteException(
        s"generation ${gen.getName} was reclaimed mid-commit")
    }
  }

  /** How long an uncommitted version-dir occupant is given to produce
    * its `_COMMIT` before contenders reclaim the slot as crash debris
    * (see [[commitBuildAs]] — live writers occupy a version number
    * for milliseconds; this is 100× that with margin).
    */
  private val OccupantGraceMs = 3000L

  /** Put a generation that turned out to be COMMITTED back into the
    * slot it was reclaimed out of. The hazard the plain rename-back
    * had: a rename onto an EXISTING directory does not fail, it
    * NESTS — a third writer renaming its own build into the freed
    * slot during the rename-back instant left the committed
    * generation dot-prefixed INSIDE the winner's dir, its writer
    * already returned success, its data silently absent. This
    * restore verifies placement after every rename and un-nests a
    * lost rename back to parent level; an uncommitted occupant is
    * waited out through its commit window; a slot re-held by a
    * COMMITTED competitor (or an occupant that never resolves) parks
    * the displaced generation at parent level under a VISIBLE
    * `_displaced-` name and logs an error with the recovery path —
    * loudly quarantined, never silently gone.
    */
  private[sources] def restoreCommitted(fs: org.apache.hadoop.fs.FileSystem,
      gen: Path, aside: Path): Unit = {
    var src = aside
    val deadline = System.currentTimeMillis() + OccupantGraceMs
    while (System.currentTimeMillis() < deadline) {
      if (!fs.exists(gen)) {
        if (fs.rename(src, gen)) {
          val nested = new Path(gen, src.getName)
          if (!fs.exists(nested)) return // clean restore — slot was free
          // a third writer won the slot inside the rename instant and
          // the restore NESTED into its dir — pull it straight back
          // out to parent level and re-assess the slot
          val out = new Path(gen.getParent,
            s".reclaim-${gen.getName}-${java.util.UUID.randomUUID}")
          src = if (fs.rename(nested, out)) out else nested
        }
      } else if (isCommittedGen(fs, gen)) {
        quarantineDisplaced(fs, gen, src)
        return
      } else Thread.sleep(50) // occupant mid-commit: wait its window out
    }
    quarantineDisplaced(fs, gen, src)
  }

  /** Park a committed-but-displaced generation at parent level under
    * a visible name and say so LOUDLY — the recovery surface for the
    * only reachable end-state of a lost [[restoreCommitted]] race.
    */
  private def quarantineDisplaced(fs: org.apache.hadoop.fs.FileSystem,
      gen: Path, src: Path): Unit = {
    val parked = new Path(gen.getParent,
      s"_displaced-${gen.getName}-${java.util.UUID.randomUUID}")
    val at = if (fs.rename(src, parked)) parked else src
    logError(s"generation slot ${gen.getName} was re-won by another " +
      s"writer while a COMMITTED generation was mid-reclaim; the " +
      s"displaced generation's files are preserved at $at (its writer " +
      "observed a successful commit, but the slot now holds a " +
      "competitor's commit — reconcile by replaying the displaced " +
      "operation or merging the parked files by hand)")
  }

  private def publishGeneration(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String, dir: String,
      manifestRows: DataFrame, schema: StructType, statsCols: Seq[String],
      features: Set[String], manifestSchema: StructType,
      removedData: Seq[String], markerRetentionMs: Long,
      opStartMs: Long, verbatimMarkers: Set[String] = Set.empty,
      changeData: Option[DataFrame] = None,
      op: String = "UNKNOWN",
      txn: Option[(String, Long)] = None,
      dv: Option[DataFrame] = None,
      clustered: Option[String] = None,
      observedParts: Option[Set[String]] = None,
      resetDeclarations: Boolean = false,
      partitionColsNew: Option[Seq[String]] = None): Long = {
    val statsDir = new Path(s"$path/$StatsDir")
    val curGen = currentGen(fs, statsDir)
    // STRICT version targeting: commit exactly (observed generation
    // + 1). Targeting last+1 instead would let a loser leapfrog a
    // winner it never saw — commit vN+2 built from vN while the
    // winner's vN+1 holds changes vN+2 would silently revert. With
    // observed+1, a racing winner makes the rename NEST and the
    // token check turns the lost race into a retry against the
    // winner's state. (Flat legacy manifests keep the last+1
    // fallback — they predate generations and concurrency.)
    val nextV = obsVersionOf(dir)
      .map(_ + 1)
      .getOrElse(genDirs(fs, statsDir).lastOption.map(_._1 + 1).getOrElse(0L))
    // marker age is measured from the op's ENTRY time, not from
    // whenever the heavy rewrite before this call finished — a marker
    // must not expire merely because the maintenance op that should
    // preserve it ran long
    val markerCutoff = opStartMs - markerRetentionMs
    val markers = fs.listStatus(new Path(dir))
      .filter(f => f.getPath.getName.endsWith(".parquet") &&
        !f.getPath.getName.startsWith("part-") &&
        f.getModificationTime >= markerCutoff)
      .map(_.getPath.getName).toSeq
    val build = new Path(statsDir, s".genbuild-${java.util.UUID.randomUUID}")
    manifestRows.write.parquet(build.toString)
    writeSidecars(spark, build.toString, schema, statsCols, features,
      manifestSchema = Some(manifestSchema))
    // change-data files land inside the build dir: the single _COMMIT
    // create below makes them exactly as atomic as the generation, and
    // the `_` prefix hides them from the generation's manifest read
    changeData.foreach(cd =>
      cd.write.parquet(new Path(build, ChangeDataDir).toString))
    // the deletion vector is generation state like change data: the
    // single _COMMIT create below makes it exactly as atomic as the
    // manifest rows, and the `_` prefix hides it from manifest reads
    dv.foreach(d =>
      d.write.parquet(new Path(build, DvDir).toString))
    writeOpFile(fs, build, op, opStartMs)
    writeTxnFile(fs, dir, build, txn)
    // CHECK constraints, the column mapping, generated-column
    // declarations and the partition-column list ride every
    // generation forward like the txn map (dropping the partition
    // sidecar would silently flip a partitioned table to flat reads
    // — null partition values — after its first DML generation).
    // An OVERWRITE generation (`resetDeclarations`) instead starts
    // its declarations from scratch — CREATE OR REPLACE semantics:
    // the replacing batch defines the table's shape, and the old
    // declarations live on in the REPLACED generations for time
    // travel / RESTORE, never in the new one.
    if (!resetDeclarations)
      Seq(ConstraintsFile, ColMapFile, GeneratedFile, IdentityFile,
          PartitionColsFile).foreach { n =>
        readSidecarIn(fs, dir, n).foreach { j =>
          val out = fs.create(new Path(build, n), true)
          try out.write(j.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
      }
    partitionColsNew.filter(_.nonEmpty).foreach { cols =>
      val out = fs.create(new Path(build, PartitionColsFile), true)
      try out.write(cols.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    // clustering state: the op either rewrote it (full/incremental
    // OPTIMIZE ZORDER pass the fresh content) or it rides forward
    // verbatim like the declarations above (an overwrite resets it —
    // the old layout says nothing about the new files)
    clustered.map(Some(_))
      .getOrElse(if (resetDeclarations) None
                 else readSidecarIn(fs, dir, ClusteredFile))
      .foreach { c =>
        val out = fs.create(new Path(build, ClusteredFile), true)
        try out.write(c.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
    // retained markers either survive VERBATIM (caller proved none of
    // their rows reference a rewritten file — their data rows stay in
    // the copied marker, excluded from `manifestRows`, so an
    // in-flight stream consumer replays the commit unchanged) or fold
    // to a zero-row re-creation (rows moved into `manifestRows`)
    val (keepVerbatim, folded) = markers.partition(n =>
      verbatimMarkers(n) || observedParts.exists(o => !o(n)))
    keepVerbatim.foreach { n =>
      org.apache.hadoop.fs.FileUtil.copy(fs, new Path(dir, n),
        fs, new Path(build, n), false,
        spark.sparkContext.hadoopConfiguration)
    }
    if (folded.nonEmpty) {
      val tmp = new Path(path, s".markers-${java.util.UUID.randomUUID}")
      manifestRows.limit(0).write.parquet(tmp.toString)
      val part = fs.listStatus(tmp)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      require(part.length == 1, s"expected one marker part, got ${part.length}")
      folded.foreach { n =>
        org.apache.hadoop.fs.FileUtil.copy(fs, part.head.getPath,
          fs, new Path(build, n), false,
          spark.sparkContext.hadoopConfiguration)
      }
      fs.delete(tmp, true)
    }
    // CONCURRENT APPENDS (pinned callers): manifest files that landed
    // after the caller pinned its carried-rows read are a concurrent
    // append — the op is serialized BEFORE it, so its file rides into
    // the new generation VERBATIM (rows + marker identity intact; its
    // data files live in the table root untouched by this op). Late
    // MARKERS were already diverted to keepVerbatim above; late
    // part-files are copied here.
    val lateParts: Set[String] = observedParts.fold(Set.empty[String]) { o =>
      fs.listStatus(new Path(dir))
        .map(_.getPath.getName)
        .filter(n => n.endsWith(".parquet") && n.startsWith("part-") && !o(n))
        .toSet
    }
    lateParts.foreach { n =>
      org.apache.hadoop.fs.FileUtil.copy(fs, new Path(dir, n),
        fs, new Path(build, n), false,
        spark.sparkContext.hadoopConfiguration)
    }
    val now = System.currentTimeMillis()
    val replacedManifest = curGen match {
      case Some((v, _)) => Seq(s"$StatsDir/v$v")
      case None => // legacy flat manifest: its top-level files
        fs.listStatus(statsDir)
          .filter(f => f.isFile)
          .map(f => s"$StatsDir/${f.getPath.getName}").toSeq
    }
    writeRemovalLog(fs, build, (removedData ++ replacedManifest).map(_ -> now))
    val gen = new Path(statsDir, s"v$nextV")
    commitBuildAs(spark, fs, build, gen)
    // post-commit reconciliation: an append that landed between the
    // late-parts listing above and the commit is copied into the NOW
    // CURRENT generation (appends to the current generation are legal
    // at any time, and this generation is current). Appenders racing
    // the same window independently re-register against the new
    // generation after a claim check, and NAMED commits collide on
    // the marker name, so the two repairs never double-deliver a
    // named batch (unnamed appends in this millisecond window are
    // at-least-once — the documented concurrency contract).
    observedParts.foreach { o =>
      val placed = keepVerbatim.toSet ++ folded ++ lateParts
      fs.listStatus(new Path(dir))
        .map(_.getPath.getName)
        .filter(n => n.endsWith(".parquet") && !o(n) && !placed(n))
        .foreach { n =>
          val dst = new Path(gen, n)
          if (!fs.exists(dst))
            org.apache.hadoop.fs.FileUtil.copy(fs, new Path(dir, n),
              fs, dst, false, spark.sparkContext.hadoopConfiguration)
        }
    }
    nextV
  }

  // -----------------------------------------------------------------
  // Row-level DML: DELETE / UPDATE / MERGE (copy-on-write)
  // -----------------------------------------------------------------

  /** (path, size, mtime) statuses of the manifest rows in `rows` —
    * the only driver-side materialization in the DML path (the
    * Delta-snapshot pattern: O(selected files) triples, never the
    * all-files list unless the op itself is unprunable).
    */
  private def statusesOf(rows: DataFrame): Seq[FileStatusWithMetadata] =
    rows.select(col("file"), col("file_size"), col("mod_time"))
      .collect().map { r =>
        FileStatusWithMetadata(new FileStatus(
          r.getLong(1), false, 1, 128L * 1024 * 1024, r.getLong(2),
          new Path(r.getString(0))))
      }.toSeq

  /** Statuses for files this op just WROTE (staged + moved in): one
    * driver-side stat per file — the same calls a path-list read's
    * InMemoryFileIndex would make, without also baking an O(files)
    * path list into the relation.
    */
  private def statusesFor(fs: org.apache.hadoop.fs.FileSystem,
      paths: Seq[String]): Seq[FileStatusWithMetadata] =
    paths.map(p => FileStatusWithMetadata(fs.getFileStatus(new Path(p))))

  /** Scan exactly `statuses` of `path`'s data files through a
    * [[ManifestFileIndex]]: planning serves the recorded statuses
    * straight to the parquet reader — no per-file path list in the
    * plan, no listing, no footer reads. Every DML-internal scan
    * (candidate probe, touched-row rewrite, CDF images, compaction
    * snapshot) goes through here, so an UNPRUNABLE op (whole-table
    * MERGE) plans one relation, not an O(files)-ary path literal —
    * the same rebuild the read path ([[readSkippingIn]]) got.
    */
  private def statusScan(spark: SparkSession, path: String,
      schema: StructType, statuses: Seq[FileStatusWithMetadata]): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.baseRelationToDataFrame(HadoopFsRelation(
      new ManifestFileIndex(new Path(path), statuses),
      partitionSchema = new StructType(),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(classic))
  }

  /** [[statusScan]] for paths that may be PARTITION-CONVERTED: the
    * partition columns live in directory names, not file bytes, so a
    * flat relation would read them as null and silently fail every
    * predicate touching them (dropped boundary rows → wrong counts /
    * min-max). Splits the sidecar schema into data columns (read from
    * bytes) and partition columns (served per PartitionDirectory by
    * the file index — zero bytes read), exactly like the read path.
    * Falls through to the flat [[statusScan]] when unpartitioned.
    */
  private def partAwareStatusScan(spark: SparkSession, path: String,
      dir: String, schema: StructType,
      statuses: Seq[FileStatusWithMetadata]): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    partAwareStatusScanCols(spark, path, partitionColsIn(fs, dir),
      schema, statuses)
  }

  /** [[partAwareStatusScan]] with the partition columns given
    * EXPLICITLY — for call sites where the sidecar is not written
    * yet (the v0 stats pass of a partitioned [[writeWithStats]]).
    */
  private def partAwareStatusScanCols(spark: SparkSession, path: String,
      partCols: Seq[String], schema: StructType,
      statuses: Seq[FileStatusWithMetadata]): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.baseRelationToDataFrame(
      partAwareRelation(spark, path, partCols, schema, statuses))
  }

  /** The HadoopFsRelation behind [[partAwareStatusScan]], exposed for
    * the STREAMING read path ([[graft.streaming.StatsTableSource]]),
    * which must wrap the SAME part-aware relation in an
    * `isStreaming` LogicalRelation: partition columns live only in
    * directory names, so a flat relation over a partitioned table's
    * files would serve them as silent NULLs to every consumer.
    */
  private[graft] def partAwareRelation(spark: SparkSession, path: String,
      partCols: Seq[String], schema0: StructType,
      statuses: Seq[FileStatusWithMetadata]): HadoopFsRelation = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // the scan schema is NULLABLE: a native partitioned write's
    // sidecar can carry the frame's nullable=false (flat sidecars
    // come from read-backs, always nullable), and a REQUIRED column
    // missing from an evolution-era file fails the vectorized reader
    // instead of reading null
    val schema = StructType(schema0.fields.map(_.copy(nullable = true)))
    if (partCols.isEmpty) HadoopFsRelation(
      new ManifestFileIndex(new Path(path), statuses),
      partitionSchema = new StructType(),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(classic)
    else {
      val partSchema = StructType(partCols.map(c => schema(schema.fieldIndex(c))))
      val dataSchema = StructType(
        schema.filterNot(f => partCols.contains(f.name)))
      HadoopFsRelation(
        manifestIndexFor(spark, path, partCols, partSchema, statuses),
        partitionSchema = partSchema,
        dataSchema = dataSchema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat,
        options = Map.empty)(classic)
    }
  }

  /** A [[ManifestFileIndex]] over exactly `statuses`, grouped by the
    * directory-encoded partition values (partition tuples cast
    * through the sidecar types, like every part-aware scan).
    */
  private[sources] def manifestIndexFor(spark: SparkSession, path: String,
      partCols: Seq[String], partSchema: StructType,
      statuses: Seq[FileStatusWithMetadata]): ManifestFileIndex = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val groups = statuses
      .groupBy(st => parsePartValues(fs, path, st.getPath.toString, partCols))
      .toSeq.map { case (raw, sts) =>
        (InternalRow.fromSeq(raw.zip(partSchema.fields).map {
          case (v, f) => castPartValue(v, f.dataType)
        }), sts)
      }
    new ManifestFileIndex(new Path(path), statuses, partSchema, groups)
  }

  /** Kept file statuses for the LAZY read path ([[SkippingFileIndex]]):
    * re-anchor the RESOLVED catalyst `filters` on names and run the
    * same skip planning every eager read uses — stats range rewrite,
    * null counts, blooms, nested paths, generated-column derivation.
    * Subquery-bearing or non-deterministic conjuncts are dropped
    * (conservative: more files kept, never fewer).
    */
  private[sources] def lazySkipStatuses(spark: SparkSession, path: String,
      dir: String, filters: Seq[Expression]): Seq[FileStatusWithMetadata] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val usable = filters.filter(f => f.deterministic &&
      !f.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
    val pred =
      if (usable.isEmpty) lit(true)
      else org.apache.spark.sql.graft.ColumnBridge.column(
        usable.reduce(And).transform {
          case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
        })
    val (stats, _, skip) = planSkip(spark, path, dir, pred)
    statusesOf(stats.filter(skip))
  }

  /** The LAZY read plan for the catalog/`format("graft")` surface —
    * the Delta OSS architecture (TahoeFileIndex): a standard
    * `HadoopFsRelation` whose [[SkippingFileIndex]] evaluates the
    * manifest UNDER THE QUERY'S OWN FILTERS at listing time, so the
    * whole Catalyst file-scan stack applies — nested-predicate and
    * parquet row-group pushdown, whole-stage codegen, nested schema
    * pruning, and native dynamic partition pruning on name-addressed
    * joins (`FileSourceScanExec` re-filters the listed partition
    * directories with the runtime subquery values). The deletion
    * vector applies as the usual broadcast anti-join above the scan;
    * a column mapping projects physical→logical on top. `None` for a
    * legacy status-less manifest — the caller keeps the eager V1
    * route, whose path-list fallback still reads those.
    */
  private[sources] def lazyScanPlan(spark: SparkSession, path: String,
      version: Option[Long]): Option[DataFrame] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = version match {
      case Some(v) => s"$path/$StatsDir/v$v"
      case None => manifestDirOf(fs, path)
    }
    if (version.exists(v => !isCommittedGen(fs, new Path(dir)))) return None
    val m = readManifestIn(spark, dir)
    if (!m.columns.contains("file_size")) return None
    val phys = tableSchemaIn(spark, path, dir)
    val schema = StructType(phys.fields.map(_.copy(nullable = true)))
    val partCols = partitionColsIn(fs, dir)
    val sizeHint = tableSizeInBytes(spark, path, version)
      .getOrElse(m.agg(sum(col("file_size"))).head match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      })
    val idx = new SkippingFileIndex(spark, path, dir, schema, partCols, sizeHint)
    val partSchema = StructType(partCols.map(c => schema(schema.fieldIndex(c))))
    val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rel = HadoopFsRelation(idx, partSchema, dataSchema,
      bucketSpec = None, fileFormat = new ParquetFileFormat,
      options = Map.empty)(classic)
    val scan = applyDv(classic.baseRelationToDataFrame(rel), readDvIn(spark, dir))
    Some(colMapIn(fs, dir) match {
      case None => scan
      case Some(mm) => toLogicalScan(scan, phys, mm)
    })
  }

  /** The generation's deletion vector, if any (see [[DvDir]]):
    * `(file: string, row_index: long)` rows of dead positions.
    */
  private def readDvIn(spark: SparkSession,
      dir: String): Option[DataFrame] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dv = new Path(dir, DvDir)
    if (!fs.exists(dv)) None
    else Some(spark.read.schema(
        StructType(Seq(
          StructField("file", org.apache.spark.sql.types.StringType),
          StructField("row_index", org.apache.spark.sql.types.LongType))))
      .parquet(dv.toString))
  }

  /** Filter DV-dead rows out of a data-file scan: broadcast-hash
    * LEFT ANTI on (file path, row index) — the stream side never
    * shuffles, each row pays one hash probe. No-op when the
    * generation has no vector.
    */
  private def applyDv(scan: DataFrame, dv: Option[DataFrame]): DataFrame =
    dv.fold(scan) { d =>
      // the vector read is itself a file scan with its own _metadata
      // — qualify the probe side's pseudo-column through the Dataset
      scan.join(broadcast(d),
        scan("_metadata.file_path") === d("file") &&
          scan("_metadata.row_index") === d("row_index"),
        "left_anti")
    }

  /** Candidate files that actually contain rows where `cond` is TRUE,
    * with their match counts: ONE distributed scan of just the
    * candidate subset; only a (file, count) row per touched file
    * reaches the driver.
    */
  private def touchedFiles(candScan: Option[DataFrame],
      cond: Column): Seq[(String, Long)] =
    candScan.fold(Seq.empty[(String, Long)])(
      _.select(col("_metadata.file_path").as("__file"), cond.as("__hit"))
        .filter(col("__hit"))
        .groupBy("__file").agg(count(lit(1)).as("__n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq)

  /** Shared DELETE/UPDATE preamble: plan the skip, require a
    * status-carrying manifest, materialize the candidate statuses,
    * and find the actually-touched files under TRUE-only hit
    * semantics (NULL neither deletes nor updates). Returns the
    * already-loaded manifest frame, table schema, coalesced hit
    * predicate, the touched (file, matches) pairs, and a scan of
    * exactly the touched files for the rewrite.
    */
  private def pruneAndTouch(spark: SparkSession, path: String,
      dir: String, predicate: Column, op: String)
      : (DataFrame, StructType, Column, Seq[(String, Long)], DataFrame, Set[String]) = {
    val fsPin = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // OBSERVED SET pinned before the manifest read: the optimistic-
    // commit contract (publishGeneration treats anything beyond it as
    // a concurrent append to ride forward verbatim)
    val pin = listManifestNames(fsPin, dir)
    val (stats, schema, skip) = planSkip(spark, path, dir, predicate, Some(pin))
    require(stats.columns.contains("file_size"),
      s"$op needs a size-carrying manifest (rewrite with writeWithStats)")
    // DML sees the LOGICAL table: DV-dead rows are invisible to the
    // candidate probe, the rewrite and the CDF images — a rewritten
    // file drops its dead rows physically (the rewrite IS their
    // materialization), and they can be neither re-deleted nor
    // resurrected. Partition-converted tables scan part-aware, so the
    // probe/rewrite frames carry the directory-encoded columns and
    // predicates over them evaluate correctly.
    val dv = readDvIn(spark, dir)
    val candStatuses = statusesOf(stats.filter(skip))
    val candScan =
      if (candStatuses.isEmpty) None
      else Some(applyDv(partAwareStatusScan(spark, path, dir, schema,
        candStatuses), dv))
    val hit = coalesce(predicate, lit(false))
    val touched = touchedFiles(candScan, hit)
    val touchedSet = touched.map(_._1).toSet
    val touchedScan = applyDv(partAwareStatusScan(spark, path, dir, schema,
      candStatuses.filter(s => touchedSet(s.getPath.toString))), dv)
    (stats, schema, hit, touched, touchedScan, pin)
  }

  /** The copy-on-write commit shared by the row-level DML ops: stage
    * `replacement` into the table root, carry every row of the
    * (caller-loaded) `manifest` EXCEPT the `touched` files into the
    * next generation together with fresh stats for the replacement
    * files, publish the generation, optionally vacuum. The table
    * schema, tracked columns, features and manifest schema are all
    * unchanged — DML rewrites rows, never shape.
    */
  private def rewriteFiles(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String, dir: String,
      manifest: DataFrame, schema: StructType,
      touched: Seq[String], replacement: Option[DataFrame],
      vacuum: Boolean, retentionMs: Long, markerRetentionMs: Long,
      opStartMs: Long, changeData: Option[DataFrame] = None,
      op: String = "UNKNOWN",
      txn: Option[(String, Long)] = None,
      extraDv: Option[DataFrame] = None,
      clusteredOf: Seq[String] => Option[String] = _ => None,
      observedParts: Option[Set[String]] = None): Unit = {
    // None = the op writes no data files at all (merge-on-read DML:
    // its entire output is the deletion vector) — not even an empty
    // staged part. A PARTITION-CONVERTED table stages `partitionBy`
    // its partition columns and moves each file INTO its `col=value`
    // dir — the replacement rows carry the directory-encoded values
    // (served by the part-aware touched scan), so the write routes
    // them back (or, for an UPDATE that changes a partition value,
    // forward to the row's new directory).
    val partCols = partitionColsIn(fs, dir)
    val moved = replacement.fold(Seq.empty[String]) { r =>
      val staging = new Path(path, s".append-${java.util.UUID.randomUUID}")
      if (partCols.isEmpty) r.write.parquet(staging.toString)
      else r.write.partitionBy(partCols: _*).parquet(staging.toString)
      enforceConstraintsOnStaged(spark, fs, dir, staging, schema, op)
      // copy-on-write rewrites re-verify (and an UPDATE SET may
      // recompute) generated values under the CURRENT session tz —
      // same drift hazard as an append, so the same poison applies
      // (otherwise read-side temporal derivation keeps pruning over
      // mixed-epoch stored values)
      if (generatedIn(fs, dir).nonEmpty) poisonGeneratedTzOnDrift(spark, fs, dir)
      if (partCols.isEmpty) moveIn(fs, staging, new Path(path))
      else moveInPartitioned(fs, staging, new Path(path))
    }
    val feats = manifestFeatures(fs, dir)
    val statsCols = trackedCols(spark, dir).toSeq.sorted
    // Manifest rows tagged with their SOURCE manifest file: a named
    // commit marker none of whose rows reference a rewritten data
    // file survives the generation VERBATIM — an in-flight stream
    // consumer ([[graft.streaming.StatsTableSource]]) replaying that
    // commit across this DML op still reads its exact rows. Only
    // markers actually referencing touched files fold to zero-row
    // (their batch is no longer replayable as written — compaction's
    // documented caveat, here scoped to the affected commits). A
    // marker past the retention cutoff is NOT preserved verbatim:
    // publishGeneration drops it, so its surviving rows must travel
    // in the carried parts instead.
    val tagged = manifest.select(col("*"), col("_metadata.file_path").as("__mfile"))
    // the touched list rides as a broadcast local relation, not an
    // O(touched) IN literal — a whole-table MERGE would otherwise
    // bake every file path into this plan's expression tree
    val touchedDf = spark.createDataset(touched)(
      org.apache.spark.sql.Encoders.STRING).toDF("__touched_file")
    val dirtyNames: Set[String] =
      if (touched.isEmpty) Set.empty
      else tagged.join(broadcast(touchedDf),
          col("file") === col("__touched_file"), "left_semi")
        .select("__mfile").distinct().collect()
        .map(r => new Path(r.getString(0)).getName).toSet
    val markerCutoff = opStartMs - markerRetentionMs
    val verbatim: Set[String] = fs.listStatus(new Path(dir))
      .filter { f =>
        val n = f.getPath.getName
        n.endsWith(".parquet") && !n.startsWith("part-") &&
          f.getModificationTime >= markerCutoff && !dirtyNames(n)
      }
      .map(_.getPath.getName).toSet
    val carried = {
      val minusTouched =
        if (touched.isEmpty) tagged
        else tagged.join(broadcast(touchedDf),
          col("file") === col("__touched_file"), "left_anti")
      val minusVerbatim =
        if (verbatim.isEmpty) minusTouched
        else minusTouched.filter(
          !element_at(split(col("__mfile"), "/"), -1).isin(verbatim.toSeq: _*))
      minusVerbatim.drop("__mfile")
    }
    val rows =
      if (moved.isEmpty) carried
      else carried.unionByName(
        statsFor(partAwareStatusScan(spark, path, dir, schema,
            statusesFor(fs, moved)),
          statsCols,
          withNulls = feats.contains("nulls"), bloom = bloomFeature(feats)),
        allowMissingColumns = true)
    val manifestSchema = readSidecar(spark, dir, ManifestSchemaFile)
      .map(j => DataType.fromJson(j).asInstanceOf[StructType])
      .getOrElse(manifest.schema)
    // deletion-vector carry: entries for files this op rewrote or
    // removed are RESOLVED (the rewrite scanned DV-filtered rows, so
    // the new files hold no dead positions); everything else rides
    // into the next generation, plus this op's own new dead
    // positions (merge-on-read DELETE/UPDATE)
    val carriedDv = readDvIn(spark, dir).map { d =>
      if (touched.isEmpty) d
      else d.join(broadcast(spark.createDataset(touched)(
          org.apache.spark.sql.Encoders.STRING).toDF("__t")),
        col("file") === col("__t"), "left_anti")
    }
    val dvNext = (carriedDv.toSeq ++ extraDv.toSeq)
      .reduceOption(_.unionByName(_))
      .filter(!_.isEmpty) // a rewrite that resolved every entry carries no vector
    publishGeneration(spark, fs, path, dir, rows, schema, statsCols,
      feats, manifestSchema,
      removedData = touched.map(p => rootRelativeOrName(fs, path, p)),
      markerRetentionMs = markerRetentionMs, opStartMs = opStartMs,
      verbatimMarkers = verbatim,
      changeData = changeData.filter(_ => feats.contains(CdfFeature)),
      op = op, txn = txn, dv = dvNext,
      clustered = clusteredOf(moved), observedParts = observedParts)
    if (vacuum) vacuumTable(spark, path, retentionMs)
  }

  /** `filePath` relative to the (qualified) table root — the form
    * the removal log stores so vacuum can resolve a replaced file in
    * a PARTITION subdirectory (`p=1/part-x.parquet`; a bare name only
    * resolves top-level files). Files outside the root — a shallow
    * clone's source-rooted files — fall back to the bare name, which
    * deliberately resolves to nothing under this root: a clone's
    * vacuum must never delete source state.
    */
  private def rootRelativeOrName(fs: org.apache.hadoop.fs.FileSystem,
      tableRoot: String, filePath: String): String = {
    val rootUri = fs.makeQualified(new Path(tableRoot)).toUri.getPath
      .stripSuffix("/") + "/"
    val fileUri = fs.makeQualified(new Path(filePath)).toUri.getPath
    if (fileUri.startsWith(rootUri)) fileUri.substring(rootUri.length)
    else new Path(filePath).getName
  }

  /** Whether DML against the manifest at `dir` must record change
    * data (feature flag check — O(1) sidecar read).
    */
  private def cdfEnabled(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Boolean =
    manifestFeatures(fs, dir).contains(CdfFeature)

  /** Whether the table's change data feed is on (O(1) sidecar read of
    * the current generation's feature flags).
    */
  def changeFeedEnabled(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    cdfEnabled(fs, manifestDirOf(fs, path))
  }

  /** Row-level DELETE (the Delta `DELETE FROM ... WHERE` analog),
    * copy-on-write: the manifest's min/max/bloom stats prune the
    * candidate file set at PLANNING time, one distributed scan of
    * just the candidates finds the files that actually hold matching
    * rows, and only THOSE files are rewritten without their matching
    * rows (a file whose every row matches is simply dropped); every
    * other file is carried into the next manifest generation
    * verbatim — at 100 TB a selective delete rewrites a handful of
    * files, never the table. The generation commit is the snapshot
    * point (a concurrent reader sees all-old or all-new, never a
    * mix), replaced files enter the removal log, and retention
    * vacuum / [[readSkippingAt]] time travel apply exactly as after
    * [[compactTable]].
    *
    * SQL DELETE semantics: only rows where the predicate is TRUE are
    * deleted — NULL keeps the row. Single-writer like all
    * maintenance ops; concurrent readers are safe at any retention
    * >= their runtime. Returns the number of rows deleted.
    */
  private[sources] def deleteWherePhys(spark: SparkSession, path: String, predicate: Column,
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs): Long =
      withConcurrentRetry("deleteWhere") {
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val (manifest, schema, hit, touched, touchedScan, observed) =
      pruneAndTouch(spark, path, dir, predicate, "deleteWhere")
    if (touched.isEmpty) {
      if (vacuum) vacuumTable(spark, path, retentionMs)
      return 0L
    }
    val files = touched.map(_._1)
    val keep = touchedScan.filter(!hit)
    // CDF: the deleted rows themselves, one extra scan of ONLY the
    // touched files (bounded by the delete's selectivity, not the
    // table)
    val changes =
      if (!cdfEnabled(fs, dir)) None
      else Some(touchedScan.filter(hit)
        .withColumn(ChangeTypeCol, lit("delete")))
    rewriteFiles(spark, fs, path, dir, manifest, schema, files, Some(keep),
      vacuum, retentionMs, markerRetentionMs, opStart, changes, op = "DELETE",
      observedParts = Some(observed))
    touched.map(_._2).sum
  }

  /** Row-level `UPDATE ... SET` (copy-on-write, the same
    * prune-then-touch shape as [[deleteWhere]]): only files holding
    * rows where the predicate is TRUE are rewritten, with each `set`
    * expression applied to exactly those rows (cast back to the
    * column's stored type — updates change values, never the
    * schema); FALSE/NULL rows and untouched files are preserved
    * verbatim. Set expressions may reference any table column (the
    * pre-update value, as in SQL UPDATE). Returns the number of rows
    * updated.
    */
  /** Validate UPDATE SET keys against `schema` and build the ONE
    * projection both UPDATE variants (copy-on-write and
    * deletion-vector) apply — a second hand-written copy would have
    * to track SET/cast changes in lockstep. SET keys may be NESTED
    * struct-field paths (`m.uid` — the Delta UPDATE-nested-field
    * shape); a path must resolve through the schema, and setting
    * both a struct and one of its fields (or overlapping paths) in
    * the same statement is ambiguous and refused. The returned
    * projector takes `(frame, onlyWhere)`: guarded per-row for the
    * copy-on-write rewrite, unconditional (`None`) for
    * already-filtered hit rows.
    */
  private def setProjector(schema: StructType, set: Map[String, Column])
      : (DataFrame, Option[Column]) => DataFrame = {
    val unknown = set.keySet.filterNot(k =>
      if (k.contains('.')) fieldTypeOfPath(schema, k).isDefined
      else schema.fieldNames.contains(k))
    require(unknown.isEmpty,
      s"SET columns [${unknown.toSeq.sorted.mkString(",")}] are not in the " +
        s"table schema ${schema.simpleString}")
    // canonicalize the head segment to the SCHEMA's field name —
    // validation above is case-insensitive, and application must
    // match it or a case-mismatched head would silently update
    // nothing while reporting touched rows
    def canonHead(h: String): String =
      schema.fieldNames.find(_.equalsIgnoreCase(h)).getOrElse(h)
    val nestedByHead: Map[String, Seq[(String, Column)]] = set.toSeq
      .filter(_._1.contains('.'))
      .map { case (k, e) =>
        val i = k.indexOf('.')
        (canonHead(k.substring(0, i)), (k.substring(i + 1), e)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    nestedByHead.keys.foreach(h => require(
      !set.keys.exists(_.equalsIgnoreCase(h)),
      s"SET assigns both $h and a nested field of it — pick one"))
    // overlapping nested paths (m.a and m.a.b) would apply in Map
    // iteration order — ambiguous, refuse
    val nestedPaths = set.keys.filter(_.contains('.'))
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSeq
    require(!nestedPaths.exists(p =>
        nestedPaths.exists(q => q != p && p.startsWith(q + "."))),
      s"SET assigns overlapping nested paths " +
        s"[${nestedPaths.sorted.mkString(",")}] — pick one per subtree")
    (frame: DataFrame, onlyWhere: Option[Column]) =>
      frame.select(schema.fields.toSeq.map { f =>
        set.get(f.name) match {
          case Some(e) =>
            val applied = e.cast(f.dataType)
            onlyWhere.fold(applied)(c =>
              when(c, applied).otherwise(col(f.name))).as(f.name)
          case None if nestedByHead.contains(f.name) =>
            // rebuild only the addressed fields via withField; a NULL
            // struct stays NULL (no row gains a struct it never had)
            val applied = nestedByHead(f.name).foldLeft(col(f.name)) {
              case (acc, (sub, e)) =>
                acc.withField(sub, fieldTypeOfPath(schema, s"${f.name}.$sub")
                  .fold(e)(t => e.cast(t)))
            }
            onlyWhere.fold(applied)(c =>
              when(c, applied).otherwise(col(f.name))).as(f.name)
          case None => col(f.name)
        }
      }: _*)
  }

  private[sources] def updateWherePhys(spark: SparkSession, path: String, predicate: Column,
      set: Map[String, Column],
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs): Long = {
    require(set.nonEmpty, "updateWhere needs at least one SET column")
    withConcurrentRetry("updateWhere") {
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val (manifest, schema, hit, touched, touchedScan, observed) =
      pruneAndTouch(spark, path, dir, predicate, "updateWhere")
    val applySet = setProjector(schema, set)
    if (touched.isEmpty) {
      if (vacuum) vacuumTable(spark, path, retentionMs)
      return 0L
    }
    val files = touched.map(_._1)
    val updated = applySet(touchedScan, Some(hit))
    // CDF: pre- and post-image of exactly the TRUE-predicate rows
    // (Delta's update_preimage/update_postimage pair). Two extra
    // scans (pre + post) — both bounded by the touched files, i.e.
    // the update's selectivity, never the table
    val changes =
      if (!cdfEnabled(fs, dir)) None
      else {
        val hitRows = touchedScan.filter(hit)
        Some(hitRows.withColumn(ChangeTypeCol, lit("update_preimage"))
          .unionByName(applySet(hitRows, None)
            .withColumn(ChangeTypeCol, lit("update_postimage"))))
      }
    rewriteFiles(spark, fs, path, dir, manifest, schema, files, Some(updated),
      vacuum, retentionMs, markerRetentionMs, opStart, changes, op = "UPDATE",
      observedParts = Some(observed))
    touched.map(_._2).sum
    }
  }

  /** Merge-on-read DELETE via deletion vectors (the Delta
    * deletion-vector DELETE analog — see [[DvDir]]): instead of
    * rewriting every touched file ([[deleteWhere]]'s copy-on-write),
    * record the matching rows' `(file, row_index)` positions in the
    * next generation's vector and carry every data file AND manifest
    * row verbatim. Write cost is O(deleted rows), independent of how
    * many bytes the touched files hold — the right trade when
    * deletes are small and frequent (CDC, GDPR erasure) against
    * 100 TB of large files; [[compactTable]] later materializes the
    * vector into clean files and resets the read path's broadcast
    * bound.
    *
    * Everything else behaves exactly like [[deleteWhere]]: SQL TRUE-
    * only semantics, stats-pruned candidate scan, atomic generation
    * commit, CDF `delete` rows when the feed is on, time travel reads
    * each version under its own vector, retention vacuum. Rows
    * already dead in the current vector are invisible to the scan and
    * cannot be re-deleted (the count never double-counts). Named
    * commit markers survive verbatim — no data file was rewritten —
    * so an in-flight [[graft.streaming.StatsTableSource]] consumer
    * replaying a pre-delete batch still reads its ORIGINAL rows (the
    * Delta streaming contract: appends stream; later deletes don't
    * retro-edit a delivered batch — the skipChangeCommits shape).
    * Single-writer like all maintenance ops. Returns the number of
    * rows deleted.
    */
  private[sources] def deleteWhereDVPhys(spark: SparkSession, path: String, predicate: Column,
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs): Long =
      withConcurrentRetry("deleteWhereDV") {
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val (manifest, schema, hit, touched, touchedScan, observed) =
      pruneAndTouch(spark, path, dir, predicate, "deleteWhereDV")
    if (touched.isEmpty) {
      if (vacuum) vacuumTable(spark, path, retentionMs)
      return 0L
    }
    // hit rows of the (already DV-filtered) touched-file scan are the
    // new dead positions — bounded by the delete's selectivity
    val newDead = touchedScan.filter(hit).select(
      col("_metadata.file_path").as("file"),
      col("_metadata.row_index").as("row_index"))
    val changes =
      if (!cdfEnabled(fs, dir)) None
      else Some(touchedScan.filter(hit)
        .select(schema.fieldNames.map(col).toSeq: _*)
        .withColumn(ChangeTypeCol, lit("delete")))
    // no files touched: manifest carried whole, replacement empty —
    // the op's entire output is the vector (+ change data)
    rewriteFiles(spark, fs, path, dir, manifest, schema,
      touched = Nil, replacement = None,
      vacuum, retentionMs, markerRetentionMs, opStart, changes,
      op = "DELETE", extraDv = Some(newDead),
      observedParts = Some(observed))
    touched.map(_._2).sum
  }

  /** REORG / PURGE (the Delta `REORG TABLE ... APPLY (PURGE)`
    * analog): materialize the current deletion vector by rewriting
    * ONLY the files it names — each rewritten file's live rows land
    * in clean files, its vector entries resolve, and every other
    * file (manifest row, commit marker, data bytes) carries into the
    * next generation verbatim. The targeted counterpart to
    * [[compactTable]]'s whole-tail materialization: after a burst of
    * merge-on-read DML the vector's broadcast probe has a cost on
    * every read, and purging pays O(DV-carrying file bytes) once to
    * reset it — never O(table). No logical rows change, so a CDF
    * table records nothing (the compaction rule) and time travel
    * still reads each old version under its own vector. Returns the
    * number of dead positions purged; no-op (no generation) when the
    * vector is empty.
    */
  def purgeDeletionVectors(spark: SparkSession, path: String,
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs): Long =
      withConcurrentRetry("purgeDeletionVectors") {
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    // partition-converted tables purge too: the part-aware scan
    // carries the directory values and the rewrite routes clean rows
    // back through partitionBy (see rewriteFiles)
    val dvOpt = readDvIn(spark, dir)
    if (dvOpt.isEmpty) return 0L
    val dv = dvOpt.get
    // O(DV-carrying files) driver rows — the touched-files pattern
    // (bounded by past merge-on-read DML, not by the table)
    val perFile = dv.groupBy(col("file")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    if (perFile.isEmpty) return 0L
    val files = perFile.map(_._1)
    val schema = tableSchemaIn(spark, path, dir)
    val observed = listManifestNames(fs, dir)
    val stats = readManifestPinned(spark, dir, observed)
    require(stats.columns.contains("file_size"),
      "purgeDeletionVectors needs a size-carrying manifest (rewrite with " +
        "writeWithStats)")
    // manifest narrowed by a broadcast semi-join against the
    // (DV-bounded) touched list BEFORE the driver collect — only the
    // rewritten files' statuses ever leave the cluster
    val touchedDf = spark.createDataset(files)(
      org.apache.spark.sql.Encoders.STRING).toDF("__t")
    val statuses = statusesOf(stats.join(broadcast(touchedDf),
      col("file") === col("__t"), "left_semi"))
    val live = applyDv(partAwareStatusScan(spark, path, dir, schema,
      statuses), Some(dv))
      .select(schema.fieldNames.map(col).toSeq: _*)
    rewriteFiles(spark, fs, path, dir, stats, schema,
      touched = files, replacement = Some(live),
      vacuum, retentionMs, markerRetentionMs, opStart,
      changeData = None, op = "REORG",
      observedParts = Some(observed))
    perFile.map(_._2).sum
  }

  /** Merge-on-read UPDATE via deletion vectors: the matching rows'
    * positions join the vector (their files stay untouched) and the
    * updated row images are APPENDED as new files — write cost
    * O(updated rows), not O(touched file bytes). Same SET semantics,
    * CDF pre/post images, and maintenance contract as [[updateWhere]];
    * same vector lifecycle as [[deleteWhereDV]]. Returns the number
    * of rows updated.
    */
  private[sources] def updateWhereDVPhys(spark: SparkSession, path: String, predicate: Column,
      set: Map[String, Column],
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs): Long = {
    require(set.nonEmpty, "updateWhereDV needs at least one SET column")
    withConcurrentRetry("updateWhereDV") {
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val (manifest, schema, hit, touched, touchedScan, observed) =
      pruneAndTouch(spark, path, dir, predicate, "updateWhereDV")
    // same SET surface as the copy-on-write variant, nested paths
    // included (the r16 advice gap: DV UPDATE rejected `m.uid` with
    // a misleading not-in-schema error)
    val applySet = setProjector(schema, set)
    if (touched.isEmpty) {
      if (vacuum) vacuumTable(spark, path, retentionMs)
      return 0L
    }
    val hitRows = touchedScan.filter(hit)
    val newDead = hitRows.select(
      col("_metadata.file_path").as("file"),
      col("_metadata.row_index").as("row_index"))
    val changes =
      if (!cdfEnabled(fs, dir)) None
      else Some(hitRows.select(schema.fieldNames.map(col).toSeq: _*)
        .withColumn(ChangeTypeCol, lit("update_preimage"))
        .unionByName(applySet(hitRows, None)
          .withColumn(ChangeTypeCol, lit("update_postimage"))))
    rewriteFiles(spark, fs, path, dir, manifest, schema,
      touched = Nil, replacement = Some(applySet(hitRows, None)),
      vacuum, retentionMs, markerRetentionMs, opStart, changes,
      op = "UPDATE", extraDv = Some(newDead),
      observedParts = Some(observed))
    touched.map(_._2).sum
    }
  }

  /** Keyed REPLACE (one atomic commit): drop EVERY target row whose
    * key appears in the source, then write EVERY source row — the
    * multi-row-per-key sibling of [[mergeUpsert]] (which this
    * generalizes by removing the unique-source-keys restriction:
    * replace semantics are well-defined at any source cardinality,
    * update-all upserts are not). The op the continuously-maintained
    * SCD2 history needs: a batch re-derives its affected keys' whole
    * version sets, and swapping them in must be ONE generation commit
    * — a delete-then-insert pair has a torn middle no replay can
    * repair, while a single `txn`-stamped commit replays as a
    * detected no-op. Same prune→touch→rewrite shape and costs as
    * [[mergeUpsert]]; CDF records matched target rows as `delete`
    * and all source rows as `insert` (cardinality may legitimately
    * change, so update pre/post pairing does not apply). Returns
    * (target rows dropped, source rows written).
    */
  private[sources] def replaceKeyedPhys(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String],
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs,
      txn: Option[(String, Long)] = None): (Long, Long) =
      withConcurrentRetry("replaceKeyed") {
    require(keyCols.nonEmpty, "replaceKeyed needs at least one key column")
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    // partitioned tables replace too: part-aware scans + the
    // partitionBy rewrite in rewriteFiles keep directory values
    val replayed = txn.exists { case (app, v) =>
      readSidecarIn(fs, dir, TxnFile)
        .flatMap(j => txnMapFromJson(j).get(app)).exists(_ >= v)
    }
    if (replayed) return (0L, 0L)
    val schema = tableSchemaIn(spark, path, dir)
    keyCols.foreach(k => require(schema.fieldNames.contains(k),
      s"key column $k is not in the table schema ${schema.simpleString}"))
    require(
      source.schema.map(f => (f.name, f.dataType)).toSet ==
        schema.map(f => (f.name, f.dataType)).toSet,
      s"source schema ${source.schema.simpleString} must carry exactly the " +
        s"table's columns ${schema.simpleString} (any order)")
    val observed = listManifestNames(fs, dir)
    val stats = readManifestPinned(spark, dir, observed)
    require(stats.columns.contains("file_size"),
      "replaceKeyed needs a size-carrying manifest (rewrite with writeWithStats)")
    val src = source.select(schema.fieldNames.map(col).toSeq: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val srcCount = src.count()
      if (srcCount == 0L) return (0L, 0L)
      val srcKeys = src.select(keyCols.map(col): _*).distinct()
      val tracked = trackedCols(spark, dir)
      val prunable = keyCols.filter(tracked)
      val skip: Column =
        if (prunable.isEmpty) lit(true)
        else {
          val aggs = prunable.flatMap(k =>
            Seq(min(col(k)).as(s"__lo_$k"), max(col(k)).as(s"__hi_$k")))
          val env = src.agg(aggs.head, aggs.tail: _*).head()
          prunable.zipWithIndex.map { case (k, i) =>
            val lo = env.get(2 * i); val hi = env.get(2 * i + 1)
            if (lo == null) lit(false)
            else minC(k) <= lit(hi) && maxC(k) >= lit(lo)
          }.reduce(_ && _)
        }
      val candStatuses = statusesOf(stats.filter(skip))
      val dv = readDvIn(spark, dir)
      val matched: Option[DataFrame] =
        if (candStatuses.isEmpty) None
        else Some(applyDv(partAwareStatusScan(spark, path, dir, schema, candStatuses), dv)
          .select(keyCols.map(col) :+ col("_metadata.file_path").as("__file"): _*)
          .join(srcKeys, keyCols)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      try {
        val touched: Seq[(String, Long)] = matched.fold(Seq.empty[(String, Long)])(
          _.groupBy("__file").agg(count(lit(1)).as("__n"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq)
        val files = touched.map(_._1)
        val touchedSet = files.toSet
        def touchedScan = applyDv(partAwareStatusScan(spark, path, dir, schema,
          candStatuses.filter(s => touchedSet(s.getPath.toString))), dv)
        val replacement =
          if (files.isEmpty) src
          else touchedScan.join(srcKeys, keyCols, "left_anti")
            .unionByName(src)
        val changes =
          if (!cdfEnabled(fs, dir)) None
          else {
            val dels =
              if (files.isEmpty) src.limit(0)
              else touchedScan.join(srcKeys, keyCols, "semi")
            Some(dels.withColumn(ChangeTypeCol, lit("delete"))
              .unionByName(src.withColumn(ChangeTypeCol, lit("insert"))))
          }
        rewriteFiles(spark, fs, path, dir, stats, schema, files,
          Some(replacement), vacuum, retentionMs, markerRetentionMs,
          opStart, changes, op = "MERGE", txn = txn,
          observedParts = Some(observed))
        (touched.map(_._2).sum, srcCount)
      } finally matched.foreach(_.unpersist())
    } finally src.unpersist()
  }

  /** Keyed MERGE DELETE (the Delta `MERGE ... WHEN MATCHED THEN
    * DELETE` arm): drop every target row whose key appears in
    * `keys` — the CDC-tombstone apply path, where the delete set is
    * a DATAFRAME of keys, not a predicate (a predicate form would
    * need an O(batch) IN literal; the frame rides joins). Same
    * prune→touch→rewrite shape as [[mergeUpsert]]: the target
    * manifest prunes by the keys' min/max envelope, one semi-join
    * scan finds the files actually holding matched rows, only those
    * rewrite (anti-join), everything else carries verbatim. Keys
    * absent from the target are no-ops (delete is idempotent).
    * CDF records the dropped rows as `delete`; `txn` gives the same
    * idempotent-writer skip as [[mergeUpsert]]. Returns the number
    * of rows deleted.
    */
  private[sources] def mergeDeletePhys(spark: SparkSession, path: String, keys: DataFrame,
      keyCols: Seq[String],
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs,
      txn: Option[(String, Long)] = None): Long =
      withConcurrentRetry("mergeDelete") {
    require(keyCols.nonEmpty, "mergeDelete needs at least one key column")
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    // partitioned tables merge-delete too (see replaceKeyed note)
    val replayed = txn.exists { case (app, v) =>
      readSidecarIn(fs, dir, TxnFile)
        .flatMap(j => txnMapFromJson(j).get(app)).exists(_ >= v)
    }
    if (replayed) return 0L
    val schema = tableSchemaIn(spark, path, dir)
    keyCols.foreach(k => require(schema.fieldNames.contains(k),
      s"key column $k is not in the table schema ${schema.simpleString}"))
    val observed = listManifestNames(fs, dir)
    val stats = readManifestPinned(spark, dir, observed)
    require(stats.columns.contains("file_size"),
      "mergeDelete needs a size-carrying manifest (rewrite with writeWithStats)")
    val delKeys = keys.select(keyCols.map(col): _*).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (delKeys.isEmpty) {
        if (vacuum) vacuumTable(spark, path, retentionMs)
        return 0L
      }
      val tracked = trackedCols(spark, dir)
      val prunable = keyCols.filter(tracked)
      val skip: Column =
        if (prunable.isEmpty) lit(true)
        else {
          val aggs = prunable.flatMap(k =>
            Seq(min(col(k)).as(s"__lo_$k"), max(col(k)).as(s"__hi_$k")))
          val env = delKeys.agg(aggs.head, aggs.tail: _*).head()
          prunable.zipWithIndex.map { case (k, i) =>
            val lo = env.get(2 * i); val hi = env.get(2 * i + 1)
            if (lo == null) lit(false)
            else minC(k) <= lit(hi) && maxC(k) >= lit(lo)
          }.reduce(_ && _)
        }
      val candStatuses = statusesOf(stats.filter(skip))
      val dv = readDvIn(spark, dir)
      val matched: Option[DataFrame] =
        if (candStatuses.isEmpty) None
        else Some(applyDv(partAwareStatusScan(spark, path, dir, schema, candStatuses), dv)
          .select(keyCols.map(col) :+ col("_metadata.file_path").as("__file"): _*)
          .join(delKeys, keyCols)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      try {
        val touched: Seq[(String, Long)] = matched.fold(Seq.empty[(String, Long)])(
          _.groupBy("__file").agg(count(lit(1)).as("__n"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq)
        if (touched.isEmpty) {
          if (vacuum) vacuumTable(spark, path, retentionMs)
          return 0L
        }
        val files = touched.map(_._1)
        val touchedSet = files.toSet
        def touchedScan = applyDv(partAwareStatusScan(spark, path, dir, schema,
          candStatuses.filter(s => touchedSet(s.getPath.toString))), dv)
        val replacement = touchedScan.join(delKeys, keyCols, "left_anti")
        val changes =
          if (!cdfEnabled(fs, dir)) None
          else Some(touchedScan.join(delKeys, keyCols, "semi")
            .withColumn(ChangeTypeCol, lit("delete")))
        rewriteFiles(spark, fs, path, dir, stats, schema, files,
          Some(replacement), vacuum, retentionMs, markerRetentionMs,
          opStart, changes, op = "MERGE", txn = txn,
          observedParts = Some(observed))
        touched.map(_._2).sum
      } finally matched.foreach(_.unpersist())
    } finally delKeys.unpersist()
  }

  /** Upsert MERGE (the Delta `MERGE ... WHEN MATCHED THEN UPDATE SET *
    * WHEN NOT MATCHED THEN INSERT *` analog), copy-on-write on the
    * target's files:
    *
    *  1. PRUNE: the target manifest keeps only files whose per-key
    *     min/max ranges overlap the source's key envelope (one small
    *     agg over the source) — at 100 TB a CDC batch touching one
    *     day's keys prunes everything else at planning time.
    *  2. TOUCH: one distributed semi-join of the candidate scan
    *     against the source's distinct keys finds the files holding
    *     at least one matched row; only (file, count) rows reach the
    *     driver.
    *  3. REWRITE: touched rows whose key matches the source are
    *     dropped (anti-join) and EVERY source row is written as new
    *     files — matched keys become updates, unmatched keys
    *     inserts. Files without a matched row are carried into the
    *     next generation verbatim.
    *
    * The generation commit snapshots the whole merge atomically
    * (readers see none or all of it); removal-log / retention /
    * time-travel semantics are [[compactTable]]'s. Source keys must
    * be UNIQUE (checked — a key matching twice would make the merge
    * order-dependent, the same error Delta MERGE raises); a target
    * key duplicated across rows collapses to its single source row
    * (update-all semantics). The source must carry exactly the
    * table's columns (any order). Returns (matched source keys,
    * inserted source keys).
    *
    * IDEMPOTENT WRITES (`txn = Some(appId -> version)`, the Delta
    * `txnAppId`/`txnVersion` analog): if the table's [[txnVersion]]
    * for `appId` is already >= `version`, the whole merge is SKIPPED
    * (returns (0, 0)) — an at-least-once writer replaying a batch
    * whose merge committed but whose own offset didn't cannot
    * double-apply. On commit the stamp lands in the generation's
    * [[TxnFile]] atomically with the merged rows and is carried
    * forward by every later generation.
    */
  private[sources] def mergeUpsertPhys(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String],
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs,
      txn: Option[(String, Long)] = None,
      mergeSchema: Boolean = false): (Long, Long) =
      withConcurrentRetry("mergeUpsert") {
    require(keyCols.nonEmpty, "mergeUpsert needs at least one key column")
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    // merge evolution works on PARTITIONED tables too (r14): the
    // widened schema's new fields are by definition not partition
    // columns (those are stored), the touched scans are part-aware,
    // and the rewrite stages partitionBy — same machinery as append
    // evolution
    val replayed = txn.exists { case (app, v) =>
      readSidecarIn(fs, dir, TxnFile)
        .flatMap(j => txnMapFromJson(j).get(app)).exists(_ >= v)
    }
    if (replayed) return (0L, 0L)
    val schema0 = tableSchemaIn(spark, path, dir)
    keyCols.foreach(k => require(schema0.fieldNames.contains(k),
      s"key column $k is not in the table schema ${schema0.simpleString}"))
    // SCHEMA EVOLUTION on merge (`mergeSchema = true`, the Delta
    // autoMerge analog): the source may ADD columns — the table
    // widens sidecars-first (the append-evolution crash order: a
    // crash after the sidecar write leaves a widened table whose
    // old files read as nulls — consistent), matched target rows
    // take the source's new values, UNTOUCHED files are never
    // rewritten (their rows surface nulls for the new columns from
    // the parquet reader, zero data movement — the 100 TB point).
    // Shared columns never retype; the tracked-stats set is
    // unchanged (track a new column via append evolution or a
    // stats rewrite).
    val newFields = source.schema
      .filterNot(f => schema0.fieldNames.contains(f.name))
    val schema: StructType =
      if (!mergeSchema) {
        require(
          source.schema.map(f => (f.name, f.dataType)).toSet ==
            schema0.map(f => (f.name, f.dataType)).toSet,
          s"source schema ${source.schema.simpleString} must carry exactly the " +
            s"table's columns ${schema0.simpleString} (any order); pass " +
            "mergeSchema = true to add columns")
        schema0
      } else {
        schema0.foreach { f =>
          source.schema.find(_.name == f.name) match {
            case Some(b) => require(b.dataType == f.dataType,
              s"column ${f.name}: source type ${b.dataType.simpleString} must " +
                s"match stored ${f.dataType.simpleString} — evolution adds " +
                "columns, never retypes")
            case None => require(false,
              s"merge source must carry every stored column; missing ${f.name}")
          }
        }
        if (newFields.isEmpty) schema0
        else {
          require(colMapIn(fs, dir).isEmpty,
            "merge schema evolution on a column-mapped table is not " +
              "supported — evolve via appendWithStats(mergeSchema = true) " +
              "first (it allocates collision-free physical names), then merge")
          require(currentGen(fs, new Path(s"$path/$StatsDir")).isDefined,
            s"$path is a legacy flat-manifest table — run compactTable once " +
              "to migrate it to generations before evolving its schema")
          val widened = StructType(schema0.fields ++
            newFields.map(_.copy(nullable = true)))
          // tracked set unchanged — preserve the stats-cols FILE
          // order verbatim (manifest part columns are keyed to it)
          val statsColsInOrder = statsColsInOrderOf(spark, dir)
          writeSidecars(spark, dir, widened, statsColsInOrder,
            manifestFeatures(fs, dir))
          widened
        }
      }
    val observed = listManifestNames(fs, dir)
    val stats = readManifestPinned(spark, dir, observed)
    require(stats.columns.contains("file_size"),
      "mergeUpsert needs a size-carrying manifest (rewrite with writeWithStats)")
    // the source is read several times below (key envelope, distinct
    // keys, counts, the final union) — materialize it once; merge
    // sources are CDC-batch-sized, not table-sized
    val src = source.select(schema.fieldNames.map(col).toSeq: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val srcCount = src.count()
      if (srcCount == 0L) return (0L, 0L)
      val dup = src.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
        .limit(1).collect()
      require(dup.isEmpty,
        s"source keys must be unique on (${keyCols.mkString(",")}) — " +
          s"duplicate: ${dup.headOption.getOrElse("")}")
      // 1. PRUNE — per-key range overlap against the source envelope.
      // Untracked key columns contribute no constraint (all files stay
      // candidates — correct, just unpruned). An all-null key column
      // never matches any target row (SQL equality), so its term is
      // FALSE; a file with null stats for a key (evolved/all-null)
      // yields a NULL term and is correctly dropped from candidates.
      val tracked = trackedCols(spark, dir)
      val prunable = keyCols.filter(tracked)
      val skip: Column =
        if (prunable.isEmpty) lit(true)
        else {
          val aggs = prunable.flatMap(k =>
            Seq(min(col(k)).as(s"__lo_$k"), max(col(k)).as(s"__hi_$k")))
          val env = src.agg(aggs.head, aggs.tail: _*).head()
          prunable.zipWithIndex.map { case (k, i) =>
            val lo = env.get(2 * i); val hi = env.get(2 * i + 1)
            if (lo == null) lit(false)
            else minC(k) <= lit(hi) && maxC(k) >= lit(lo)
          }.reduce(_ && _)
        }
      val candStatuses = statusesOf(stats.filter(skip))
      val dv = readDvIn(spark, dir)
      // 2. TOUCH — ONE scan of the candidates, inner-joined to the
      // (unique, so duplication-free) source keys; the narrow matched
      // frame (keys + file) is kept for BOTH aggregates — per-file
      // match counts and the global matched-key count — instead of
      // scanning the touched files a second time
      val srcKeys = src.select(keyCols.map(col): _*).distinct()
      val matched: Option[DataFrame] =
        if (candStatuses.isEmpty) None
        else Some(applyDv(partAwareStatusScan(spark, path, dir, schema, candStatuses), dv)
          .select(keyCols.map(col) :+ col("_metadata.file_path").as("__file"): _*)
          .join(srcKeys, keyCols)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      try {
        val touched: Seq[(String, Long)] = matched.fold(Seq.empty[(String, Long)])(
          _.groupBy("__file").agg(count(lit(1)).as("__n"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq)
        val files = touched.map(_._1)
        val touchedSet = files.toSet
        def touchedScan = partAwareStatusScan(spark, path, dir, schema,
          candStatuses.filter(s => touchedSet(s.getPath.toString)))
        val matchedKeys = matched.fold(0L)(
          _.select(keyCols.map(col): _*).distinct().count())
        // 3. REWRITE
        val replacement =
          if (files.isEmpty) src
          else touchedScan
            .join(srcKeys, keyCols, "left_anti")
            .unionByName(src)
        // CDF: matched target rows are the update preimages (every
        // duplicate target row that collapses is a preimage — each
        // was replaced), matched source rows the postimages,
        // unmatched source rows plain inserts
        val changes =
          if (!cdfEnabled(fs, dir)) None
          else {
            val matchedKeyDf = matched.map(
              _.select(keyCols.map(col): _*).distinct())
            val pre =
              if (files.isEmpty) src.limit(0)
              else touchedScan
                .join(srcKeys, keyCols, "semi")
            val post = matchedKeyDf.fold(src.limit(0))(
              k => src.join(k, keyCols, "semi"))
            val ins = matchedKeyDf.fold(src)(
              k => src.join(k, keyCols, "left_anti"))
            Some(pre.withColumn(ChangeTypeCol, lit("update_preimage"))
              .unionByName(post.withColumn(ChangeTypeCol, lit("update_postimage")))
              .unionByName(ins.withColumn(ChangeTypeCol, lit("insert"))))
          }
        rewriteFiles(spark, fs, path, dir, stats, schema, files, Some(replacement),
          vacuum, retentionMs, markerRetentionMs, opStart, changes,
          op = "MERGE", txn = txn,
          observedParts = Some(observed))
        (matchedKeys, srcCount - matchedKeys)
      } finally matched.foreach(_.unpersist())
    } finally src.unpersist()
  }

  /** FULL CONDITIONAL MERGE — the Delta `MERGE INTO` with the
    * complete clause surface ([[MergeClause]]): ordered
    * `WHEN MATCHED [AND cond] THEN UPDATE SET ... | DELETE`,
    * `WHEN NOT MATCHED [AND cond] THEN INSERT *` (the full source
    * row), and `WHEN NOT MATCHED BY SOURCE [AND cond] THEN
    * UPDATE | DELETE`. The ON condition is equi-key on `keyCols`
    * (the scalable case; source keys must be unique so each matched
    * target row pairs one source row). Matched rows take the FIRST
    * clause whose condition holds; rows matching no clause carry
    * unchanged and do NOT force their file to rewrite.
    *
    * Same copy-on-write shape as [[mergeUpsertPhys]]: candidates =
    * key-envelope-pruned files UNION (when by-source clauses exist)
    * files passing the stats rewrite of the by-source conditions'
    * OR (an unprunable by-source condition keeps every file a
    * candidate — Delta's cost too: "not matched by source" is a
    * whole-table question); ONE candidate scan computes each row's
    * action, only (file, action) rows reach the driver aggregated,
    * and only files holding an acting row are rewritten. CDF records
    * update pre/postimages, deletes and inserts; `txn` gives the
    * Delta txnAppId/txnVersion idempotency. A merge where nothing
    * acts commits no generation.
    *
    * Returns (target rows updated, target rows deleted, source rows
    * inserted).
    */
  private[sources] def mergeIntoPhys(spark: SparkSession, path: String,
      source: DataFrame, keyCols: Seq[String], clauses: Seq[MergeClause],
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs,
      txn: Option[(String, Long)] = None): (Long, Long, Long) =
      withConcurrentRetry("mergeInto") {
    import MergeClause._
    require(keyCols.nonEmpty, "mergeInto needs at least one key column")
    require(clauses.nonEmpty, "mergeInto needs at least one clause")
    val matchedClauses = clauses.collect {
      case c: MatchedUpdate => c: MergeClause
      case c: MatchedDelete => c: MergeClause
    }
    val insertClauses = clauses.collect { case c: NotMatchedInsert => c }
    val bySourceClauses = clauses.collect {
      case c: BySourceUpdate => c: MergeClause
      case c: BySourceDelete => c: MergeClause
    }
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    // partitioned tables take the full conditional merge too (see
    // replaceKeyed note); an UPDATE SET that changes a partition
    // value routes the row to its new directory
    val replayed = txn.exists { case (app, v) =>
      readSidecarIn(fs, dir, TxnFile)
        .flatMap(j => txnMapFromJson(j).get(app)).exists(_ >= v)
    }
    if (replayed) return (0L, 0L, 0L)
    val schema = tableSchemaIn(spark, path, dir)
    keyCols.foreach(k => require(schema.fieldNames.contains(k),
      s"key column $k is not in the table schema ${schema.simpleString}"))
    clauses.foreach {
      case MatchedUpdate(_, set) => (set.keySet -- schema.fieldNames).foreach(c =>
        sys.error(s"SET column $c is not in the table schema"))
      case BySourceUpdate(_, set) => (set.keySet -- schema.fieldNames).foreach(c =>
        sys.error(s"SET column $c is not in the table schema"))
      case _ => ()
    }
    val observed = listManifestNames(fs, dir)
    val stats = readManifestPinned(spark, dir, observed)
    require(stats.columns.contains("file_size"),
      "mergeInto needs a size-carrying manifest (rewrite with writeWithStats)")
    val src = source.select(schema.fieldNames.map(col).toSeq: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val srcCount = src.count()
      val dup = src.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
        .limit(1).collect()
      require(dup.isEmpty,
        s"source keys must be unique on (${keyCols.mkString(",")}) — " +
          s"duplicate: ${dup.headOption.getOrElse("")}")

      // candidate files: key-envelope overlap + the by-source
      // conditions' stats rewrite (unprunable => every file)
      val tracked = trackedCols(spark, dir)
      val nullsTracked = stats.columns.collect {
        case c if c.startsWith("nulls_") => c.drop(6) }.toSet
      val prunable = keyCols.filter(tracked)
      val envelopeSkip: Column =
        if (srcCount == 0L) lit(false)
        else if (prunable.isEmpty) lit(true)
        else {
          val aggs = prunable.flatMap(k =>
            Seq(min(col(k)).as(s"__lo_$k"), max(col(k)).as(s"__hi_$k")))
          val env = src.agg(aggs.head, aggs.tail: _*).head()
          prunable.zipWithIndex.map { case (k, i) =>
            val lo = env.get(2 * i); val hi = env.get(2 * i + 1)
            if (lo == null) lit(false)
            else minC(k) <= lit(hi) && maxC(k) >= lit(lo)
          }.reduce(_ && _)
        }
      // by-source conditions are written over `t.<col>` — strip the
      // alias before resolving against the bare schema for the
      // stats rewrite
      def stripT(c: Column): Column = {
        import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        val e = org.apache.spark.sql.graft.ColumnBridge.expression(c).transform {
          case a: UnresolvedAttribute if a.nameParts.size == 2 &&
              a.nameParts.head == "t" =>
            UnresolvedAttribute(Seq(a.nameParts(1)))
        }
        org.apache.spark.sql.graft.ColumnBridge.column(e)
      }
      val bySourceSkip: Column =
        if (bySourceClauses.isEmpty) lit(false)
        else bySourceClauses.map {
          case BySourceUpdate(cond, _) => cond
          case BySourceDelete(cond) => cond
          case _ => None
        }.map {
          case None => lit(true)
          case Some(c) =>
            rewrite(resolvedCondition(spark, schema, stripT(c)),
              tracked, nullsTracked).getOrElse(lit(true))
        }.reduce(_ || _)
      val candStatuses = statusesOf(stats.filter(envelopeSkip || bySourceSkip))
      val dv = readDvIn(spark, dir)
      def scanOf(statuses: Seq[FileStatusWithMetadata]): DataFrame =
        applyDv(partAwareStatusScan(spark, path, dir, schema, statuses), dv)
      val srcA = src.withColumn("__smatch", lit(1)).as("s")
      def joined(statuses: Seq[FileStatusWithMetadata]): DataFrame =
        scanOf(statuses)
          .withColumn("__tfile", col("_metadata.file_path"))
          .as("t")
          .join(srcA,
            keyCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _),
            "left_outer")
      val matchedCol = col("s.__smatch").isNotNull
      // first-match-wins action index: matched clauses 1.., by-source
      // clauses 101.. (0 = carry unchanged)
      val actionConds: Seq[(Column, Int)] =
        matchedClauses.zipWithIndex.map { case (cl, i) =>
          val cond = cl match {
            case MatchedUpdate(c, _) => c
            case MatchedDelete(c) => c
            case _ => None
          }
          (matchedCol && cond.getOrElse(lit(true)), i + 1)
        } ++ bySourceClauses.zipWithIndex.map { case (cl, i) =>
          val cond = cl match {
            case BySourceUpdate(c, _) => c
            case BySourceDelete(c) => c
            case _ => None
          }
          (!matchedCol && cond.getOrElse(lit(true)), 101 + i)
        }
      val act: Column = actionConds match {
        case Seq() => lit(0)
        case (c0, i0) +: rest =>
          rest.foldLeft(when(c0, lit(i0))) { case (w, (c, i)) => w.when(c, lit(i)) }
            .otherwise(lit(0))
      }
      val updateActs: Seq[Int] =
        matchedClauses.zipWithIndex.collect { case (_: MatchedUpdate, i) => i + 1 } ++
          bySourceClauses.zipWithIndex.collect { case (_: BySourceUpdate, i) => 101 + i }
      val deleteActs: Seq[Int] =
        matchedClauses.zipWithIndex.collect { case (_: MatchedDelete, i) => i + 1 } ++
          bySourceClauses.zipWithIndex.collect { case (_: BySourceDelete, i) => 101 + i }

      // PASS A: one candidate scan -> (file, action) for acting rows
      val probe =
        if (candStatuses.isEmpty) None
        else Some(joined(candStatuses)
          .select(col("__tfile"), act.as("__act"))
          .filter(col("__act") =!= 0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      try {
        val actCounts: Map[Int, Long] = probe.fold(Map.empty[Int, Long])(
          _.groupBy("__act").agg(count(lit(1)).as("__n"))
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
        val updated = updateActs.map(actCounts.getOrElse(_, 0L)).sum
        val deleted = deleteActs.map(actCounts.getOrElse(_, 0L)).sum
        val files: Seq[String] = probe.fold(Seq.empty[String])(
          _.select("__tfile").distinct().collect().map(_.getString(0)).toSeq)
        val touchedSet = files.toSet

        // unmatched source rows -> inserts (matched keys computed
        // from the candidates; the key envelope keeps every file that
        // could hold a matching key, so the set is complete)
        val insertRows: Option[DataFrame] =
          if (insertClauses.isEmpty || srcCount == 0L) None
          else {
            val tgtKeys =
              if (candStatuses.isEmpty) src.limit(0).select(keyCols.map(col): _*)
              else scanOf(candStatuses).select(keyCols.map(col): _*).distinct()
            val insCond = insertClauses.map(_.condition)
              .map(_.getOrElse(lit(true))).reduce(_ || _)
            Some(src.join(tgtKeys, keyCols, "left_anti").as("s")
              .filter(insCond)
              .select(schema.fieldNames.map(col).toSeq: _*))
          }
        val inserted = insertRows.fold(0L)(_.count())
        if (files.isEmpty && inserted == 0L) {
          if (vacuum) vacuumTable(spark, path, retentionMs)
          return (updated, deleted, 0L) // nothing acts: no generation
        }

        // PASS B: rewrite only the touched files
        val touchedStatuses = candStatuses.filter(s => touchedSet(s.getPath.toString))
        def withAct = joined(touchedStatuses).withColumn("__act", act)
        def projectedCols: Seq[Column] = schema.fields.toSeq.map { f =>
          val updates =
            matchedClauses.zipWithIndex.collect {
              case (MatchedUpdate(_, set), i) if set.contains(f.name) =>
                (i + 1, set(f.name))
            } ++ bySourceClauses.zipWithIndex.collect {
              case (BySourceUpdate(_, set), i) if set.contains(f.name) =>
                (101 + i, set(f.name))
            }
          updates.foldLeft(col(s"t.${f.name}")) { case (acc, (i, v)) =>
            when(col("__act") === i, v.cast(f.dataType)).otherwise(acc)
          }.as(f.name)
        }
        def tRow: Seq[Column] = schema.fieldNames.toSeq.map(c => col(s"t.$c").as(c))
        val keptTouched =
          if (files.isEmpty) None
          else Some(withAct
            .filter(if (deleteActs.isEmpty) lit(true)
              else !col("__act").isin(deleteActs.map(Integer.valueOf): _*))
            .select(projectedCols: _*))
        val replacement = (keptTouched, insertRows) match {
          case (Some(k), Some(i)) => k.unionByName(i)
          case (Some(k), None) => k
          case (None, Some(i)) => i
          case (None, None) => sys.error("unreachable: nothing to write")
        }
        val changes =
          if (!cdfEnabled(fs, dir)) None
          else {
            val updIn = (c: Column) =>
              if (updateActs.isEmpty) lit(false)
              else c.isin(updateActs.map(Integer.valueOf): _*)
            val delIn = (c: Column) =>
              if (deleteActs.isEmpty) lit(false)
              else c.isin(deleteActs.map(Integer.valueOf): _*)
            val pre =
              if (files.isEmpty) src.limit(0)
              else withAct.filter(updIn(col("__act"))).select(tRow: _*)
            val post =
              if (files.isEmpty) src.limit(0)
              else withAct.filter(updIn(col("__act"))).select(projectedCols: _*)
            val del =
              if (files.isEmpty) src.limit(0)
              else withAct.filter(delIn(col("__act"))).select(tRow: _*)
            val ins = insertRows.getOrElse(src.limit(0))
            Some(pre.withColumn(ChangeTypeCol, lit("update_preimage"))
              .unionByName(post.withColumn(ChangeTypeCol, lit("update_postimage")))
              .unionByName(del.withColumn(ChangeTypeCol, lit("delete")))
              .unionByName(ins.withColumn(ChangeTypeCol, lit("insert"))))
          }
        rewriteFiles(spark, fs, path, dir, stats, schema, files, Some(replacement),
          vacuum, retentionMs, markerRetentionMs, opStart, changes,
          op = "MERGE", txn = txn,
          observedParts = Some(observed))
        (updated, deleted, inserted)
      } finally probe.foreach(_.unpersist())
    } finally src.unpersist()
  }

  /** Full conditional MERGE; see [[mergeIntoPhys]]. Under a column
    * mapping the source, key columns and every clause condition /
    * SET expression arrive in LOGICAL names (`t.<col>` / `s.<col>`
    * qualified references translate too).
    */
  def mergeInto(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String], clauses: Seq[MergeClause],
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs,
      txn: Option[(String, Long)] = None): (Long, Long, Long) = {
    import MergeClause._
    val m = currentMap(spark, path)
    def mapC(c: Column): Column = m.fold(c)(toPhysicalColumn(c, _))
    def mapS(set: Map[String, Column]): Map[String, Column] =
      m.fold(set)(mm => set.map { case (k, v) =>
        mm.getOrElse(k, k) -> toPhysicalColumn(v, mm) })
    val mapped = clauses.map {
      case MatchedUpdate(c, set) => MatchedUpdate(c.map(mapC), mapS(set))
      case MatchedDelete(c) => MatchedDelete(c.map(mapC))
      case NotMatchedInsert(c) => NotMatchedInsert(c.map(mapC))
      case BySourceUpdate(c, set) => BySourceUpdate(c.map(mapC), mapS(set))
      case BySourceDelete(c) => BySourceDelete(c.map(mapC))
    }
    val (srcM, keysM) = mapDfCols(spark, path, source, keyCols)
    mergeIntoPhys(spark, path, srcM, keysM, mapped, vacuum, retentionMs,
      markerRetentionMs, txn)
  }

  /** The generation's `_op.json` operation record (see [[OpFile]]). */
  private def writeOpFile(fs: org.apache.hadoop.fs.FileSystem,
      build: Path, op: String, opStartMs: Long): Unit = {
    val out = fs.create(new Path(build, OpFile), true)
    try out.write(s"""{"operation":"$op","ts":$opStartMs}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  // JSON string escaping for txn app ids (paths may hold quotes or
  // backslashes on exotic filesystems; everything else in the map is
  // a number)
  private[sources] def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private[sources] def jsonUnescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case c => b.append(c); i += 2
        }
      } else { b.append(s.charAt(i)); i += 1 }
    }
    b.toString
  }

  private[sources] def txnMapToJson(m: Map[String, Long]): String =
    m.toSeq.sortBy(_._1)
      .map { case (a, v) => s""""${jsonEscape(a)}":$v""" }
      .mkString("{", ",", "}")

  // Entries are `"escaped-app-id":version`; the app id may contain
  // escaped quotes, so split on `":` boundaries, not bare commas.
  private[sources] def txnMapFromJson(json: String): Map[String, Long] =
    "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*(-?\\d+)".r
      .findAllMatchIn(json)
      .map(m => jsonUnescape(m.group(1)) -> m.group(2).toLong)
      .toMap

  private[graft] def constraintsToJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (n, e) => s""""${jsonEscape(n)}":"${jsonEscape(e)}"""" }
      .mkString("{", ",", "}")

  private[graft] def constraintsFromJson(json: String): Map[String, String] =
    "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(json)
      .map(m => jsonUnescape(m.group(1)) -> jsonUnescape(m.group(2)))
      .toMap

  private def constraintsIn(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Map[String, String] =
    readSidecarIn(fs, dir, ConstraintsFile)
      .map(constraintsFromJson).getOrElse(Map.empty)

  /** The table's tracked stats columns, sorted — the set every
    * append must match (public for the `format("graft")` write path
    * and callers resolving a table's statsCols contract).
    */
  def tableStatsCols(spark: SparkSession, path: String): Seq[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    trackedCols(spark, manifestDirOf(fs, path)).toSeq.sorted
  }

  /** The table's LIVE partition-value tuples under their CURRENT
    * LOGICAL names, TYPED — one distinct manifest aggregate
    * (partition columns are tracked min=max per file), no directory
    * listing at any table size. The `SHOW PARTITIONS` substrate.
    */
  def partitionValues(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val phys = partitionColsIn(fs, dir)
    require(phys.nonEmpty, s"$path is not a partitioned graft table")
    val inv = colMapIn(fs, dir).map(_.map(_.swap)).getOrElse(Map.empty[String, String])
    readManifestIn(spark, dir)
      .select(phys.map(p => mc(s"min_$p").as(inv.getOrElse(p, p))): _*)
      .distinct()
  }

  /** Per-PARTITION visible row counts straight from the manifest —
    * the grouped companion of [[countWhere]] for `SELECT p…,
    * count(*) … GROUP BY p…` (partition values are min=max per file,
    * so ANY deterministic predicate over partition columns evaluates
    * EXACTLY against the manifest row; deletion-vector dead rows
    * subtract per file; groups whose visible count reaches zero
    * disappear, matching SQL GROUP BY). One small distributed
    * aggregate over O(files) manifest rows — no data read at any
    * table size. `predicate` must reference partition columns only
    * (logical names).
    */
  /** Does the CURRENT manifest record per-file row counts and file
    * status metadata — the columns [[partitionGroupAggs]] and the
    * metadata count pushdown aggregate over? Schema-only (the
    * sidecar-schema read plans no job); a legacy pre-`n_rows`
    * manifest answers false and the planner must fall through to
    * normal aggregation instead of claiming a plan that would fail
    * at execution.
    */
  private[sources] def manifestHasRowCounts(spark: SparkSession,
      path: String): Boolean = {
    val cols = readManifest(spark, path).columns.toSet
    cols.contains("n_rows") && cols.contains("file_size")
  }

  /** Per-partition aggregates straight from the manifest — the
    * grouped companion of [[countWhereDetail]]/[[minMaxWhereDetail]]
    * for `SELECT p…, count(*) / count(c) / min(c) / max(c) … GROUP
    * BY p…` over PARTITION columns. Partition values are min=max per
    * file, so ANY deterministic partition-column predicate evaluates
    * EXACTLY against manifest rows — every kept file is all-match
    * (no boundary files). Per-file stats then answer the aggregates:
    * visible count = `n_rows − dead`, non-null count = `n_rows −
    * coalesce(nulls_c, n_rows)` (NULL stat = the column didn't exist
    * in that file — all rows read NULL), group min/max = min/max of
    * per-file stat envelopes (exact: stats exclude nulls, MIN/MAX
    * ignore them; a NULL stat contributes nothing). Files carrying
    * DELETION-VECTOR entries demote to a real scan whenever a
    * per-column answer is requested (dead rows' values are
    * unknowable from stats; plain count(*) stays exact without
    * demotion) — the scan side unions with the stats side and one
    * re-aggregation merges the partials. Groups whose visible count
    * reaches zero disappear, matching SQL GROUP BY. Output columns
    * follow `specs` positionally. One small distributed aggregate
    * over O(files) manifest rows plus at most the DV files scanned.
    * `predicate` must reference partition columns only (LOGICAL
    * names); target columns arrive logical too. `groupKeys` are the
    * QUERIED grouping columns — any non-empty subset of the
    * partition columns, and the aggregate groups by exactly those
    * (a strict subset merges the unqueried partition dimensions per
    * group; grouping by all partition columns would emit duplicate
    * groups). Exact because each file carries one value per
    * partition column, so per-file partials re-aggregate cleanly
    * under any partition-key grouping.
    */
  private[sources] def partitionGroupAggs(spark: SparkSession,
      path: String, predicate: Option[Column], groupKeys: Seq[String],
      specs: Seq[MetaAggPushdown.GroupOut]): DataFrame = {
    import MetaAggPushdown._
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val phys = partitionColsIn(fs, dir)
    require(phys.nonEmpty, s"$path is not a partitioned graft table")
    val mapOpt = colMapIn(fs, dir)
    val inv = mapOpt.map(_.map(_.swap)).getOrElse(Map.empty[String, String])
    val fwd = mapOpt.getOrElse(Map.empty[String, String])
    def physOf(c: String): String = mapStatsKey(fwd, c)
    val logicalParts = phys.map(p => inv.getOrElse(p, p))
    require(groupKeys.nonEmpty, "grouped metadata aggregate needs keys")
    require(groupKeys.forall(k => logicalParts.exists(_.equalsIgnoreCase(k))),
      s"group keys ${groupKeys.mkString(",")} must be partition columns " +
        s"(${logicalParts.mkString(",")})")
    // group by the QUERIED keys under their queried spelling; the
    // per-file partials below re-aggregate exactly under any subset
    // of the partition columns
    val partCols = groupKeys.map(k =>
      col(logicalParts.find(_.equalsIgnoreCase(k)).get).as(k))
    val keyRefs = groupKeys.map(col)
    val targets = specs.collect {
      case GroupCountCol(c) => c
      case GroupMin(c) => c
      case GroupMax(c) => c
    }.distinct
    val ti = targets.zipWithIndex.toMap
    val m = readManifestIn(spark, dir)
    val statSel = targets.zipWithIndex.flatMap { case (c, i) =>
      val p = physOf(c)
      Seq(mc(s"min_$p").as(s"__lo_$i"), mc(s"max_$p").as(s"__hi_$i"),
        (if (m.columns.contains(s"nulls_$p")) mc(s"nulls_$p")
         else lit(null).cast(org.apache.spark.sql.types.LongType))
          .as(s"__nu_$i"))
    }
    val proj = m.select(
      Seq(col("file"), col("n_rows"), col("file_size"), col("mod_time")) ++
        phys.map(p => mc(s"min_$p").as(inv.getOrElse(p, p))) ++ statSel: _*)
    val matched = predicate.fold(proj)(c => proj.filter(coalesce(c, lit(false))))
    val dvOpt = readDvIn(spark, dir)
    val withDead = dvOpt match {
      case None => matched.withColumn("__dead", lit(0L))
      case Some(d) => matched.join(
          d.groupBy(col("file")).agg(count(lit(1)).as("__dead")),
          Seq("file"), "left")
        .withColumn("__dead", coalesce(col("__dead"), lit(0L)))
    }
    val needScan = targets.nonEmpty
    val demote = if (needScan) col("__dead") > 0L else lit(false)
    val statsFile = withDead.filter(!demote).select(
      partCols ++ Seq((col("n_rows") - col("__dead")).as("__cnt")) ++
        targets.indices.flatMap(i => Seq(
          col(s"__lo_$i"), col(s"__hi_$i"),
          (col("n_rows") - coalesce(col(s"__nu_$i"), col("n_rows")))
            .as(s"__nn_$i"))): _*)
    val scanFile: Option[DataFrame] =
      if (!needScan) None
      else {
        val statuses = statusesOf(withDead.filter(demote))
        if (statuses.isEmpty) None
        else {
          val schema = tableSchemaIn(spark, path, dir)
          val scan0 = applyDv(
            partAwareStatusScan(spark, path, dir, schema, statuses), dvOpt)
          // logical view of partition + target columns, so the SQL
          // predicate (logical names) applies directly
          val scanL = scan0.select(
            phys.map(p => col(p).as(inv.getOrElse(p, p))) ++
              targets.zipWithIndex.map { case (c, i) =>
                col(physOf(c)).as(s"__t_$i") }: _*)
          val filtered = predicate.fold(scanL)(c =>
            scanL.filter(coalesce(c, lit(false))))
          Some(filtered.select(
            partCols ++ Seq(lit(1L).as("__cnt")) ++
              targets.indices.flatMap(i => Seq(
                col(s"__t_$i").as(s"__lo_$i"),
                col(s"__t_$i").as(s"__hi_$i"),
                when(col(s"__t_$i").isNotNull, 1L).otherwise(0L)
                  .as(s"__nn_$i"))): _*))
        }
      }
    val partials = scanFile.fold(statsFile)(statsFile.unionByName(_))
    val finalAggs = Seq(sum(col("__cnt")).as("__cnt")) ++
      targets.indices.flatMap(i => Seq(
        min(col(s"__lo_$i")).as(s"__lo_$i"),
        max(col(s"__hi_$i")).as(s"__hi_$i"),
        sum(col(s"__nn_$i")).as(s"__nn_$i")))
    val grouped = partials.groupBy(keyRefs: _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
      .filter(col("__cnt") > 0L)
    grouped.select(specs.map {
      case GroupKey(n) => col(n)
      case GroupCount => col("__cnt")
      case GroupCountCol(c) => col(s"__nn_${ti(c)}")
      case GroupMin(c) => col(s"__lo_${ti(c)}")
      case GroupMax(c) => col(s"__hi_${ti(c)}")
    }: _*)
  }

  /** The tracked stats columns under their CURRENT LOGICAL names —
    * what a USER predicate or MIN/MAX target may reference (the
    * manifest itself stores physical names; see [[tableStatsCols]]).
    */
  def tableStatsColsLogical(spark: SparkSession, path: String): Seq[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val phys = trackedCols(spark, dir).toSeq
    (colMapIn(fs, dir) match {
      case None => phys
      case Some(m) =>
        val inv = m.map(_.swap)
        phys.map(mapStatsKey(inv, _))
    }).sorted
  }

  /** The table's CHECK constraints (name → SQL expression). */
  def tableConstraints(spark: SparkSession, path: String): Map[String, String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    constraintsIn(fs, manifestDirOf(fs, path))
  }

  /** A row VIOLATES a check iff the expression is FALSE — SQL CHECK
    * semantics, NULL passes.
    */
  private def violates(exprSql: String): Column =
    !coalesce(expr(exprSql), lit(true))

  /** One agg pass over `scan` counting violations per constraint —
    * shared by validation and monitoring; empty map → None.
    */
  private def violationCounts(scan: DataFrame,
      cons: Map[String, String]): Option[Seq[(String, Long)]] =
    if (cons.isEmpty) None
    else {
      val names = cons.keys.toSeq.sorted
      val aggs = names.map(n =>
        sum(when(violates(cons(n)), 1L).otherwise(0L)).as(n))
      val row = scan.agg(aggs.head, aggs.tail: _*).head()
      Some(names.zipWithIndex.map { case (n, i) =>
        n -> (if (row.isNullAt(i)) 0L else row.getLong(i)) })
    }

  private def writeConstraintsSidecar(spark: SparkSession, dir: String,
      cons: Map[String, String]): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir, s".constraints-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(constraintsToJson(cons)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(tmp.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new Path(dir, ConstraintsFile),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Register the CHECK constraint `name` with boolean SQL
    * `exprSql` — see [[ConstraintsFile]]. With `validate = true`
    * (default) every existing row is checked first (one scan) and a
    * violating table is refused loudly; `validate = false` registers
    * a MONITORING-ONLY baseline ([[constraintViolations]]) that still
    * enforces on future writes.
    */
  def addCheckConstraint(spark: SparkSession, path: String, name: String,
      exprSql0: String, validate: Boolean = true): Unit = {
    require(name.matches("[A-Za-z0-9_][A-Za-z0-9._-]*"),
      s"constraint name '$name' must be alphanumeric/._-")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    require(fs.exists(new Path(dir, SchemaFile)),
      s"$path is not a stats table with a schema sidecar; use writeWithStats first")
    // under a column mapping the stored expression binds to PHYSICAL
    // names (stable across renames — enforcement on staged physical
    // files keeps working after any rename); users write logical names
    val exprSql = colMapIn(fs, dir) match {
      case None => exprSql0
      case Some(m) =>
        import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          .sessionState.sqlParser.parseExpression(exprSql0)
          .transform {
            case a: UnresolvedAttribute
                if a.nameParts.size == 1 && m.contains(a.nameParts.head) =>
              UnresolvedAttribute(Seq(m(a.nameParts.head)))
          }.sql
    }
    val cons = constraintsIn(fs, dir)
    require(!cons.contains(name),
      s"constraint $name already exists on $path (as: ${cons.getOrElse(name, "")})")
    // fail fast on an unparseable/unresolvable expression before
    // anything is written
    val scan = readSkippingIn(spark, path, dir, lit(true))
    scan.filter(violates(exprSql)).queryExecution.assertAnalyzed()
    if (validate) {
      val n = scan.filter(violates(exprSql)).count()
      require(n == 0L,
        s"cannot add CHECK constraint $name ($exprSql) to $path: $n existing " +
          "row(s) violate it — clean the data first, or register with " +
          "validate = false for monitoring")
    }
    writeConstraintsSidecar(spark, dir, cons.updated(name, exprSql))
  }

  /** Remove the CHECK constraint `name` (loud if absent). */
  def dropCheckConstraint(spark: SparkSession, path: String,
      name: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val cons = constraintsIn(fs, dir)
    require(cons.contains(name), s"no CHECK constraint $name on $path " +
      s"(have: ${cons.keys.toSeq.sorted.mkString(",")})")
    writeConstraintsSidecar(spark, dir, cons.removed(name))
  }

  // -----------------------------------------------------------------
  // Generated columns (see [[GeneratedFile]])
  // -----------------------------------------------------------------

  /** Reserved sidecar key recording the SESSION TIMEZONE the stored
    * generated values were computed under. Temporal generation
    * expressions (`to_date(ts)`, `date_trunc`, casts over
    * TIMESTAMP) evaluate through the session timezone, so read-side
    * bound derivation ([[withGeneratedPruning]]) is only sound when
    * the reader evaluates endpoints under the SAME timezone the
    * writer stored values under — a mismatched reader would derive
    * bounds shifted by the offset and silently drop matching files.
    * Recorded at declaration; an append under a DIFFERENT session
    * timezone poisons it to [[GenTzMixed]], permanently disabling
    * temporal derivation for the table (stored values now mix
    * epochs — no single timezone is right). Absent on legacy
    * sidecars → temporal derivation stays off (conservative).
    */
  private val GenTzKey = "__session_tz__"
  private val GenTzMixed = "__mixed__"

  private[sources] def generatedIn(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Map[String, String] =
    readSidecarIn(fs, dir, GeneratedFile)
      .map(constraintsFromJson).getOrElse(Map.empty)
      .removed(GenTzKey)

  /** The recorded generation timezone, if any (see [[GenTzKey]]). */
  private[sources] def generatedTzIn(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Option[String] =
    readSidecarIn(fs, dir, GeneratedFile)
      .map(constraintsFromJson).getOrElse(Map.empty)
      .get(GenTzKey)

  private def sessionTz(spark: SparkSession): String =
    spark.sessionState.conf.sessionLocalTimeZone

  /** Append hook: stored generated values about to be computed (or
    * checked) under the CURRENT session timezone — if that differs
    * from the recorded one, poison the record so read-side temporal
    * derivation turns off for good rather than pruning wrong.
    */
  private def poisonGeneratedTzOnDrift(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Unit =
    generatedTzIn(fs, dir) match {
      case Some(tz) if tz != GenTzMixed && tz != sessionTz(spark) =>
        writeGeneratedSidecar(spark, dir,
          generatedIn(fs, dir), Some(GenTzMixed))
      case _ => ()
    }

  /** The table's generated columns (name → generation SQL). */
  def tableGeneratedColumns(spark: SparkSession, path: String): Map[String, String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    generatedIn(fs, manifestDirOf(fs, path))
  }

  private def writeGeneratedSidecar(spark: SparkSession, dir: String,
      gens: Map[String, String], tz: Option[String]): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir, s".generated-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(constraintsToJson(
        tz.fold(gens)(t => gens.updated(GenTzKey, t)))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(tmp.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new Path(dir, GeneratedFile),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Declare existing column `name` as GENERATED ALWAYS AS
    * (`exprSql`). The column must already be in the table schema
    * (declare it at creation by materializing the expression once);
    * existing rows are validated against the expression through the
    * paired `_gen_<name>` CHECK constraint (`validate = false` for
    * the monitoring-only rollout, like [[addCheckConstraint]]).
    * From then on appends may simply OMIT the column.
    *
    * Crash consistency: the constraint registers first; if the
    * sidecar write is lost, enforcement still holds and a batch
    * omitting the column fails the plain schema check — fail-safe,
    * never silent drift.
    */
  def addGeneratedColumn(spark: SparkSession, path: String, name: String,
      exprSql: String, validate: Boolean = true): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    require(fs.exists(new Path(dir, SchemaFile)),
      s"$path is not a stats table with a schema sidecar; use writeWithStats first")
    // works on partitioned tables too — a generated PARTITION column
    // computes in the append hook BEFORE partition routing (Delta's
    // generated-partition-column shape), and the paired _gen_ CHECK
    // enforces supplied values at the staged choke point, partition
    // dirs discovered back into the staged read
    val schema = tableSchemaIn(spark, path, dir)
    require(schema.fieldNames.contains(name),
      s"generated column $name must already exist in the table schema " +
        s"[${schema.fieldNames.sorted.mkString(",")}] — materialize it once at " +
        "creation, then declare it")
    val gens = generatedIn(fs, dir)
    require(!gens.contains(name),
      s"column $name is already generated on $path (as: ${gens(name)})")
    addCheckConstraint(spark, path, s"_gen_$name",
      s"`$name` <=> ($exprSql)", validate)
    // first generated column records the session timezone the stored
    // values live under (see [[GenTzKey]]); later declarations keep
    // the existing record — a legacy table with generated columns
    // but no record stays unknown (temporal derivation off)
    val tz = if (gens.isEmpty) Some(sessionTz(spark))
      else generatedTzIn(fs, dir)
    writeGeneratedSidecar(spark, dir, gens.updated(name, exprSql), tz)
  }

  /** Remove the generation (column and data stay; the paired CHECK
    * constraint is dropped too). Loud if absent.
    */
  def dropGeneratedColumn(spark: SparkSession, path: String, name: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val gens = generatedIn(fs, dir)
    require(gens.contains(name), s"no generated column $name on $path " +
      s"(have: ${gens.keys.toSeq.sorted.mkString(",")})")
    // sidecar first: a crash between the two leaves enforcement
    // without compute — appends omitting the column fail the schema
    // check loudly instead of silently diverging
    writeGeneratedSidecar(spark, dir, gens.removed(name),
      generatedTzIn(fs, dir))
    dropCheckConstraint(spark, path, s"_gen_$name")
  }

  // -----------------------------------------------------------------
  // Identity columns (see [[IdentityFile]])
  // -----------------------------------------------------------------

  /** Parsed identity spec: (start, step, next id to issue). */
  private[sources] final case class IdentitySpec(start: Long, step: Long, next: Long)

  private[sources] def identityIn(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Map[String, IdentitySpec] =
    readSidecarIn(fs, dir, IdentityFile)
      .map(constraintsFromJson).getOrElse(Map.empty)
      .map { case (n, v) =>
        val parts = v.split(",", 3)
        require(parts.length == 3, s"malformed identity spec for $n: $v")
        n -> IdentitySpec(parts(0).toLong, parts(1).toLong, parts(2).toLong)
      }

  private def writeIdentitySidecar(spark: SparkSession, dir: String,
      ids: Map[String, IdentitySpec]): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir, s".identity-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(constraintsToJson(ids.map { case (n, s) =>
        n -> s"${s.start},${s.step},${s.next}" })
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(tmp.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new Path(dir, IdentityFile),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The table's identity columns (name → (start, step, next)). */
  def tableIdentityColumns(spark: SparkSession,
      path: String): Map[String, (Long, Long, Long)] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    identityIn(fs, manifestDirOf(fs, path))
      .map { case (n, s) => n -> (s.start, s.step, s.next) }
  }

  /** Declare existing LONG column `name` as GENERATED ALWAYS AS
    * IDENTITY (START WITH `start` STEP `step`). The column must
    * already exist (bootstrap its initial values at creation — e.g.
    * a deterministic row_number — then declare); the watermark
    * resolves PAST every stored value on the `start + k*step` grid,
    * so already-issued ids can never repeat. From then on every
    * append must OMIT the column and the engine assigns fresh ids
    * (see [[IdentityFile]]).
    */
  def addIdentityColumn(spark: SparkSession, path: String, name: String,
      start: Long = 1L, step: Long = 1L): Unit = {
    require(step != 0L, "identity step must be non-zero")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    require(fs.exists(new Path(dir, SchemaFile)),
      s"$path is not a stats table with a schema sidecar; use writeWithStats first")
    // identity on a PARTITION column is refused: every row would get
    // a fresh id = its own directory (Delta refuses this pairing too);
    // identity on DATA columns of a partitioned table works — the
    // assignment hook runs before partition routing
    require(!partitionColsIn(fs, dir).contains(name),
      s"identity column $name cannot be a partition column of $path — " +
        "each row's fresh id would become its own partition directory")
    val schema = tableSchemaIn(spark, path, dir)
    val field = schema.find(_.name == name)
    require(field.isDefined,
      s"identity column $name must already exist in the table schema " +
        s"[${schema.fieldNames.sorted.mkString(",")}] — bootstrap its values " +
        "once at creation, then declare it")
    require(field.get.dataType == org.apache.spark.sql.types.LongType,
      s"identity column $name must be BIGINT, is ${field.get.dataType.simpleString}")
    val ids = identityIn(fs, dir)
    require(!ids.contains(name), s"column $name is already an identity column")
    require(!generatedIn(fs, dir).contains(name),
      s"column $name is a generated column — it cannot also be identity")
    // one agg scan resolves the watermark past existing ids on the
    // grid (declaration-time only; appends never re-scan)
    val extreme = readSkipping(spark, path,
        col(name).isNotNull || col(name).isNull)
      .agg((if (step > 0) max(col(name)) else min(col(name))).as("m")).head()
    val next =
      if (extreme.isNullAt(0)) start
      else {
        val m = extreme.getLong(0)
        // first grid point strictly past m (in step direction), >= start
        if (step > 0) {
          if (m < start) start
          else start + step * (Math.floorDiv(m - start, step) + 1)
        } else {
          if (m > start) start
          else start + step * (Math.floorDiv(start - m, -step) + 1)
        }
      }
    writeIdentitySidecar(spark, dir, ids.updated(name,
      IdentitySpec(start, step, next)))
  }

  /** Remove the identity declaration (column and data stay). Loud if
    * absent.
    */
  def dropIdentityColumn(spark: SparkSession, path: String, name: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val ids = identityIn(fs, dir)
    require(ids.contains(name), s"no identity column $name on $path " +
      s"(have: ${ids.keys.toSeq.sorted.mkString(",")})")
    writeIdentitySidecar(spark, dir, ids.removed(name))
  }

  /** Assign fresh identity ids to `batch` for every declared identity
    * column (all of which the batch must omit) and advance the
    * watermark sidecar-first. Returns the batch unchanged when the
    * table has no identity columns, else `(batch with ids, pinned)`
    * where `pinned` must be unpersisted by the caller after the
    * write lands. See [[IdentityFile]] for the allocation shape.
    */
  private def assignIdentity(spark: SparkSession, dir: String,
      batch: DataFrame): (DataFrame, Option[DataFrame]) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = identityIn(fs, dir)
    if (ids.isEmpty) return (batch, None)
    ids.keys.foreach(n => require(!batch.columns.contains(n),
      s"column $n is GENERATED ALWAYS AS IDENTITY — the batch must omit " +
        "it; the engine assigns ids"))
    val rowBits = 33 // monotonically_increasing_id: pid << 33 | row
    val pinned = batch
      .withColumn("__graft_mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pid = shiftright(col("__graft_mid"), rowBits).cast("int")
    // O(partitions) rows to the driver — the partition-count pattern
    val counts = pinned.groupBy(pid.as("__graft_pid"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    if (total == 0L) {
      pinned.unpersist()
      val withCols = ids.keys.toSeq.sorted.foldLeft(batch) {
        (acc, n) => acc.withColumn(n, lit(null).cast("bigint"))
      }
      return (withCols.limit(0), None)
    }
    val offsets = counts.scanLeft((0, 0L)) {
      case ((_, acc), (p, n)) => (p, acc + n)
    }.tail.zip(counts).map { case ((p, cum), (_, n)) => (p, cum - n) }
    val offsetsDf = spark.createDataFrame(offsets.toSeq)
      .toDF("__graft_pid", "__graft_off")
    val rank = col("__graft_off") +
      col("__graft_mid").bitwiseAND((1L << rowBits) - 1)
    // watermark advances BEFORE any data lands: crash = gap, never a
    // duplicate id
    writeIdentitySidecar(spark, dir, ids.map { case (n, s) =>
      n -> s.copy(next = s.next + s.step * total) })
    val withIds = ids.toSeq.sortBy(_._1).foldLeft(
        pinned.withColumn("__graft_pid", pid)
          .join(broadcast(offsetsDf), Seq("__graft_pid"))) {
      case (acc, (n, s)) =>
        acc.withColumn(n, lit(s.next) + lit(s.step) * rank)
    }.drop("__graft_pid", "__graft_mid", "__graft_off")
    (withIds, Some(pinned))
  }

  // -----------------------------------------------------------------
  // Column mapping: RENAME / DROP COLUMN (the Delta column-mapping
  // 'name'-mode analog)
  // -----------------------------------------------------------------

  /** Logical→physical column-name map (`_colmap.json`, same JSON
    * string-map codec as `_constraints.json`). PHYSICAL names — what
    * the data files, manifest stats, deletion vector and change data
    * are keyed by — never change after a file is written; a RENAME
    * changes only which logical name maps to a physical, and a DROP
    * removes the logical entry while the physical column simply stops
    * being projected (zero data rewritten in both cases — the whole
    * point at 100 TB). Absent sidecar = identity mapping (the
    * pre-mapping table every writeWithStats produces). The sidecar
    * rides every generation forward like `_constraints.json`; RESTORE
    * takes the TARGET version's map (a rename is schema metadata, and
    * restore restores schema); clones carry it.
    *
    * Boundary semantics, pinned by ColumnMappingSpec:
    *  - every BATCH entry point speaks LOGICAL names (read
    *    predicates, DML predicates/SET exprs, merge sources and key
    *    columns, append batches) and every batch read RETURNS logical
    *    columns; pruning still happens on the physical stats.
    *  - a dropped-then-re-added logical name binds to a FRESH
    *    physical column, so old values can never resurrect (Delta's
    *    drop semantics). Re-adds arrive via mergeSchema appends.
    *  - STREAMING sources ([[graft.streaming.StatsTableSource]],
    *    [[graft.streaming.ChangeFeedSource]]) REFUSE a non-identity
    *    mapping loudly — Delta likewise blocks streaming reads from
    *    renamed/dropped tables without a schema-tracking location;
    *    serving physical names silently would be a correctness trap.
    *  - CHECK constraints bind to PHYSICAL names (exprs given to
    *    [[addCheckConstraint]] are translated at registration), so a
    *    rename never breaks enforcement; dropping a constrained
    *    column is refused until the constraint is dropped.
    */
  val ColMapFile = "_colmap.json"

  private[sources] def colMapIn(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Option[Map[String, String]] =
    readSidecarIn(fs, dir, ColMapFile).map(constraintsFromJson)

  private def writeColMap(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, m: Map[String, String]): Unit = {
    val out = fs.create(new Path(dir, ColMapFile), true)
    try out.write(constraintsToJson(m)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The current logical→physical map (identity entries for every
    * column when no rename/drop ever happened).
    */
  def columnMapping(spark: SparkSession, path: String): Map[String, String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    colMapIn(fs, dir).getOrElse(
      tableSchemaIn(spark, path, dir).fieldNames.map(n => n -> n).toMap)
  }

  /** True when a rename or drop is in effect (the logical view
    * differs from the physical schema) — the condition under which
    * STREAMING sources refuse the table (Delta's rule without a
    * schema-tracking location: silently serving physical names would
    * be a correctness trap for downstream consumers).
    */
  def hasNonIdentityMapping(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    colMapIn(fs, dir).exists { m =>
      val phys = tableSchemaIn(spark, path, dir).fieldNames.toSet
      m.exists { case (l, p) => l != p } || (phys != m.values.toSet)
    }
  }

  /** The user-facing schema: logical names in PHYSICAL field order
    * (a rename keeps its column's position; a drop removes it).
    */
  def tableLogicalSchema(spark: SparkSession, path: String): StructType = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    logicalSchemaOf(tableSchemaIn(spark, path, dir), colMapIn(fs, dir))
  }

  /** The logical schema AT a retained version (its own mapping). */
  def tableLogicalSchemaAt(spark: SparkSession, path: String,
      version: Long): StructType = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = s"$path/$StatsDir/v$version"
    logicalSchemaOf(tableSchemaIn(spark, path, dir), colMapIn(fs, dir))
  }

  private def logicalSchemaOf(phys: StructType,
      m: Option[Map[String, String]]): StructType = m match {
    case None => phys
    case Some(map) =>
      val inverse = map.map(_.swap)
      StructType(phys.fields.flatMap(f =>
        inverse.get(f.name).map(l => f.copy(name = l))))
  }

  /** Physical scan → logical projection (physical field order). */
  private def toLogicalScan(df: DataFrame, phys: StructType,
      m: Map[String, String]): DataFrame = {
    val inverse = m.map(_.swap)
    df.select(phys.fields.toSeq.flatMap(f =>
      inverse.get(f.name).map(l => col(f.name).as(l))): _*)
  }

  /** Rename an input DataFrame's LOGICAL columns to physical names
    * (columns not in the map — e.g. new columns in a mergeSchema
    * append — pass through).
    */
  private def toPhysicalInput(df: DataFrame, m: Map[String, String]): DataFrame =
    df.select(df.columns.toSeq.map(c =>
      col(c).as(m.getOrElse(c, c))): _*)

  /** Translate single-part attribute references in a Column from
    * logical to physical names (pre-analysis — the result resolves
    * against the physical scan).
    */
  private def toPhysicalColumn(c: Column, m: Map[String, String]): Column = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val e = org.apache.spark.sql.graft.ColumnBridge.expression(c)
    val t = e.transform {
      case a: UnresolvedAttribute
          if a.nameParts.size == 1 && m.contains(a.nameParts.head) =>
        UnresolvedAttribute(Seq(m(a.nameParts.head)))
      // merge-clause references qualified by the fixed t/s aliases
      case a: UnresolvedAttribute
          if a.nameParts.size == 2 && Set("t", "s")(a.nameParts.head) &&
            m.contains(a.nameParts(1)) =>
        UnresolvedAttribute(Seq(a.nameParts.head, m(a.nameParts(1))))
    }
    org.apache.spark.sql.graft.ColumnBridge.column(t)
  }

  /** Column names referenced by a SQL boolean expression (used to
    * guard drops and translate constraint registrations).
    */
  private def referencedNames(spark: SparkSession, exprSql: String): Set[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parseExpression(exprSql)
      .collect { case a: UnresolvedAttribute if a.nameParts.size == 1 =>
        a.nameParts.head }.toSet
  }

  /** RENAME COLUMN — metadata-only (the Delta
    * `ALTER TABLE ... RENAME COLUMN` analog under column-mapping
    * 'name' mode): no data file, manifest row, vector or change-data
    * byte is touched; only the logical→physical sidecar changes. The
    * new name must be free among BOTH logical names (obviously) and
    * physical names — logical and physical namespaces must stay
    * disjoint outside identity entries, or input translation would be
    * ambiguous.
    */
  def renameColumn(spark: SparkSession, path: String,
      oldName: String, newName: String): Unit = {
    require(newName.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"invalid column name '$newName'")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    require(fs.exists(new Path(dir, SchemaFile)),
      s"$path is not a stats table with a schema sidecar")
    // partition-converted tables rename fine — partition DIRECTORIES
    // key on the PHYSICAL name, which never changes; only the
    // logical→physical sidecar moves (partition columns included)
    val phys = tableSchemaIn(spark, path, dir)
    val m = colMapIn(fs, dir).getOrElse(
      phys.fieldNames.map(n => n -> n).toMap)
    require(m.contains(oldName),
      s"no column $oldName on $path (have: ${m.keys.toSeq.sorted.mkString(",")})")
    require(!m.contains(newName), s"column $newName already exists on $path")
    require(m(oldName) == newName || !phys.fieldNames.contains(newName),
      s"$newName collides with a physical column name of $path — " +
        "pick a name never used by this table")
    writeColMap(fs, dir, m.removed(oldName).updated(newName, m(oldName)))
  }

  /** DROP COLUMN — metadata-only: the physical column stays in every
    * file (and its stats in the manifest, harmless) but stops being
    * projected, immediately and for O(1) cost. A later mergeSchema
    * append may re-add the same LOGICAL name — it binds to a FRESH
    * physical column, so the dropped values never resurrect.
    * Refused while a CHECK constraint references the column (drop the
    * constraint first — Delta's rule).
    */
  def dropColumn(spark: SparkSession, path: String, name: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    require(fs.exists(new Path(dir, SchemaFile)),
      s"$path is not a stats table with a schema sidecar")
    val phys = tableSchemaIn(spark, path, dir)
    val m = colMapIn(fs, dir).getOrElse(
      phys.fieldNames.map(n => n -> n).toMap)
    require(m.contains(name),
      s"no column $name on $path (have: ${m.keys.toSeq.sorted.mkString(",")})")
    require(m.size > 1, s"cannot drop the last column of $path")
    val physName = m(name)
    // a PARTITION column cannot drop: its values are directory-encoded
    // and every append/DML routes rows by them — a metadata drop would
    // leave the table unwritable (Delta refuses this too). Non-partition
    // columns of a partitioned table drop normally.
    require(!partitionColsIn(fs, dir).contains(physName),
      s"cannot drop $name: it is a partition column of $path (rows route " +
        "by its directory-encoded values) — RENAME is supported; to remove " +
        "it, materialize into a table partitioned differently")
    constraintsIn(fs, dir).foreach { case (cn, expr) =>
      require(!referencedNames(spark, expr).contains(physName),
        s"cannot drop column $name: CHECK constraint $cn ($expr) references " +
          "it — drop the constraint first")
    }
    writeColMap(fs, dir, m.removed(name))
  }

  // --- DML entry points under the mapping: LOGICAL names in, the
  // physical implementations (`...Phys`) below them unchanged ---

  private[sources] def mapPred(spark: SparkSession, path: String, c: Column): Column =
    currentMap(spark, path) match {
      case None => c
      case Some(m) =>
        // resolve against the LOGICAL schema first so a renamed-away
        // or dropped name fails with the standard unresolved-column
        // error instead of silently binding to the physical column
        val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dir = manifestDirOf(fs, path)
        resolvedCondition(spark,
          logicalSchemaOf(tableSchemaIn(spark, path, dir), Some(m)), c)
        toPhysicalColumn(c, m)
    }

  private def mapSet(spark: SparkSession, path: String,
      set: Map[String, Column]): Map[String, Column] =
    currentMap(spark, path).fold(set)(m =>
      set.map { case (k, v) => mapStatsKey(m, k) -> toPhysicalColumn(v, m) })

  private def mapDfCols(spark: SparkSession, path: String,
      df: DataFrame, keyCols: Seq[String]): (DataFrame, Seq[String]) =
    currentMap(spark, path).fold((df, keyCols))(m =>
      (toPhysicalInput(df, m), keyCols.map(k => m.getOrElse(k, k))))

  /** Row-level DELETE (copy-on-write); see [[deleteWherePhys]]. */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column,
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs): Long =
    deleteWherePhys(spark, path, mapPred(spark, path, predicate),
      vacuum, retentionMs, markerRetentionMs)

  /** Row-level UPDATE (copy-on-write); see [[updateWherePhys]]. */
  def updateWhere(spark: SparkSession, path: String, predicate: Column,
      set: Map[String, Column],
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs): Long = {
    requireNotIdentity(spark, path, set.keys, "UPDATE")
    updateWherePhys(spark, path, mapPred(spark, path, predicate),
      mapSet(spark, path, set), vacuum, retentionMs, markerRetentionMs)
  }

  /** GENERATED ALWAYS AS IDENTITY columns cannot be assigned. */
  private def requireNotIdentity(spark: SparkSession, path: String,
      assigned: Iterable[String], op: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = identityIn(fs, manifestDirOf(fs, path)).keySet
    val hit = assigned.filter(ids)
    require(hit.isEmpty,
      s"$op cannot assign identity column(s) ${hit.toSeq.sorted.mkString(",")} " +
        "— ids are GENERATED ALWAYS and never reassigned")
  }

  /** Merge-on-read DELETE (deletion vector); see [[deleteWhereDVPhys]]. */
  def deleteWhereDV(spark: SparkSession, path: String, predicate: Column,
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs): Long =
    deleteWhereDVPhys(spark, path, mapPred(spark, path, predicate),
      vacuum, retentionMs, markerRetentionMs)

  /** Merge-on-read UPDATE (deletion vector); see [[updateWhereDVPhys]]. */
  def updateWhereDV(spark: SparkSession, path: String, predicate: Column,
      set: Map[String, Column],
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs): Long = {
    requireNotIdentity(spark, path, set.keys, "UPDATE")
    updateWhereDVPhys(spark, path, mapPred(spark, path, predicate),
      mapSet(spark, path, set), vacuum, retentionMs, markerRetentionMs)
  }

  /** Atomic keyed replace; see [[replaceKeyedPhys]]. */
  def replaceKeyed(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String],
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs,
      txn: Option[(String, Long)] = None): (Long, Long) = {
    val (src, keys) = mapDfCols(spark, path, source, keyCols)
    replaceKeyedPhys(spark, path, src, keys, vacuum, retentionMs,
      markerRetentionMs, txn)
  }

  /** Keyed MERGE DELETE arm; see [[mergeDeletePhys]]. */
  def mergeDelete(spark: SparkSession, path: String, keys: DataFrame,
      keyCols: Seq[String],
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs,
      txn: Option[(String, Long)] = None): Long = {
    val (src, kc) = mapDfCols(spark, path, keys, keyCols)
    mergeDeletePhys(spark, path, src, kc, vacuum, retentionMs,
      markerRetentionMs, txn)
  }

  /** Keyed MERGE upsert; see [[mergeUpsertPhys]]. */
  def mergeUpsert(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String],
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs,
      txn: Option[(String, Long)] = None,
      mergeSchema: Boolean = false): (Long, Long) = {
    val (src, keys) = mapDfCols(spark, path, source, keyCols)
    mergeUpsertPhys(spark, path, src, keys, vacuum, retentionMs,
      markerRetentionMs, txn, mergeSchema)
  }

  /** Live violation counts per constraint, `(constraint, violations)`
    * ordered by name — the monitoring surface for `validate = false`
    * rollouts and post-RESTORE audits. One pruned scan, one agg pass
    * for ALL constraints.
    */
  def constraintViolations(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val cons = constraintsIn(fs, dir)
    val rows = violationCounts(readSkippingIn(spark, path, dir, lit(true)), cons)
      .getOrElse(Seq.empty)
      .map { case (n, c) => Row(n, c) }
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
      StructType(Seq(
        StructField("constraint", org.apache.spark.sql.types.StringType,
          nullable = false),
        StructField("violations", org.apache.spark.sql.types.LongType,
          nullable = false))))
  }

  /** Validate freshly STAGED files against the table's constraints
    * before they become visible; on violation the staging dir is
    * deleted and the op aborts loudly — the commit choke point for
    * both appends and DML rewrites.
    */
  private def enforceConstraintsOnStaged(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: String,
      staging: Path, schema: StructType, op: String): Unit = {
    val cons = constraintsIn(fs, dir)
    if (cons.isEmpty) return
    // a partitioned stage nests its parts under col=value dirs; the
    // partition-discovering read below serves those columns back so
    // constraints over them are enforced too
    def hasParts(p: Path): Boolean = fs.exists(p) && fs.listStatus(p)
      .exists(f => (f.isFile && f.getPath.getName.endsWith(".parquet")) ||
        (f.isDirectory && !f.getPath.getName.startsWith(".") &&
          hasParts(f.getPath)))
    if (!hasParts(staging)) return
    val staged = spark.read.schema(schema).parquet(staging.toString)
    violationCounts(staged, cons).foreach { counts =>
      val bad = counts.filter(_._2 > 0L)
      if (bad.nonEmpty) {
        fs.delete(staging, true)
        throw new IllegalArgumentException(
          s"$op aborted: CHECK constraint violation(s) in the batch — " +
            bad.map { case (n, c) => s"$n: $c row(s) (${cons(n)})" }
              .mkString("; ") + " — nothing was committed")
      }
    }
  }

  /** The generation's idempotent-writer map (see [[TxnFile]]):
    * previous generation's map carried forward, merged with this
    * op's stamp (a replayed version never lowers the watermark —
    * `max` keeps the map monotonic per app id).
    */
  private def writeTxnFile(fs: org.apache.hadoop.fs.FileSystem,
      prevDir: String, build: Path, txn: Option[(String, Long)]): Unit = {
    val prev = readSidecarIn(fs, prevDir, TxnFile)
      .map(txnMapFromJson).getOrElse(Map.empty)
    val merged = txn.fold(prev) { case (app, v) =>
      prev.updated(app, prev.get(app).fold(v)(_ max v))
    }
    if (merged.nonEmpty) {
      val out = fs.create(new Path(build, TxnFile), true)
      try out.write(txnMapToJson(merged)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Last transaction version stamped for `appId` on this table, or
    * None if the app never committed here — the idempotent-replay
    * check (Delta's `txnVersion(appId)`). O(1): one sidecar read of
    * the current generation.
    */
  def txnVersion(spark: SparkSession, path: String, appId: String): Option[Long] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    readSidecarIn(fs, manifestDirOf(fs, path), TxnFile)
      .flatMap(j => txnMapFromJson(j).get(appId))
  }

  /** `<table-root-relative path>\t<removedAtMillis>` lines. */
  private def writeRemovalLog(fs: org.apache.hadoop.fs.FileSystem,
      gen: Path, entries: Seq[(String, Long)]): Unit =
    if (entries.nonEmpty) {
      val out = fs.create(new Path(gen, RemovedFile), true)
      try out.write(entries.map { case (p, t) => s"$p\t$t" }.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }

  private def readRemovalLog(fs: org.apache.hadoop.fs.FileSystem,
      gen: Path): Seq[(String, Long)] =
    readSidecarIn(fs, gen.toString, RemovedFile)
      .map(_.linesIterator.filter(_.nonEmpty).map { line =>
        val i = line.lastIndexOf('\t')
        line.substring(0, i) -> line.substring(i + 1).toLong
      }.toSeq).getOrElse(Seq.empty)

  /** Retention-aware reclamation (the Delta VACUUM analog): delete
    *  - files/dirs in the removal logs whose removal is older than
    *    `retentionMs` (replaced data files, superseded generations,
    *    migrated legacy manifests),
    *  - visible data files no manifest claims and no log records
    *    (crashed-append orphans) whose MTIME is older than
    *    `retentionMs`,
    *  - hidden staging dirs and uncommitted generation debris older
    *    than `retentionMs`.
    * Nothing younger is touched, so any reader that planned within
    * the window completes against intact files. With the default
    * window this is safe to run alongside readers; `retentionMs = 0`
    * reclaims everything immediately and needs reader exclusivity.
    */
  def vacuumTable(spark: SparkSession, path: String,
      retentionMs: Long = RetentionDefaultMs): Unit = {
    vacuumImpl(spark, path, retentionMs, delete = true); ()
  }

  /** `VACUUM ... DRY RUN` — the files a vacuum at `retentionMs`
    * would delete right now, without deleting anything. Same four
    * passes, same guards, purely observational.
    */
  def vacuumDryRun(spark: SparkSession, path: String,
      retentionMs: Long = RetentionDefaultMs): Seq[String] =
    vacuumImpl(spark, path, retentionMs, delete = false)

  private def vacuumImpl(spark: SparkSession, path: String,
      retentionMs: Long, delete: Boolean): Seq[String] = {
    require(retentionMs >= 0, "retentionMs must be >= 0")
    val targets = scala.collection.mutable.ArrayBuffer.empty[String]
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def act(p: Path, recursive: Boolean): Unit = {
      targets += p.toString
      if (delete) fs.delete(p, recursive)
    }
    val statsDir = new Path(s"$path/$StatsDir")
    if (!fs.exists(statsDir)) return targets.toSeq
    val now = System.currentTimeMillis()
    def expired(t: Long): Boolean = now - t >= retentionMs
    val gens = genDirs(fs, statsDir)
    val current = currentGen(fs, statsDir)

    // Claim set = the current manifest's file names (tolerating a
    // freshly bootstrapped table whose manifest has no parts yet).
    // Computed FIRST: it guards BOTH deletion passes below.
    val claimed: Set[String] = {
      val dir = manifestDirOf(fs, path)
      val hasParts = fs.exists(new Path(dir)) && fs.listStatus(new Path(dir))
        .exists(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      if (!hasParts) Set.empty
      else readManifestIn(spark, dir).select("file").collect()
        .map(r => new Path(r.getString(0)).getName).toSet
    }

    // 1. removal-log entries past retention (from every generation
    //    still on disk — a superseded generation's log stays
    //    actionable until the generation itself expires, which by
    //    construction happens after everything it recorded)
    val recorded = gens.flatMap { case (_, f) => readRemovalLog(fs, f.getPath) }
    recorded.foreach { case (rel, t) =>
      if (expired(t)) {
        val p = new Path(path, rel)
        // never delete the current generation or a live data file the
        // current manifest claims (paranoia: removal logs only ever
        // record superseded state, but a bad entry must not cascade)
        val isCurrentGen = current.exists(_._2.toString == fs.makeQualified(p).toString)
        if (!isCurrentGen && !claimed(p.getName) && fs.exists(p))
          act(p, true)
      }
    }
    val recordedNames = recorded.map { case (rel, _) => new Path(rel).getName }.toSet

    // 2. unrecorded visible orphans (crashed appends): mtime-gated.
    // A partition-converted table's orphans live INSIDE `col=value`
    // dirs (crashed partitioned append/DML moved files before the
    // generation commit) — walk those too; the claim/record guards
    // compare by (job-UUID-unique) name, so depth changes nothing.
    // 3. stale staging dirs (crashed append/compact debris), any depth.
    //
    // The walk is LEVEL-WISE: a level whose directory fan-out exceeds
    // a driver threshold is listed in ONE DISTRIBUTED pass (each task
    // lists a slice of dirs) — a 10^4-partition table costs
    // O(dirs / parallelism) listing round-trips instead of 10^4
    // sequential driver calls, which on an object store is the
    // difference between seconds and tens of minutes (the r15 ramp
    // measured the sequential walk at ~5x cost across the 100→10^4
    // dir decade even on local fs).
    val stagingPrefixes =
      Seq(".append-", ".compact-", ".stats-", ".markers-",
        ".overwrite-staging-", SwapPrefix)
    // `col=value` descent stays gated on the CURRENT generation's
    // partitioning: descending unconditionally could reclaim a user's
    // unrelated `a=b` subdirectory under a flat table. The one shape
    // this leaves behind — a PARTITIONED overwrite that crashed after
    // move-in over a still-flat table — strands bounded, invisible
    // debris that the next successful partitioned overwrite's vacuum
    // sweeps (the table is partitioned by then).
    val partitioned = partitionColsIn(fs, manifestDirOf(fs, path)).nonEmpty
    val retention = retentionMs
    var level: Seq[Path] = Seq(new Path(path))
    var depth = 0
    while (level.nonEmpty && depth <= 16) {
      val entries: Seq[(String, String)] =
        if (level.size <= 256) {
          level.flatMap(d => fs.listStatus(d).toSeq).flatMap { f =>
            val n = f.getPath.getName
            if (f.isFile && !n.startsWith("_") && !n.startsWith(".") &&
                !claimed(n) && !recordedNames(n) &&
                expired(f.getModificationTime))
              Seq(("file", f.getPath.toString))
            else if (f.isDirectory && stagingPrefixes.exists(n.startsWith) &&
                expired(f.getModificationTime))
              Seq(("staging", f.getPath.toString))
            else if (f.isDirectory && partitioned &&
                !n.startsWith("_") && !n.startsWith(".") && n.contains("="))
              Seq(("dir", f.getPath.toString))
            else Nil
          }
        } else {
          // identical per-entry rules, evaluated in executor tasks;
          // the Hadoop conf travels as plain properties (no
          // non-serializable Configuration in the closure)
          val confProps: Seq[(String, String)] = {
            val it = spark.sparkContext.hadoopConfiguration.iterator()
            val b = Seq.newBuilder[(String, String)]
            while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
            b.result()
          }
          val claimedB = spark.sparkContext.broadcast(claimed)
          val recordedB = spark.sparkContext.broadcast(recordedNames)
          val (now0, sp, isPart) = (now, stagingPrefixes, partitioned)
          val dirs = level.map(_.toString)
          val out = spark.sparkContext
            .parallelize(dirs, math.min(dirs.size, 512))
            .mapPartitions { it =>
              val conf = new org.apache.hadoop.conf.Configuration(false)
              confProps.foreach { case (k, v) => conf.set(k, v) }
              it.flatMap { d =>
                val p = new Path(d)
                val efs = p.getFileSystem(conf)
                def exp(t: Long): Boolean = now0 - t >= retention
                efs.listStatus(p).iterator.flatMap { f =>
                  val n = f.getPath.getName
                  if (f.isFile && !n.startsWith("_") && !n.startsWith(".") &&
                      !claimedB.value(n) && !recordedB.value(n) &&
                      exp(f.getModificationTime))
                    Iterator(("file", f.getPath.toString))
                  else if (f.isDirectory && sp.exists(n.startsWith) &&
                      exp(f.getModificationTime))
                    Iterator(("staging", f.getPath.toString))
                  else if (f.isDirectory && isPart &&
                      !n.startsWith("_") && !n.startsWith(".") &&
                      n.contains("="))
                    Iterator(("dir", f.getPath.toString))
                  else Iterator.empty
                }
              }
            }.collect().toSeq
          claimedB.destroy(); recordedB.destroy()
          out
        }
      entries.foreach {
        case ("file", p) => act(new Path(p), false)
        case ("staging", p) => act(new Path(p), true)
        case _ => ()
      }
      level = entries.collect { case ("dir", p) => new Path(p) }
      depth += 1
    }
    // 4. uncommitted generation debris and crashed generation builds
    gens.foreach { case (_, f) =>
      if (!isCommittedGen(fs, f.getPath) && expired(f.getModificationTime))
        act(f.getPath, true)
    }
    fs.listStatus(statsDir).foreach { f =>
      if (f.isDirectory && f.getPath.getName.startsWith(".genbuild-") &&
          expired(f.getModificationTime))
        act(f.getPath, true)
    }
    targets.toSeq
  }

  /** The table's persisted schema (what a pruned or streaming read
    * plans with — no data-file footer is touched when the sidecar
    * exists).
    */
  def tableSchema(spark: SparkSession, path: String): StructType =
    tableSchemaIn(spark, path, manifestDir(spark, path))

  /** Table schema from the manifest sidecar; falls back to reading
    * the data files (a listing + footer) for pre-sidecar manifests.
    */
  private def tableSchemaIn(spark: SparkSession, path: String,
      dir: String): StructType =
    readSidecar(spark, dir, SchemaFile) match {
      case Some(json) =>
        DataType.fromJson(json).asInstanceOf[StructType]
      case None => spark.read.parquet(path).schema
    }

  /** The user predicate analyzed against the table schema (via an
    * empty local relation — NO file listing or footer read), as the
    * resolved Filter condition the min/max rewriter consumes.
    */
  private def resolvedCondition(
      spark: SparkSession, schema: StructType, predicate: Column): Expression =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
      .filter(predicate)
      .queryExecution.analyzed
      .collectFirst { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition }
      .getOrElse(sys.error("predicate did not analyze to a Filter"))

  /** Committed manifest generations (ascending) — the TIME-TRAVEL
    * surface. Generations freeze at maintenance boundaries: appends
    * land in the NEWEST generation, so generation N holds exactly the
    * table state at the moment generation N+1 was committed (and the
    * newest one is the live state). Superseded generations and the
    * data files they reference survive for `retentionMs` after
    * replacement (see [[vacuumTable]]) — the same window bounds how
    * far back [[readSkippingAt]] can read, exactly Delta's
    * time-travel-vs-VACUUM coupling. Empty for a legacy flat-manifest
    * table (no history is recorded there).
    */
  def tableVersions(spark: SparkSession, path: String): Seq[Long] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    genDirs(fs, new Path(s"$path/$StatsDir"))
      .filter { case (_, f) => isCommittedGen(fs, f.getPath) }
      .map(_._1)
  }

  /** [[readSkipping]] against a RETAINED manifest generation — the
    * Delta `VERSION AS OF` analog at maintenance granularity. Fails
    * loudly (with the retained range) for a version that is not on
    * disk; note a version older than the vacuum retention may name
    * data files that are already gone.
    */
  def readSkippingAt(spark: SparkSession, path: String, version: Long,
      predicate: Column): DataFrame = {
    val have = tableVersions(spark, path)
    require(have.contains(version),
      s"version $version of $path is not retained (have " +
        s"${have.mkString("[", ",", "]")}) — superseded generations are " +
        "vacuumed retentionMs after replacement; raise the retention to " +
        "time-travel further back")
    // time travel reads under the VERSION'S OWN column mapping — a
    // read at a pre-rename version shows the names of that time
    readSkippingMapped(spark, path, s"$path/$StatsDir/v$version", predicate)
  }

  /** The table's CHANGE DATA FEED over committed versions
    * `[fromVersion, toVersion]` (default: through the latest) — the
    * Delta `table_changes(...)` analog. Returns the table columns
    * plus `_change_type` (`insert` / `delete` / `update_preimage` /
    * `update_postimage`) and `_commit_version`; rows in each version
    * are read through THAT generation's schema sidecar and united by
    * name, so the feed spans schema evolution (pre-evolution change
    * rows carry nulls for later columns).
    *
    * Only row-level DML generations carry change rows: compaction and
    * Z-ORDER record nothing (no logical change), and appends land
    * inside a generation, not at a version boundary — consume appends
    * as inserts through [[graft.streaming.StatsTableSource]] (exactly
    * Delta's insert-only-commit path) and this feed for the DML
    * deltas. Fails loudly when `fromVersion` predates the retained
    * history (the feed's availability window IS the vacuum retention
    * — the change files live inside the generation dirs) or when the
    * feed was never enabled ([[writeWithStats]] `changeFeed = true`
    * or [[enableChangeFeed]]).
    */
  def readChangeFeed(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Option[Long] = None): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(cdfEnabled(fs, manifestDirOf(fs, path)),
      s"$path has no change data feed — create with writeWithStats(" +
        "changeFeed = true) or call enableChangeFeed first")
    val have = tableVersions(spark, path)
    require(have.nonEmpty,
      s"$path is a legacy flat-manifest table with no version history — " +
        "run compactTable once to migrate it to generations")
    val hi = toVersion.getOrElse(have.max)
    require(fromVersion <= hi,
      s"fromVersion $fromVersion must be <= toVersion $hi")
    require(hi <= have.max,
      s"toVersion $hi is beyond the latest committed version ${have.max}")
    require(fromVersion >= have.min,
      s"version $fromVersion of $path is not retained (have " +
        s"${have.mkString("[", ",", "]")}) — change data lives inside the " +
        "generation dirs and is vacuumed with them; raise the retention " +
        "to read further back")
    val frames = have.filter(v => v >= fromVersion && v <= hi).flatMap { v =>
      val gen = s"$path/$StatsDir/v$v"
      val cd = new Path(gen, ChangeDataDir)
      if (!fs.exists(cd)) None
      else {
        val genSchema = tableSchemaIn(spark, path, gen)
        val withType = StructType(genSchema.fields :+
          StructField(ChangeTypeCol, org.apache.spark.sql.types.StringType))
        Some(spark.read.schema(withType).parquet(cd.toString)
          .withColumn(CommitVersionCol, lit(v)))
      }
    }
    val raw =
      if (frames.isEmpty) {
        val empty = StructType(tableSchema(spark, path).fields ++ Seq(
          StructField(ChangeTypeCol, org.apache.spark.sql.types.StringType),
          StructField(CommitVersionCol, org.apache.spark.sql.types.LongType,
            nullable = false)))
        spark.createDataFrame(java.util.Collections.emptyList[Row](), empty)
      }
      else frames.reduce(_.unionByName(_, allowMissingColumns = true))
    // change files are keyed by stable PHYSICAL names (which is what
    // lets the feed span renames); consumers see the CURRENT logical
    // view, like a Delta CDF read under column mapping
    colMapIn(fs, manifestDirOf(fs, path)) match {
      case None => raw
      case Some(m) =>
        val phys = tableSchemaIn(spark, path, manifestDirOf(fs, path))
        val inverse = m.map(_.swap)
        raw.select(phys.fields.toSeq.flatMap(f =>
          inverse.get(f.name).map(l => col(f.name).as(l))) ++
          Seq(col(ChangeTypeCol), col(CommitVersionCol)): _*)
    }
  }

  /** Resolve a wall-clock instant to a table version — the Delta
    * `TIMESTAMP AS OF` analog: the LATEST retained version whose
    * commit instant (the `_COMMIT` create, the atomic visibility
    * point) is <= `tsMillis`. Loud when the instant predates the
    * earliest retained version (vacuumed history cannot be read —
    * same error `VERSION AS OF` raises) and when it precedes nothing.
    */
  def versionAtTime(spark: SparkSession, path: String,
      tsMillis: Long): Long = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statsDir = new Path(s"$path/$StatsDir")
    val commits = genDirs(fs, statsDir)
      .filter { case (_, f) => isCommittedGen(fs, f.getPath) }
      .map { case (v, f) => v -> commitInstant(fs, f.getPath) }
    require(commits.nonEmpty, s"$path has no committed versions")
    val at = commits.filter(_._2 <= tsMillis)
    require(at.nonEmpty,
      s"no version of $path existed at $tsMillis — the earliest retained " +
        s"commit is ${commits.head._2} (v${commits.head._1}); earlier " +
        "history is vacuumed or never existed")
    at.map(_._1).max
  }

  /** `TIMESTAMP AS OF` read: [[readSkippingAt]] of
    * [[versionAtTime]]`(tsMillis)`.
    */
  def readSkippingAtTime(spark: SparkSession, path: String,
      tsMillis: Long, predicate: Column): DataFrame =
    readSkippingAt(spark, path, versionAtTime(spark, path, tsMillis),
      predicate)

  /** One-row table summary — the `DESCRIBE DETAIL` analog: live file
    * count and bytes (manifest sum, no listing), physical row count
    * and deletion-vector entry count (visible rows = n_rows - dv),
    * retained version range, feature flags, tracked stats columns
    * and constraint count. O(manifest) + an O(vector) count.
    */
  /** Live table bytes for PLANNER STATISTICS — the number the
    * optimizer compares against `autoBroadcastJoinThreshold` when a
    * graft table joins by catalog name: manifest sum of live file
    * sizes (the `DESCRIBE DETAIL` `size_bytes`), discounted by the
    * deletion vector's dead-row fraction (a merge-on-read DELETE
    * shrinks the effective relation even though file bytes don't
    * move). One manifest aggregate + an O(vector) count only when a
    * vector exists — no file listing, no data read. None for a
    * legacy manifest without `file_size` (caller keeps Spark's
    * conservative default so a join can never under-plan).
    */
  def tableSizeInBytes(spark: SparkSession, path: String,
      version: Option[Long] = None): Option[Long] = {
    val dir = version match {
      case Some(v) =>
        val have = tableVersions(spark, path)
        require(have.contains(v),
          s"version $v of $path is not retained (have " +
            s"${have.mkString("[", ",", "]")})")
        s"$path/$StatsDir/v$v"
      case None => manifestDir(spark, path)
    }
    val m = readManifestIn(spark, dir)
    if (!m.columns.contains("file_size")) return None
    val hasRows = m.columns.contains("n_rows")
    val aggRow =
      if (hasRows) m.agg(sum(col("file_size")), sum(col("n_rows"))).head()
      else m.agg(sum(col("file_size"))).head()
    if (aggRow.isNullAt(0)) return Some(0L) // empty manifest
    val bytes = aggRow.getLong(0)
    val physRows = if (hasRows && !aggRow.isNullAt(1)) aggRow.getLong(1) else 0L
    val dead = if (physRows > 0L) readDvIn(spark, dir).fold(0L)(_.count()) else 0L
    val live =
      if (dead > 0L)
        math.ceil(bytes.toDouble * (physRows - dead).toDouble / physRows).toLong
      else bytes
    Some(math.max(live, 0L))
  }

  def tableDetail(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val stats = readManifestIn(spark, dir)
    val agg = stats.agg(count(lit(1)), sum(col("file_size")),
      sum(col("n_rows"))).head()
    val versions = tableVersions(spark, path)
    val dvCount = readDvIn(spark, dir).fold(0L)(_.count())
    val row = Row(
      agg.getLong(0),
      if (agg.isNullAt(1)) 0L else agg.getLong(1),
      if (agg.isNullAt(2)) 0L else agg.getLong(2),
      dvCount,
      versions.minOption.getOrElse(-1L), versions.maxOption.getOrElse(-1L),
      manifestFeatures(fs, dir).toSeq.sorted.mkString(","),
      trackedCols(spark, dir).toSeq.sorted.mkString(","),
      constraintsIn(fs, dir).size.toLong)
    val schema = StructType(Seq(
      StructField("num_files", org.apache.spark.sql.types.LongType, false),
      StructField("size_bytes", org.apache.spark.sql.types.LongType, false),
      StructField("num_rows_physical", org.apache.spark.sql.types.LongType, false),
      StructField("dv_entries", org.apache.spark.sql.types.LongType, false),
      StructField("earliest_version", org.apache.spark.sql.types.LongType, false),
      StructField("latest_version", org.apache.spark.sql.types.LongType, false),
      StructField("features", org.apache.spark.sql.types.StringType, false),
      StructField("stats_columns", org.apache.spark.sql.types.StringType, false),
      StructField("num_constraints", org.apache.spark.sql.types.LongType, false)))
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(Seq(row)).asJava, schema)
  }

  /** SHALLOW CLONE (the Delta `CREATE TABLE ... SHALLOW CLONE`
    * analog): create `target` as a stats table whose v0 manifest
    * REFERENCES the source's current data files — nothing is copied
    * except the manifest generation itself (parts, named commit
    * markers, schema/stats/features/constraints sidecars and the
    * deletion vector), so cloning a 100 TB table costs O(manifest).
    * The clone then lives its own life: DML rewrites touched files
    * INTO the clone's root (the source is never written), untouched
    * rows keep reading the source's files, and a compaction/z-order
    * makes the clone fully self-contained. The clone's vacuum can
    * never reclaim source files (removal-log entries resolve under
    * the clone root, where source files don't live; the orphan pass
    * only lists the clone root) — and symmetrically, the SOURCE's
    * vacuum does not know about clones: vacuuming the source past
    * the clone's creation point can break the clone, exactly Delta's
    * documented shallow-clone hazard. Writer lineage does NOT carry:
    * the `_txn.json` idempotency map stays with the source (a writer
    * resuming against the clone is a NEW writer). Returns the number
    * of referenced data files.
    */
  def cloneTable(spark: SparkSession, source: String,
      target: String): Long = {
    val fs = new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcDir = manifestDirOf(fs, source)
    require(fs.exists(new Path(srcDir, SchemaFile)),
      s"$source is not a stats table with a schema sidecar")
    val targetStats = new Path(s"$target/$StatsDir")
    require(!fs.exists(targetStats),
      s"$target already has a stats dir — refusing to overwrite")
    fs.mkdirs(new Path(target))
    val build = new Path(targetStats, s".genbuild-${java.util.UUID.randomUUID}")
    fs.mkdirs(build)
    val conf = spark.sparkContext.hadoopConfiguration
    // manifest parts + named markers, verbatim (marker rows keep
    // replaying exactly; replay protection transfers conservatively)
    fs.listStatus(new Path(srcDir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .foreach(f => org.apache.hadoop.fs.FileUtil.copy(fs, f.getPath,
        fs, new Path(build, f.getPath.getName), false, conf))
    // metadata sidecars — but NOT the txn map (writer lineage), NOT
    // the removal log (the clone must never re-delete source state),
    // NOT the op record (the clone's history starts at CLONE)
    Seq(SchemaFile, StatsColsFile, FeaturesFile, ManifestSchemaFile,
      ConstraintsFile, ColMapFile, GeneratedFile, IdentityFile,
      PartitionColsFile).foreach { n =>
      val p = new Path(srcDir, n)
      if (fs.exists(p))
        org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, new Path(build, n),
          false, conf)
    }
    val dvPath = new Path(srcDir, DvDir)
    if (fs.exists(dvPath))
      org.apache.hadoop.fs.FileUtil.copy(fs, dvPath,
        fs, new Path(build, DvDir), false, conf)
    writeOpFile(fs, build, s"CLONE($source)", System.currentTimeMillis())
    val gen = new Path(targetStats, "v0")
    require(fs.rename(build, gen), s"generation rename $build -> $gen failed")
    commitGen(spark, gen)
    readManifestIn(spark, gen.toString).count()
  }

  /** RESTORE the table to a retained version (the Delta
    * `RESTORE TABLE ... VERSION AS OF` analog): publishes a NEW
    * generation whose manifest, schema, tracked columns and manifest
    * schema are version `version`'s — history is preserved (restore
    * is a commit on top, so a bad restore is itself restorable), and
    * nothing is copied: the old generation's data files are simply
    * re-claimed by the new manifest. Fails loudly when any data file
    * the restored manifest references has already been vacuumed
    * (same failure Delta RESTORE raises) — within the retention
    * window replaced files are still on disk by construction, so a
    * restore inside the window always succeeds. Files the current
    * manifest holds beyond the restored set enter the removal log
    * (they age out through the normal retention vacuum; the vacuum
    * claim-set guard protects them if a later restore-forward
    * re-claims them first).
    *
    * With the change feed enabled, the restore records file-level
    * diff rows the way Delta does: every row of a dropped file as
    * `delete`, every row of a re-added file as `insert` — rows living
    * in files common to both states record nothing. Feature flags
    * carry over from the CURRENT generation for table-property flags
    * (the change feed must not silently vanish) but row-describing
    * flags (null counts, bloom config) come from the RESTORED
    * generation — they describe the restored manifest rows.
    *
    * Stream-aware like DML: the restored generation's named commit
    * markers are copied VERBATIM (an in-flight [[graft.streaming
    * .StatsTableSource]] consumer owing one of them replays its exact
    * rows), and markers existing only in the superseded current
    * generation are re-created zero-row — their rows are not part of
    * the restored state, but their names must keep short-circuiting
    * an at-least-once writer's replays.
    *
    * Single-writer like all maintenance ops. Returns the new
    * generation's version.
    */
  def restoreTable(spark: SparkSession, path: String, version: Long,
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs): Long =
      withConcurrentRetry("restoreTable") {
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    // restore is METADATA-ONLY (old files re-claimed, nothing
    // copied), so partition-converted tables restore too; the CDF
    // diff scans below are part-aware for them
    val have = tableVersions(spark, path)
    require(have.contains(version),
      s"version $version of $path is not retained (have " +
        s"${have.mkString("[", ",", "]")}) — superseded generations are " +
        "vacuumed retentionMs after replacement")
    val vDir = s"$path/$StatsDir/v$version"
    val restored = readManifestIn(spark, vDir)
    val files = restored.select("file").collect().map(_.getString(0)).toSeq
    // ONE listing PER PARENT DIR (the vacuumTable claim-set shape)
    // instead of O(files) serial exists() probes — at object-store
    // latency the per-file HEAD loop would stall the driver for
    // minutes on a large restored manifest. Grouping by parent
    // handles SHALLOW CLONES, whose manifests reference files
    // outside the table root ([[cloneTable]]).
    val byParent = files.groupBy(f =>
      fs.makeQualified(new Path(f)).getParent.toString)
    val missing = byParent.toSeq.flatMap { case (parent, inParent) =>
      val present: Set[String] =
        if (!fs.exists(new Path(parent))) Set.empty
        else fs.listStatus(new Path(parent))
          .filter(_.isFile).map(_.getPath.getName).toSet
      inParent.map(f => new Path(f).getName).filterNot(present)
    }
    require(missing.isEmpty,
      s"cannot restore $path to version $version: ${missing.size} of its " +
        s"data files are already vacuumed (first: ${missing.headOption
          .getOrElse("")}) — raise the retention to keep restore targets " +
        "whole for longer")
    val vSchema = tableSchemaIn(spark, path, vDir)
    val vStatsCols = trackedCols(spark, vDir).toSeq.sorted
    val feats = manifestFeatures(fs, vDir) ++
      manifestFeatures(fs, dir).filter(_ == CdfFeature)
    val vManifestSchema = readSidecar(spark, vDir, ManifestSchemaFile)
      .map(j => DataType.fromJson(j).asInstanceOf[StructType])
      .getOrElse(restored.schema)
    val curSchema = tableSchemaIn(spark, path, dir)
    val curFiles = readManifestIn(spark, dir).select("file").collect()
      .map(_.getString(0)).toSet
    val restoredSet = files.toSet
    val dropped = (curFiles -- restoredSet).toSeq
    val added = (restoredSet -- curFiles).toSeq
    val changes =
      if (!cdfEnabled(fs, dir)) None
      else {
        // each side's rows are its OWN generation's visible rows:
        // dropped files minus the current vector, re-added files
        // minus the restored version's vector
        val dels =
          if (dropped.isEmpty) None
          else Some(applyDv(partAwareStatusScan(spark, path, dir,
                curSchema, statusesFor(fs, dropped)),
              readDvIn(spark, dir))
            .withColumn(ChangeTypeCol, lit("delete")))
        val ins =
          if (added.isEmpty) None
          else Some(applyDv(partAwareStatusScan(spark, path, vDir,
                vSchema, statusesFor(fs, added)),
              readDvIn(spark, vDir))
            .withColumn(ChangeTypeCol, lit("insert")))
        // files COMMON to both states can still change visibility
        // through their deletion vectors: positions dead now but
        // alive at the restored version are RESURRECTED (insert);
        // positions alive now but dead there are re-deleted. Row
        // lookup cost is bounded by the vector sizes, never the
        // files.
        val common = (curFiles & restoredSet).toSeq
        def dvDiff(a: Option[DataFrame], b: Option[DataFrame])
            : Option[DataFrame] = a.map { d =>
          val inCommon = d.join(broadcast(spark.createDataset(common)(
              org.apache.spark.sql.Encoders.STRING).toDF("__c")),
            col("file") === col("__c"), "left_semi")
          b.fold(inCommon)(o => inCommon.join(broadcast(o),
            inCommon("file") === o("file") &&
              inCommon("row_index") === o("row_index"), "left_anti"))
        }
        def rowsAt(positions: Option[DataFrame], schemaX: StructType,
            genDir: String, changeType: String): Option[DataFrame] =
          positions.flatMap { pos =>
            // read ONLY the files the position diff names (the
            // distinct-file list is bounded by the vector, collected
            // once)
            val posFiles = pos.select("file").distinct()
              .collect().map(_.getString(0)).toSeq
            if (posFiles.isEmpty) None
            else {
              val scanDf = partAwareStatusScan(spark, path, genDir,
                schemaX, statusesFor(fs, posFiles))
              Some(scanDf.join(broadcast(pos),
                  scanDf("_metadata.file_path") === pos("file") &&
                    scanDf("_metadata.row_index") === pos("row_index"),
                  "left_semi")
                .withColumn(ChangeTypeCol, lit(changeType)))
            }
          }
        val (curDvF, vDvF) =
          if (common.isEmpty) (None, None)
          else (readDvIn(spark, dir), readDvIn(spark, vDir))
        val resurrected = rowsAt(dvDiff(curDvF, vDvF), vSchema, vDir, "insert")
        val reDeleted = rowsAt(dvDiff(vDvF, curDvF), curSchema, dir, "delete")
        (dels ++ ins ++ resurrected ++ reDeleted).reduceOption(
          _.unionByName(_, allowMissingColumns = true))
      }
    // Build the new generation as a VERBATIM file copy of the
    // restored one — parts stay parts and MARKERS STAY MARKERS. This
    // is what keeps restore stream-aware like DML: a StatsTableSource
    // consumer still owing a batch whose marker exists in the
    // restored generation replays exactly that generation's rows for
    // it (the data files were just verified present). Markers that
    // exist only in the CURRENT generation (landed after the restored
    // state froze, or already folded there) are re-created zero-row:
    // their rows are legitimately not part of the restored state, but
    // their names must keep short-circuiting an at-least-once
    // writer's replays — dropping them would let a replayed batch
    // RE-COMMIT rows the restore removed. (Copied markers get fresh
    // mtimes, so an ancient marker can outlive one extra retention
    // window after a restore — bounded, and erring toward replay
    // protection.)
    val statsDir = new Path(s"$path/$StatsDir")
    // strict observed+1 targeting — see publishGeneration
    val nextV = obsVersionOf(dir)
      .map(_ + 1)
      .getOrElse(genDirs(fs, statsDir).lastOption.map(_._1 + 1).getOrElse(0L))
    val build = new Path(statsDir, s".genbuild-${java.util.UUID.randomUUID}")
    fs.mkdirs(build)
    val conf = spark.sparkContext.hadoopConfiguration
    val copiedMarkers = fs.listStatus(new Path(vDir)).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map { f =>
        org.apache.hadoop.fs.FileUtil.copy(fs, f.getPath,
          fs, new Path(build, f.getPath.getName), false, conf)
        f.getPath.getName
      }
      .filterNot(_.startsWith("part-")).toSet
    // the restored version's deletion vector IS part of its state —
    // a restore to a DV-bearing version must hide exactly the rows
    // that version hid
    val vDvPath = new Path(vDir, DvDir)
    if (fs.exists(vDvPath))
      org.apache.hadoop.fs.FileUtil.copy(fs, vDvPath,
        fs, new Path(build, DvDir), false, conf)
    writeSidecars(spark, build.toString, vSchema, vStatsCols, feats,
      manifestSchema = Some(vManifestSchema))
    // the idempotent-writer watermarks ride the CURRENT generation
    // forward like any other op's commit would — restore rewinds the
    // table's CONTENT, never a writer's replay protection (a lost
    // _txn.json would let an at-least-once writer double-apply its
    // in-flight batch right after the restore)
    writeTxnFile(fs, dir, build, txn = None)
    // constraints are table metadata, not content: the CURRENT set
    // carries through a restore (the restored rows are NOT
    // re-validated — audit with constraintViolations)
    Seq(ConstraintsFile, GeneratedFile, IdentityFile).foreach { n =>
      readSidecarIn(fs, dir, n).foreach { j =>
        val out = fs.create(new Path(build, n), true)
        try out.write(j.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
    }
    // the column mapping and the partition-column list are SCHEMA
    // metadata and follow the TARGET version like the schema sidecar
    // does — restoring past a rename restores the old logical names
    Seq(ColMapFile, PartitionColsFile).foreach { n =>
      readSidecarIn(fs, vDir, n).foreach { j =>
        val out = fs.create(new Path(build, n), true)
        try out.write(j.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
    }
    val markerCutoff = opStart - markerRetentionMs
    val currentOnly = fs.listStatus(new Path(dir)).toSeq
      .filter { f =>
        val n = f.getPath.getName
        f.isFile && n.endsWith(".parquet") && !n.startsWith("part-") &&
          f.getModificationTime >= markerCutoff && !copiedMarkers(n)
      }.map(_.getPath.getName)
    if (currentOnly.nonEmpty) {
      val tmp = new Path(path, s".markers-${java.util.UUID.randomUUID}")
      restored.limit(0).write.parquet(tmp.toString)
      val part = fs.listStatus(tmp)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      require(part.length == 1, s"expected one marker part, got ${part.length}")
      currentOnly.foreach { n =>
        org.apache.hadoop.fs.FileUtil.copy(fs, part.head.getPath,
          fs, new Path(build, n), false, conf)
      }
      fs.delete(tmp, true)
    }
    changes.foreach(cd =>
      cd.write.parquet(new Path(build, ChangeDataDir).toString))
    writeOpFile(fs, build, s"RESTORE(v$version)", opStart)
    val now = System.currentTimeMillis()
    val replacedManifest = currentGen(fs, statsDir)
      .map { case (v, _) => s"$StatsDir/v$v" }.toSeq
    writeRemovalLog(fs, build,
      (dropped.map(p => rootRelativeOrName(fs, path, p)) ++
        replacedManifest).map(_ -> now))
    val gen = new Path(statsDir, s"v$nextV")
    commitBuildAs(spark, fs, build, gen)
    if (vacuum) vacuumTable(spark, path, retentionMs)
    nextV
  }

  /** The table's commit history (the `DESCRIBE HISTORY` analog), one
    * row per RETAINED committed generation, newest first: `version`,
    * `operation` (WRITE / OPTIMIZE / DELETE / UPDATE / MERGE /
    * RESTORE(vN); UNKNOWN for generations written before the op
    * sidecar existed), and `op_time` (the operation's entry
    * timestamp; commit-marker mtime for pre-sidecar generations).
    * History reaches back exactly as far as time travel does — the
    * retention window — because superseded generations ARE the
    * history records. Tiny driver-side listing (O(retained
    * generations)), like Delta's.
    */
  def describeHistory(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statsDir = new Path(s"$path/$StatsDir")
    val rows = genDirs(fs, statsDir)
      .filter { case (_, f) => isCommittedGen(fs, f.getPath) }
      .map { case (v, f) =>
        val (op, ts) = readSidecarIn(fs, f.getPath.toString, OpFile) match {
          case Some(json) =>
            val opRe = "\"operation\"\\s*:\\s*\"([^\"]*)\"".r
            val tsRe = "\"ts\"\\s*:\\s*(\\d+)".r
            (opRe.findFirstMatchIn(json).map(_.group(1)).getOrElse("UNKNOWN"),
              tsRe.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L))
          case None =>
            (if (v == 0L) "WRITE" else "UNKNOWN", commitInstant(fs, f.getPath))
        }
        Row(v, op, ts)
      }.reverse
    val schema = StructType(Seq(
      StructField("version", org.apache.spark.sql.types.LongType,
        nullable = false),
      StructField("operation", org.apache.spark.sql.types.StringType,
        nullable = false),
      StructField("op_time", org.apache.spark.sql.types.LongType,
        nullable = false)))
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
  }

  /** Shared planning preamble for the pruning entry points: load the
    * manifest at `dir`, derive the tracked/null/bloom column sets,
    * and rewrite `predicate` into the file-skip filter. Returns
    * (manifest frame, table schema, skip filter).
    */
  private def planSkip(spark: SparkSession, path: String, dir: String,
      predicate: Column,
      pin: Option[Set[String]] = None): (DataFrame, StructType, Column) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.plans.GraftFunctions.register(spark)
    val stats = pin.fold(readManifestIn(spark, dir))(
      readManifestPinned(spark, dir, _))
    val tracked = stats.columns.collect { case c if c.startsWith("min_") => c.drop(4) }.toSet
    val nullsTracked = stats.columns.collect { case c if c.startsWith("nulls_") => c.drop(6) }.toSet
    val bloomIdx = bloomIndex(fs, dir, stats.columns)
    val schema = tableSchemaIn(spark, path, dir)
    // SKIP side only: conjuncts on generated columns derived from the
    // user's raw-column bounds (the Delta generated-partition-column
    // read-side optimization) — pure pruning, the row predicate the
    // caller applies above the scan is untouched
    val augmented = withGeneratedPruning(spark, fs, dir, schema, predicate)
    val cond = resolvedCondition(spark, schema, augmented)
    (stats, schema, rewrite(cond, tracked, nullsTracked, bloomIdx).getOrElse(lit(true)))
  }

  // --- generated-column pruning (read side) -------------------------
  //
  // A table partitioned (or clustered) by a GENERATED column
  // `g = f(raw)` is usually queried by the RAW column — `WHERE ts
  // BETWEEN a AND b` on a table partitioned by `day =
  // date_trunc('DAY', ts)`. Without derivation that predicate prunes
  // nothing (g's stats are min=max per partition dir, raw's stats
  // may be absent). For MONOTONE generation expressions the bounds
  // transfer: raw ∈ [lo, hi] ⟹ g ∈ [f(lo), f(hi)], so the skip
  // predicate gains `g >= f(lo) AND g <= f(hi)` (equality gains
  // `g = f(v)`) — Delta's optimizable-expression families, done as
  // endpoint evaluation. Strict raw bounds derive NON-strict g
  // bounds (always implied). A null f(bound) (e.g. a cast that
  // fails) derives nothing. Cost: only when the table HAS generated
  // columns AND the predicate carries usable bounds — then one
  // 1-row local evaluation per bound.

  /** The single source column of `e` IF `e` is monotone
    * non-decreasing in it — (column, required raw-type family).
    * Whitelisted families: identity (any type), temporal truncation
    * casts (DATE/TIMESTAMP), date_trunc(unit, c), year(c),
    * to_date(c) — TEMPORAL raw only (over a STRING these are NOT
    * monotone: '2021-12-1' < '2021-2-1' lexicographically while the
    * parsed dates order the other way, and deriving from them would
    * silently drop rows); floor/div by a positive constant (NUMERIC
    * raw only); substring(c, 1, k) (STRING raw only — binary-order
    * prefix). Deliberately NOT month/day/hour — they wrap and are
    * not monotone alone. The caller checks the family against the
    * raw column's actual type ([[monotoneTypeOk]]).
    */
  private def monotoneSource(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[(String, String)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Literal => CLit}
    import org.apache.spark.sql.types.{DateType, TimestampType}
    def fname(f: UnresolvedFunction): String =
      f.nameParts.last.toLowerCase(java.util.Locale.ROOT)
    def inner(c: org.apache.spark.sql.catalyst.expressions.Expression,
        family: String): Option[(String, String)] =
      c match {
        // only a BARE attribute below a family wrapper — nested
        // wrappers would need family composition; keep the whitelist
        // one level deep and provably sound
        case a: UnresolvedAttribute if a.nameParts.size == 1 =>
          Some((a.nameParts.head, family))
        case _ => None
      }
    e match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 =>
        Some((a.nameParts.head, "any"))
      case c: Cast if c.dataType == DateType || c.dataType == TimestampType =>
        inner(c.child, "temporal")
      case f: UnresolvedFunction if fname(f) == "date_trunc" =>
        f.arguments match {
          case Seq(CLit(_, _), c) => inner(c, "temporal")
          case _ => None
        }
      case f: UnresolvedFunction if fname(f) == "year" || fname(f) == "to_date" =>
        f.arguments match {
          case Seq(c) => inner(c, "temporal")
          case _ => None
        }
      case f: UnresolvedFunction if fname(f) == "floor" =>
        f.arguments match {
          case Seq(Divide(c, CLit(n, _), _)) if positiveConst(n) =>
            inner(c, "numeric")
          case _ => None
        }
      case Divide(c, CLit(n, _), _) if positiveConst(n) => inner(c, "numeric")
      case f: UnresolvedFunction
          if fname(f) == "substring" || fname(f) == "substr" =>
        f.arguments match {
          case Seq(c, CLit(pos, _), CLit(_, _)) if String.valueOf(pos) == "1" =>
            inner(c, "string")
          case _ => None
        }
      case _ => None
    }
  }

  /** Does the raw column's ACTUAL type satisfy the family the
    * monotone whitelist assumed? (A temporal function over a STRING
    * column parses but is not monotone in the column's order.)
    */
  private def monotoneTypeOk(family: String, dt: DataType): Boolean = {
    import org.apache.spark.sql.types._
    family match {
      case "any" => true
      case "temporal" => dt == DateType || dt == TimestampType ||
        dt == TimestampNTZType
      case "numeric" => dt.isInstanceOf[NumericType]
      case "string" => dt == StringType
      case _ => false
    }
  }

  private def positiveConst(v: Any): Boolean = v match {
    case n: java.lang.Number => n.doubleValue > 0
    case d: java.math.BigDecimal => d.signum > 0
    case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal.signum > 0
    case _ => false
  }

  /** Evaluate the generation expression at a single raw value.
    * None when the result is null (derive nothing) or the
    * evaluation itself fails (an expression family the whitelist
    * admitted but the engine rejects — never break the read).
    */
  private def evalGenAt(spark: SparkSession, exprSql: String, rawName: String,
      rawType: DataType,
      v: org.apache.spark.sql.catalyst.expressions.Literal): Option[Any] =
    try {
      val row = spark.range(1)
        .select(org.apache.spark.sql.graft.ColumnBridge.column(v)
          .cast(rawType).as(rawName))
        .selectExpr(s"($exprSql) AS __g")
        .head()
      if (row.isNullAt(0)) None else Some(row.get(0))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** predicate && derived generated-column conjuncts (see section
    * comment). Identity (no generated columns / no usable bounds) is
    * the common fast path: one sidecar read, no evaluation.
    */
  private def withGeneratedPruning(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: String,
      schema: StructType, predicate: Column): Column = {
    val gens = generatedIn(fs, dir)
    if (gens.isEmpty) return predicate
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo => CEq, Expression => CExpr, GreaterThan => CGt, GreaterThanOrEqual => CGte, LessThan => CLt, LessThanOrEqual => CLte, Literal => CLit}
    val tree =
      try org.apache.spark.sql.graft.ColumnBridge.expression(predicate)
      catch { case scala.util.control.NonFatal(_) => return predicate }
    // the Column DSL converts to UnresolvedFunction("and"/">="/...)
    // nodes, SQL-parsed trees to catalyst And/GreaterThanOrEqual —
    // normalize both shapes
    def fn(e: CExpr): Option[(String, Seq[CExpr])] = e match {
      case f: UnresolvedFunction if f.nameParts.size == 1 =>
        Some((f.nameParts.head.toLowerCase(java.util.Locale.ROOT), f.arguments))
      case _ => None
    }
    object Fn {
      def unapply(e: CExpr): Option[(String, Seq[CExpr])] = fn(e)
    }
    def conjuncts(e: CExpr): Seq[CExpr] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case Fn("and", Seq(l, r)) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    // (op, attr-side, literal, attrOnLeft)
    object Cmp {
      def unapply(e: CExpr): Option[(String, CExpr, CExpr)] = e match {
        case CEq(l, r) => Some(("=", l, r))
        case CGt(l, r) => Some((">", l, r))
        case CGte(l, r) => Some((">=", l, r))
        case CLt(l, r) => Some(("<", l, r))
        case CLte(l, r) => Some(("<=", l, r))
        case Fn(op, Seq(l, r))
            if Set("=", "==", ">", ">=", "<", "<=")(op) =>
          Some((if (op == "==") "=" else op, l, r))
        case _ => None
      }
    }
    def attrName(e: CExpr): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 =>
        Some(a.nameParts.head)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    val cs = conjuncts(tree)
    // one sidecar read for the whole pass, not one per generated
    // column (the tz gate below fires per temporal column)
    lazy val temporalTzOk = generatedTzIn(fs, dir).contains(sessionTz(spark))
    val derived: Seq[Column] = gens.toSeq.flatMap { case (g, exprSql) =>
      val parsed =
        try spark.sessionState.sqlParser.parseExpression(exprSql)
        catch { case scala.util.control.NonFatal(_) => return predicate }
      def rawTypeOf(raw: String): Option[DataType] =
        schema.fieldNames.find(_.equalsIgnoreCase(raw))
          .map(n => schema(schema.fieldIndex(n)).dataType)
      monotoneSource(parsed) match {
        case None => Nil
        case Some((raw, family))
            if !rawTypeOf(raw).exists(monotoneTypeOk(family, _)) => Nil
        // temporal endpoint evaluation runs under the READER's
        // session timezone; stored values were computed under the
        // recorded writer timezone — derive only when they AGREE
        // (unknown/mixed record ⟹ no temporal derivation; a
        // mismatched reader would shift bounds by the offset and
        // silently drop files). The other families are tz-free.
        case Some((_, family))
            if family == "temporal" && !temporalTzOk => Nil
        case Some((raw, family)) =>
          val rawType = rawTypeOf(raw).get
          def isRaw(e: CExpr): Boolean =
            attrName(e).exists(_.equalsIgnoreCase(raw))
          def f(v: CLit): Option[Column] =
            evalGenAt(spark, exprSql, raw, rawType, v).map(lit(_))
          cs.flatMap {
            case Cmp(op, a, l: CLit) if isRaw(a) => op match {
              case "=" => f(l).map(col(g) === _)
              case ">" | ">=" => f(l).map(col(g) >= _)
              case "<" | "<=" => f(l).map(col(g) <= _)
            }
            // literal-on-the-left comparisons flip the bound side
            case Cmp(op, l: CLit, a) if isRaw(a) => op match {
              case "=" => f(l).map(col(g) === _)
              case ">" | ">=" => f(l).map(col(g) <= _)
              case "<" | "<=" => f(l).map(col(g) >= _)
            }
            // IN-lists: raw IN (v1..vn) ⟹ g IN (f(v1)..f(vn)) — but
            // only when EVERY endpoint evaluates non-null (a null
            // f(vi) means raw=vi rows live in the null partition;
            // g IN (...) would exclude them and lose rows)
            case org.apache.spark.sql.catalyst.expressions.In(a, vs)
                if isRaw(a) && vs.nonEmpty &&
                  vs.forall(_.isInstanceOf[CLit]) =>
              val mapped = vs.map(v => f(v.asInstanceOf[CLit]))
              if (mapped.forall(_.isDefined))
                Seq(mapped.flatten.map(col(g) === _).reduce(_ || _))
              else Nil
            case Fn("in", args) if args.size >= 2 && isRaw(args.head) &&
                args.tail.forall(_.isInstanceOf[CLit]) =>
              val mapped = args.tail.map(v => f(v.asInstanceOf[CLit]))
              if (mapped.forall(_.isDefined))
                Seq(mapped.flatten.map(col(g) === _).reduce(_ || _))
              else Nil
            case _ => Nil
          }
      }
    }
    derived.foldLeft(predicate)(_ && _)
  }

  /** (files the predicate might match, all files) from the manifest.
    * DRIVER-SIDE LISTS — the test/diagnostic surface for pruning
    * counts. The scan path is [[readSkipping]], which never
    * materializes the all-files list.
    */
  def prunedFiles(
      spark: SparkSession, path: String,
      predicate: Column): (Seq[String], Seq[String]) = {
    val (stats, _, skip) = planSkip(spark, path, manifestDir(spark, path),
      mapPred(spark, path, predicate))
    val all = stats.select("file").collect().map(_.getString(0)).toSeq
    val kept = stats.filter(skip).select("file").collect().map(_.getString(0)).toSeq
    (kept, all)
  }

  /** Read `path` under `predicate`, scanning only files whose stats
    * admit a match; the predicate is re-applied to surviving rows.
    *
    * Scale shape (the Delta-snapshot pattern): the manifest is a
    * TABLE — the kept-file set is computed by a distributed filter
    * over it, and only the surviving (path, size, mtime) rows reach
    * the driver, where they become a [[ManifestFileIndex]] feeding
    * the parquet reader directly. Planning therefore does:
    *  - ZERO data-file listings (statuses come from the manifest),
    *  - ZERO footer reads (schema comes from the sidecar),
    *  - no per-file path list in the plan (the scan node holds one
    *    relation whose file index serves the statuses),
    * and the driver never materializes the all-files list — at 10^6
    * manifest entries with a selective predicate, driver memory is
    * O(kept), not O(files). Pre-sidecar manifests (no
    * file_size/mod_time columns) fall back to a path-list read.
    */
  def readSkipping(spark: SparkSession, path: String, predicate: Column): DataFrame =
    readSkippingMapped(spark, path, manifestDir(spark, path), predicate)

  /** [[readSkippingIn]] behind the column mapping: the predicate
    * arrives in LOGICAL names, pruning and scanning run on PHYSICAL
    * names, and the result projects back to logical. Identity (no
    * sidecar) short-circuits to the plain path.
    */
  private def readSkippingMapped(spark: SparkSession, path: String,
      dir: String, predicate: Column): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    colMapIn(fs, dir) match {
      case None => readSkippingIn(spark, path, dir, predicate)
      case Some(m) =>
        val phys = tableSchemaIn(spark, path, dir)
        // loud on renamed-away/dropped names (see mapPred)
        resolvedCondition(spark, logicalSchemaOf(phys, Some(m)), predicate)
        toLogicalScan(
          readSkippingIn(spark, path, dir, toPhysicalColumn(predicate, m)),
          phys, m)
    }
  }

  /** METADATA-ONLY `COUNT(*) WHERE predicate` (the Delta/Photon
    * metadata-count optimization): every file is classified from its
    * manifest stats as ALL-match ([[rewriteAll]] — counted as
    * `n_rows` minus its deletion-vector entries, no data read),
    * NO-match (the [[rewrite]] skip predicate — contributes zero), or
    * BOUNDARY (scanned with the row predicate, vector applied). A
    * range count over a clustered 100 TB table reads the manifest
    * plus at most the two boundary files; `countWhere(lit(true))` on
    * a vector-free table reads no data at all. The DV subtraction on
    * all-match files is EXACT: stats are physical, so every physical
    * row matches — dead rows included — and visible matches are
    * `n_rows - dead`. Always equals
    * `readSkipping(...).filter(predicate).count()`; only the bytes
    * read differ.
    */
  /** Current-mapping predicate/name translation for the metadata
    * aggregates (identity when no mapping exists).
    */
  private def currentMap(spark: SparkSession, path: String): Option[Map[String, String]] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    colMapIn(fs, manifestDirOf(fs, path))
  }

  def countWhere(spark: SparkSession, path: String,
      predicate: Column): Long =
    countWhereDetail(spark, path, mapPred(spark, path, predicate))._1

  /** Metadata-only `MIN(column), MAX(column) WHERE predicate` — the
    * aggregate-pushdown companion of [[countWhere]]: ALL-match files
    * contribute their manifest `min_/max_` stats directly (exact —
    * stats exclude nulls, and MIN/MAX ignore nulls), files with
    * deletion-vector entries are DEMOTED to a scan (the extremum row
    * might be dead — stats are only upper/lower BOUNDS under a
    * vector), and boundary files scan with the predicate. One small
    * distributed agg over (stats rows ∪ scanned rows); a clustered
    * range query answers from the manifest + ≤2 boundary files.
    * `column` must be stats-tracked. Returns (min, max) as Options
    * (None on zero matching non-null rows).
    */
  def minMaxWhere(spark: SparkSession, path: String, column: String,
      predicate: Column): (Option[Any], Option[Any]) = {
    val m = currentMap(spark, path)
    minMaxWhereDetail(spark, path,
      m.fold(column)(mapStatsKey(_, column)),
      mapPred(spark, path, predicate))._1
  }

  /** ((min, max), scanned files) — detail behind [[minMaxWhere]];
    * `private[sources]` so the no-scan claim is testable.
    */
  private[sources] def minMaxWhereDetail(spark: SparkSession, path: String,
      column: String, predicate: Column)
      : ((Option[Any], Option[Any]), Long) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val (stats, schema, skip) = planSkip(spark, path, dir, predicate)
    require(stats.columns.contains(s"min_$column"),
      s"$column is not stats-tracked — minMaxWhere needs manifest " +
        "min/max for it")
    def scanAll(statuses: Seq[FileStatusWithMetadata],
        dv: Option[DataFrame]): Option[DataFrame] =
      if (statuses.isEmpty) None
      else Some(applyDv(
        partAwareStatusScan(spark, path, dir, schema, statuses), dv)
        .filter(coalesce(predicate, lit(false)))
        .select(col(column).as("__lo"), col(column).as("__hi")))
    if (!stats.columns.contains("file_size")) {
      // legacy manifest: no status metadata — the read path's own
      // legacy branch handles the path-list scan
      val r = readSkippingIn(spark, path, dir, predicate)
        .filter(coalesce(predicate, lit(false)))
        .agg(min(col(column)), max(col(column))).head()
      return ((Option(r.get(0)), Option(r.get(1))), -1L)
    }
    val tracked = stats.columns.collect {
      case c if c.startsWith("min_") => c.drop(4) }.toSet
    val nullsTracked = stats.columns.collect {
      case c if c.startsWith("nulls_") => c.drop(6) }.toSet
    val cond = resolvedCondition(spark, schema, predicate)
    val all = coalesce(
      rewriteAll(cond, tracked, nullsTracked).getOrElse(lit(false)),
      lit(false))
    val dv = readDvIn(spark, dir)
    val kept = stats.filter(skip)
    // vector-bearing files demote to the scan side: their stats are
    // bounds, not witnesses
    val (statsSide, demoted) = dv match {
      case None => (kept.filter(all), kept.filter(!all))
      case Some(d) =>
        val dvFiles = d.select(col("file")).distinct()
        (kept.filter(all).join(broadcast(dvFiles), Seq("file"), "left_anti"),
          kept.filter(!all).unionByName(
            kept.filter(all).join(broadcast(dvFiles), Seq("file"), "left_semi")))
    }
    val statuses = statusesOf(demoted)
    val fromStats = statsSide
      .select(mc(s"min_$column").as("__lo"), mc(s"max_$column").as("__hi"))
    val frames = Seq(fromStats) ++ scanAll(statuses, dv).toSeq
    val r = frames.reduce(_.unionByName(_))
      .agg(min(col("__lo")), max(col("__hi"))).head()
    ((Option(r.get(0)), Option(r.get(1))), statuses.size.toLong)
  }

  /** (count, all-match files, scanned files) — the detail triple
    * backing [[countWhere]]; `private[sources]` so the no-scan claim
    * is directly testable.
    */
  private[sources] def countWhereDetail(spark: SparkSession, path: String,
      predicate: Column): (Long, Long, Long) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val (stats, schema, skip) = planSkip(spark, path, dir, predicate)
    if (!stats.columns.contains("n_rows") ||
        !stats.columns.contains("file_size")) {
      // legacy manifest: no row counts recorded — plain scan count
      val c = readSkippingIn(spark, path, dir, predicate)
        .filter(coalesce(predicate, lit(false))).count()
      return (c, 0L, -1L)
    }
    val tracked = stats.columns.collect {
      case c if c.startsWith("min_") => c.drop(4) }.toSet
    val nullsTracked = stats.columns.collect {
      case c if c.startsWith("nulls_") => c.drop(6) }.toSet
    val cond = resolvedCondition(spark, schema, predicate)
    // null-safe tri-state: a null stats term (evolved column, legacy
    // row) falls to the same side the read path puts it on — skip
    // null drops the file, all null demotes to boundary scan
    val all = coalesce(
      rewriteAll(cond, tracked, nullsTracked).getOrElse(lit(false)),
      lit(false))
    val fullRows = stats.filter(skip && all)
    val dv = readDvIn(spark, dir)
    val fullAgg = dv match {
      case None =>
        fullRows.agg(sum(col("n_rows")), count(lit(1))).head()
      case Some(d) =>
        val dvc = d.groupBy(col("file")).agg(count(lit(1)).as("__dead"))
        fullRows.join(dvc, Seq("file"), "left")
          .agg(sum(col("n_rows") - coalesce(col("__dead"), lit(0L))),
            count(lit(1))).head()
    }
    val fullCount = if (fullAgg.isNullAt(0)) 0L else fullAgg.getLong(0)
    val fullFiles = fullAgg.getLong(1)
    val partialStatuses = statusesOf(stats.filter(skip && !all))
    val partialCount =
      if (partialStatuses.isEmpty) 0L
      else applyDv(
        partAwareStatusScan(spark, path, dir, schema, partialStatuses), dv)
        .filter(coalesce(predicate, lit(false))).count()
    (fullCount + partialCount, fullFiles, partialStatuses.size.toLong)
  }

  /** (count of rows where `column` IS NOT NULL and `predicate`
    * matches, all-match files answered from stats, files scanned) —
    * the `COUNT(col)` companion of [[countWhereDetail]], answering
    * `COUNT(col) = n_rows − nullCount` from the manifest: an
    * all-match file contributes `n_rows − coalesce(nulls_col,
    * n_rows)` (a NULL null-count means the column did not exist when
    * the file was written — every row reads NULL; the skip
    * rewriter's own backfill rule), files carrying deletion-vector
    * entries demote to a scan (a dead row's nullity is unknowable
    * from stats), boundary files scan with the row predicate. A
    * manifest without null tracking for the column scans every kept
    * file — correct but no pushdown win, so the PLANNER should not
    * claim such plans (see [[manifestNullCountedLogical]]).
    * `column` arrives PHYSICAL, `predicate` pre-mapped — like every
    * sibling detail function.
    */
  private[sources] def countNonNullWhereDetail(spark: SparkSession,
      path: String, column: String, predicate: Column): (Long, Long, Long) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val (stats, schema, skip) = planSkip(spark, path, dir, predicate)
    val notNullPred = coalesce(predicate, lit(false)) && col(column).isNotNull
    if (!stats.columns.contains("n_rows") ||
        !stats.columns.contains("file_size")) {
      // legacy manifest: no row counts recorded — plain scan count
      val c = readSkippingIn(spark, path, dir, predicate)
        .filter(notNullPred).count()
      return (c, 0L, -1L)
    }
    val tracked = stats.columns.collect {
      case c if c.startsWith("min_") => c.drop(4) }.toSet
    val nullsTracked = stats.columns.collect {
      case c if c.startsWith("nulls_") => c.drop(6) }.toSet
    val cond = resolvedCondition(spark, schema, predicate)
    val all = coalesce(
      rewriteAll(cond, tracked, nullsTracked).getOrElse(lit(false)),
      lit(false))
    val hasNulls = stats.columns.contains(s"nulls_$column")
    val eligible = if (hasNulls) all else lit(false)
    val dv = readDvIn(spark, dir)
    val kept = stats.filter(skip)
    val (statsSide, demoted) = dv match {
      case None => (kept.filter(eligible), kept.filter(!eligible))
      case Some(d) =>
        val dvFiles = d.select(col("file")).distinct()
        (kept.filter(eligible).join(broadcast(dvFiles), Seq("file"), "left_anti"),
          kept.filter(!eligible).unionByName(
            kept.filter(eligible).join(broadcast(dvFiles), Seq("file"), "left_semi")))
    }
    val nnExpr = if (hasNulls)
      col("n_rows") - coalesce(mc(s"nulls_$column"), col("n_rows"))
    else lit(0L)
    val aggRow = statsSide.agg(sum(nnExpr), count(lit(1))).head()
    val fullCount = if (aggRow.isNullAt(0)) 0L else aggRow.getLong(0)
    val fullFiles = aggRow.getLong(1)
    val statuses = statusesOf(demoted)
    val partial =
      if (statuses.isEmpty) 0L
      else applyDv(
        partAwareStatusScan(spark, path, dir, schema, statuses), dv)
        .filter(notNullPred).count()
    (fullCount + partial, fullFiles, statuses.size.toLong)
  }

  /** [[countNonNullWhereDetail]] with LOGICAL column/predicate
    * (current-mapping translation applied, like [[minMaxWhere]]).
    */
  private[sources] def countColWhereDetail(spark: SparkSession, path: String,
      column: String, predicate: Column): (Long, Long, Long) = {
    val m = currentMap(spark, path)
    countNonNullWhereDetail(spark, path,
      m.fold(column)(mapStatsKey(_, column)),
      mapPred(spark, path, predicate))
  }

  /** Metadata-backed `COUNT(column) WHERE predicate` (non-null count;
    * logical names).
    */
  def countNonNullWhere(spark: SparkSession, path: String, column: String,
      predicate: Column): Long =
    countColWhereDetail(spark, path, column, predicate)._1

  /** The logical names whose per-file NULL COUNTS the current
    * manifest records — the columns `COUNT(col)` pushdown may claim.
    * Schema-only (no job).
    */
  private[sources] def manifestNullCountedLogical(spark: SparkSession,
      path: String): Set[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    val inv = colMapIn(fs, dir).map(_.map(_.swap)).getOrElse(Map.empty[String, String])
    readManifestIn(spark, dir).columns.collect {
      case c if c.startsWith("nulls_") =>
        mapStatsKey(inv, c.drop(6))
    }.toSet
  }

  private def readSkippingIn(spark: SparkSession, path: String, dir: String,
      predicate: Column): DataFrame = {
    val (stats, schema, skip) = planSkip(spark, path, dir, predicate)
    if (!stats.columns.contains("file_size")) {
      // legacy manifest: no status metadata recorded — path-list read
      val kept = stats.filter(skip).select("file").collect().map(_.getString(0)).toSeq
      if (kept.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.schema(schema).parquet(kept: _*).filter(predicate)
    } else {
      val kept = stats.filter(skip)
        .select(col("file"), col("file_size"), col("mod_time")).collect()
      val statuses = kept.map { r =>
        FileStatusWithMetadata(new FileStatus(
          r.getLong(1), false, 1, 128L * 1024 * 1024, r.getLong(2),
          new Path(r.getString(0))))
      }.toSeq
      val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Partition-converted tables: values come from directory names,
      // so [[partAwareRelation]] splits the sidecar schema into data
      // columns (read from bytes) and partition columns (served per
      // PartitionDirectory by the file index — zero bytes read). The
      // manifest already pruned on partition predicates via min=max
      // stats; the index re-applies the partition filters Catalyst
      // hands it because FileSourceStrategy TRUSTS listing-time
      // pruning and never re-checks those conjuncts on rows.
      val relation = partAwareRelation(spark, path,
        partitionColsIn(fs, dir), schema, statuses)
      applyDv(classic.baseRelationToDataFrame(relation),
        readDvIn(spark, dir)).filter(predicate)
    }
  }

  /** Rewrite a row predicate into a file-stats predicate over
    * min_/max_ (and, per manifest features, nulls_/bloom_) columns.
    * None = cannot skip on this expression. `bloom` maps each
    * bloom-indexed column to its probe count; equality and IN terms
    * on those columns ALSO require the per-file Bloom to admit the
    * value — the pruning that works where min/max ranges are useless
    * (unclustered high-cardinality columns).
    *
    * Null-count terms use `coalesce(nulls_c, n_rows)`: a null
    * null-count in a nulls-featured manifest means the row was
    * written before the column existed (schema evolution) — every
    * row in that file reads as null for the column, so the backfill
    * is exact. (A bloom_ column that is null for pre-evolution rows
    * needs no special casing: the bloom probe evaluates null, the
    * skip predicate is null, and the file is dropped — correct, the
    * file holds no values of an evolved column.)
    */
  private[sources] def rewrite(e: Expression, tracked: Set[String],
      nullsTracked: Set[String] = Set.empty,
      bloom: Map[String, Int] = Map.empty): Option[Column] = {
    def eqTerm(a: String, v: Literal): Column = {
      val range = minC(a) <= litOf(v) && maxC(a) >= litOf(v)
      bloom.get(a).fold(range)(k => range &&
        call_function("graft_bloom_contains_col",
          xxhash64(litOf(v)), mc(s"bloom_$a"), lit(k)))
    }
    e match {
    // Boolean literals skip exactly as themselves: `false` (an empty
    // dynamic-pruning envelope, a folded contradiction) prunes EVERY
    // file — without this case it fell to `None` and the one
    // predicate that should read nothing read everything.
    case Literal(true, org.apache.spark.sql.types.BooleanType) =>
      Some(lit(true))
    case Literal(false, org.apache.spark.sql.types.BooleanType) =>
      Some(lit(false))
    case And(l, r) =>
      // an unsupported conjunct restricts nothing: x AND unknown -> x
      (rewrite(l, tracked, nullsTracked, bloom),
        rewrite(r, tracked, nullsTracked, bloom)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (Some(a), None) => Some(a)
        case (None, Some(b)) => Some(b)
        case _ => None
      }
    case Or(l, r) =>
      // an unsupported disjunct could match anywhere: give up the OR
      for (a <- rewrite(l, tracked, nullsTracked, bloom);
        b <- rewrite(r, tracked, nullsTracked, bloom)) yield a || b
    case IsNull(Attr(a)) if nullsTracked(a) =>
      Some(coalesce(mc(s"nulls_$a"), col("n_rows")) > 0L)
    case IsNotNull(Attr(a)) if nullsTracked(a) =>
      Some(col("n_rows") > coalesce(mc(s"nulls_$a"), col("n_rows")))
    case EqualTo(Attr(a), Lit(v)) if tracked(a) =>
      Some(eqTerm(a, v))
    case EqualTo(Lit(v), Attr(a)) if tracked(a) =>
      Some(eqTerm(a, v))
    case GreaterThan(Attr(a), Lit(v)) if tracked(a) =>
      Some(maxC(a) > litOf(v))
    case GreaterThan(Lit(v), Attr(a)) if tracked(a) =>
      Some(minC(a) < litOf(v)) // v > a  <=>  a < v
    case GreaterThanOrEqual(Attr(a), Lit(v)) if tracked(a) =>
      Some(maxC(a) >= litOf(v))
    case GreaterThanOrEqual(Lit(v), Attr(a)) if tracked(a) =>
      Some(minC(a) <= litOf(v))
    case LessThan(Attr(a), Lit(v)) if tracked(a) =>
      Some(minC(a) < litOf(v))
    case LessThan(Lit(v), Attr(a)) if tracked(a) =>
      Some(maxC(a) > litOf(v))
    case LessThanOrEqual(Attr(a), Lit(v)) if tracked(a) =>
      Some(minC(a) <= litOf(v))
    case LessThanOrEqual(Lit(v), Attr(a)) if tracked(a) =>
      Some(maxC(a) >= litOf(v))
    case org.apache.spark.sql.catalyst.expressions.In(Attr(a), vs)
        if tracked(a) && vs.nonEmpty && vs.forall(Lit.unapply(_).isDefined) =>
      // a IN (v1..vn): the file can hold a match iff its range (and
      // bloom, when indexed) admits SOME value. A null element's term
      // evaluates null, which is conservative-correct under the OR (a
      // row only survives the row filter when IN is TRUE, never null).
      val lits = vs.map { case Lit(v) => v }
      val elemType = lits.head.dataType
      if (lits.size <= 16 || !lits.forall(_.dataType == elemType))
        Some(lits.map(eqTerm(a, _)).reduce(_ || _))
      else {
        // LARGE key sets (dynamic file pruning hands a whole dim's
        // keys over): an n-term OR chain builds an O(n)-deep Column
        // tree whose recursive conversion/optimization costs seconds
        // of DRIVER time per query — and overflows the stack first on
        // small-stack threads (seen at 626 keys). ONE array literal +
        // EXISTS keeps the tree O(1); evaluation is O(n) per manifest
        // row, which is the cheap side of the trade (manifest rows ≪
        // data rows). `exists` follows the same three-valued logic as
        // the OR chain (null element → null, never true).
        val arr = org.apache.spark.sql.graft.ColumnBridge.column(
          Literal(new org.apache.spark.sql.catalyst.util.GenericArrayData(
            lits.map(_.value)),
            org.apache.spark.sql.types.ArrayType(elemType,
              containsNull = lits.exists(_.value == null))))
        Some(exists(arr, x => {
          val range = minC(a) <= x && maxC(a) >= x
          bloom.get(a).fold(range)(k => range &&
            call_function("graft_bloom_contains_col",
              xxhash64(x), mc(s"bloom_$a"), lit(k)))
        }))
      }
    case org.apache.spark.sql.catalyst.expressions.StartsWith(Attr(a), Lit(v))
        if tracked(a) && v.value != null &&
          v.value.toString.forall(_ < 0x80) =>
      // v startsWith p  ⟹  p <= v < succ(p). ASCII prefixes only:
      // Spark orders strings by UTF-8 bytes, the JVM by UTF-16 code
      // units — they agree on ASCII, and a wrong bound here silently
      // drops live files.
      val prefix = v.value.toString
      val lower = maxC(a) >= lit(prefix)
      if (prefix.isEmpty) Some(lower) // every string matches ""
      else Some(lower &&
        minC(a) < lit(prefix.init + (prefix.last + 1).toChar))
    case _ => None
    }
  }

  /** Foldable comparand, evaluated to a Literal. The ANALYZED plan
    * wraps type-coerced literals in Cast (e.g. an Int literal
    * against a BIGINT column) — matching bare `Literal` only would
    * silently disable pruning for the most common predicate form.
    */
  private object Lit {
    def unapply(e: Expression): Option[Literal] = e match {
      case l: Literal => Some(l)
      case _ if e.foldable && e.references.isEmpty =>
        Some(Literal.create(e.eval(), e.dataType))
      case _ => None
    }
  }

  /** Rewrite a row predicate into a file-stats predicate that is TRUE
    * only when EVERY row of the file matches — the dual of [[rewrite]]
    * (which proves "no row matches" by negation). Sufficient, never
    * necessary: None or FALSE just means the file must be scanned.
    * Used by [[countWhere]]'s metadata-only counting.
    *
    * Null discipline: stats min/max EXCLUDE nulls, and a null
    * comparison is not TRUE, so every comparison term additionally
    * requires the file to have ZERO nulls in the column (exact via
    * the nulls feature's `coalesce(nulls_c, n_rows)` backfill — a
    * pre-evolution file is all-null and correctly fails the test).
    * AND needs both sides proven; OR either (a file all-matching one
    * disjunct all-matches the disjunction).
    */
  private[sources] def rewriteAll(e: Expression, tracked: Set[String],
      nullsTracked: Set[String]): Option[Column] = {
    def noNulls(a: String): Option[Column] =
      if (!nullsTracked(a)) None
      else Some(coalesce(mc(s"nulls_$a"), col("n_rows")) === 0L)
    def cmp(a: String, term: Column): Option[Column] =
      if (!tracked(a)) None else noNulls(a).map(term && _)
    e match {
      case Literal(true, org.apache.spark.sql.types.BooleanType) =>
        Some(lit(true))
      case And(l, r) =>
        for (a <- rewriteAll(l, tracked, nullsTracked);
          b <- rewriteAll(r, tracked, nullsTracked)) yield a && b
      case Or(l, r) =>
        (rewriteAll(l, tracked, nullsTracked).toSeq ++
          rewriteAll(r, tracked, nullsTracked).toSeq)
          .reduceOption(_ || _)
      case EqualTo(Attr(a), Lit(v)) =>
        cmp(a, minC(a) === litOf(v) && maxC(a) === litOf(v))
      case EqualTo(Lit(v), Attr(a)) =>
        cmp(a, minC(a) === litOf(v) && maxC(a) === litOf(v))
      case GreaterThan(Attr(a), Lit(v)) => cmp(a, minC(a) > litOf(v))
      case GreaterThan(Lit(v), Attr(a)) => cmp(a, maxC(a) < litOf(v))
      case GreaterThanOrEqual(Attr(a), Lit(v)) => cmp(a, minC(a) >= litOf(v))
      case GreaterThanOrEqual(Lit(v), Attr(a)) => cmp(a, maxC(a) <= litOf(v))
      case LessThan(Attr(a), Lit(v)) => cmp(a, maxC(a) < litOf(v))
      case LessThan(Lit(v), Attr(a)) => cmp(a, minC(a) > litOf(v))
      case LessThanOrEqual(Attr(a), Lit(v)) => cmp(a, maxC(a) <= litOf(v))
      case LessThanOrEqual(Lit(v), Attr(a)) => cmp(a, minC(a) >= litOf(v))
      case IsNull(Attr(a)) if nullsTracked(a) =>
        Some(coalesce(mc(s"nulls_$a"), col("n_rows")) === col("n_rows"))
      case IsNotNull(Attr(a)) if nullsTracked(a) =>
        Some(coalesce(mc(s"nulls_$a"), col("n_rows")) === 0L)
      case _ => None
    }
  }

  // -----------------------------------------------------------------
  // Z-order clustering (the OPTIMIZE ZORDER analog)
  // -----------------------------------------------------------------

  /** Scale a numeric column into a 16-bit bucket given its global
    * [min, max]: floor((v - min) * 65535 / (max - min)). Pure integer
    * arithmetic — replayable as SQL in any engine.
    */
  def bucket16(c: Column, minV: Long, maxV: Long): Column = {
    require(maxV >= minV, s"empty range [$minV,$maxV]")
    if (maxV == minV) lit(0L)
    // exact integer division (`div`; Column./ is DOUBLE division,
    // which silently loses bits past 2^53) over DECIMAL(38,0)
    // products: (v - min) * 65535 in Long arithmetic would wrap for
    // column ranges past 2^47 — snowflake-style ids get there — and
    // a wrapped bucket garbles the whole z-order silently
    else call_function("div",
      (c.cast("bigint") - lit(minV)).cast("decimal(38,0)") * lit(65535L),
      lit(maxV - minV)).cast("bigint")
  }

  /** Spread the low 16 bits of `x` so consecutive bits land `n`
    * positions apart (n = number of z-order columns, 2-4) — the
    * classic Morton bit-dilation, expressed entirely in codegen'd
    * bitwise column functions (shifts/AND/OR exist in every SQL
    * engine, so the oracle replays the exact arithmetic).
    */
  def spreadBits(x: Column, n: Int): Column = {
    require(n >= 2 && n <= 4, "z-order supports 2-4 columns")
    // dilate bit-by-bit: bit i of x moves to position i*n. 16
    // iterations of (x >> i & 1) << (i*n) OR'd together — codegen
    // folds this into straight-line long ops.
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * n)
    }.reduce(_ bitwiseOR _)
  }

  /** Morton z-value of 2-4 bucketized columns: bit i of column j
    * lands at position i*n + j. Equal weight per column — range
    * predicates on ANY of them map to z-ranges, which is what makes
    * multi-column skipping work.
    */
  def zValue(buckets: Seq[Column]): Column = {
    val n = buckets.size
    buckets.zipWithIndex.map { case (b, j) =>
      shiftleft(spreadBits(b, n), j)
    }.reduce(_ bitwiseOR _)
  }

  /** `OPTIMIZE ... ZORDER BY` as TABLE MAINTENANCE (vs
    * [[writeZOrdered]]'s creation-time form): re-cluster an EXISTING
    * stats table on `zCols`, as a generation commit with
    * [[compactTable]]'s exact safety contract — snapshot rewrite
    * built hidden, one atomic `_COMMIT`, old generation retained for
    * time travel, removal-log vacuum. The global column ranges come
    * from the MANIFEST (one tiny agg over min_/max_ rows — no data
    * scan), the snapshot read is deletion-vector-filtered (z-order
    * MATERIALIZES the vector like compaction does), feature flags
    * (bloom config, change feed, null counts) carry, and the change
    * feed records nothing — re-clustering is not a logical change.
    * Tracked stats switch to `zCols` (they are what the new layout
    * prunes on). Returns the number of files written.
    */
  def zorderTable(spark: SparkSession, path: String, zCols0: Seq[String],
      targetFiles: Int,
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs,
      curve: String = "morton"): Int =
      withConcurrentRetry("zorderTable") {
    val zCols = currentMap(spark, path).fold(zCols0)(m =>
      zCols0.map(c => m.getOrElse(c, c)))
    require(zCols.size >= 2 && zCols.size <= 4, "z-order supports 2-4 columns")
    require(curve == "morton" || curve == "hilbert",
      s"curve must be morton or hilbert: $curve")
    require(curve == "morton" || zCols.size == 2,
      "the Hilbert curve is 2-D — pass exactly two columns")
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    // partition-converted tables z-order WITHIN partitions: the range
    // shuffle keys on (partition columns, z), so each partition's
    // rows sort by z among themselves and stage back through
    // partitionBy. Z columns must be DATA columns — partition values
    // already prune exactly (min=max=directory value).
    val partCols = partitionColsIn(fs, dir)
    require(zCols.intersect(partCols).isEmpty,
      s"z-order columns ${zCols.mkString("(", ",", ")")} must be data " +
        "columns — partition columns already prune exactly via their " +
        "min=max directory values")
    val observed = listManifestNames(fs, dir)
    val stats = readManifestPinned(spark, dir, observed)
    require(stats.columns.contains("file_size"),
      "zorderTable needs a size-carrying manifest (rewrite with writeWithStats)")
    zCols.foreach(c => require(stats.columns.contains(s"min_$c"),
      s"z-order column $c is not stats-tracked in the current manifest — " +
        "its global range must come from somewhere; compact with it tracked first"))
    locally {
      val sch = tableSchemaIn(spark, path, dir)
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      zCols.foreach { c =>
        val t = sch(c).dataType
        require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
          s"z-order column $c has type ${t.simpleString} — the 16-bit " +
            "bucketization needs an integral column (derive one upstream)")
      }
    }
    // global ranges from the manifest: one small agg, no data read
    val aggs = zCols.flatMap(c =>
      Seq(min(mc(s"min_$c")).cast("bigint"), max(mc(s"max_$c")).cast("bigint")))
    val env = stats.agg(aggs.head, aggs.tail: _*).head()
    val bounds = zCols.zipWithIndex.map { case (c, i) =>
      require(!env.isNullAt(2 * i),
        s"z-order column $c has no non-null values recorded — nothing to cluster on")
      (c, env.getLong(2 * i), env.getLong(2 * i + 1))
    }
    val schema = tableSchemaIn(spark, path, dir)
    val dv = readDvIn(spark, dir)
    val old = stats.select(col("file")).collect().map(_.getString(0))
    val snapshot = applyDv(partAwareStatusScan(spark, path, dir, schema,
      statusesOf(stats)), dv)
    val bkts = bounds.map { case (c, lo, hi) => bucket16(col(c), lo, hi) }
    // Hilbert keeps every consecutive cell pair ADJACENT (Morton
    // jumps diagonally at power-of-two seams), so per-file (x, y)
    // envelopes come out tighter — see [[graft.plans.HilbertIndex]]
    val z = curve match {
      case "hilbert" =>
        graft.plans.GraftFunctions.register(spark)
        call_function("graft_hilbert", bkts(0), bkts(1))
      case _ => zValue(bkts)
    }
    val staging = new Path(path, s".compact-${java.util.UUID.randomUUID}")
    val rangeKeys = partCols.map(col) :+ col("__z")
    val zSorted = snapshot.withColumn("__z", z)
      .repartitionByRange(targetFiles, rangeKeys: _*)
      .sortWithinPartitions(rangeKeys: _*)
      .drop("__z")
    if (partCols.isEmpty) zSorted.write.parquet(staging.toString)
    else zSorted.write.partitionBy(partCols: _*).parquet(staging.toString)
    val moved =
      if (partCols.isEmpty) moveIn(fs, staging, new Path(path))
      else moveInPartitioned(fs, staging, new Path(path))
    val bloomCfg = bloomFeature(manifestFeatures(fs, dir))
    // tracked set GROWS to include the z columns (dropping an
    // existing tracked column would silently stop pruning on it)
    val newTracked = (trackedCols(spark, dir) ++ zCols).toSeq.distinct.sorted
    val newStats = statsFor(
      partAwareStatusScan(spark, path, dir, schema, statusesFor(fs, moved)),
      newTracked, withNulls = true, bloom = bloomCfg)
    val movedNames = moved.map(p => new Path(p).getName).toSet
    val replaced = old.map(p => rootRelativeOrName(fs, path, p))
      .filterNot(rel => movedNames(new Path(rel).getName)).toSeq
    publishGeneration(spark, fs, path, dir, newStats, schema,
      newTracked,
      Set("nulls") ++ bloomCfg.map(bloomFeatureLine).toSet ++
        manifestFeatures(fs, dir).filter(_ == CdfFeature),
      manifestSchema = newStats.schema, removedData = replaced,
      markerRetentionMs = markerRetentionMs, opStartMs = opStart,
      op = "OPTIMIZE ZORDER",
      clustered = Some((s"$curve:${zCols.mkString(",")}" +:
        moved.map(p => new Path(p).getName)).mkString("\n")),
      observedParts = Some(observed))
    if (vacuum) vacuumTable(spark, path, retentionMs)
    moved.size
  }

  /** INCREMENTAL RECLUSTER (the liquid-clustering OPTIMIZE shape):
    * recluster ONLY the data files that arrived since the last
    * clustering pass — appends, DML replacements, compaction output —
    * so a maintenance cycle's rewrite cost is proportional to NEW
    * data, never to table size. At 100 TB this is the difference
    * between an hourly maintenance loop and an impossible one: a
    * full [[zorderTable]] rewrite moves the whole table every cycle;
    * this moves only the backlog.
    *
    * The clustering spec (curve + columns) and the clustered-file
    * set come from the [[ClusteredFile]] generation sidecar that a
    * one-time full `OPTIMIZE ZORDER` establishes (the `ALTER TABLE
    * ... CLUSTER BY` registration analog). Backlog = manifest files
    * not on the list (a broadcast anti-join — no O(files) IN
    * literal). Backlog rows are DV-filtered, z/hilbert-sorted with
    * bucket ranges from the CURRENT FULL manifest envelope (so new
    * files land in the same key space as the existing layout), and
    * bin-packed at `targetFileBytes`. Newly written files may
    * overlap existing clusters' z-ranges — the documented liquid
    * tradeoff: per-file min/max pruning still holds, and a periodic
    * full rewrite restores global tightness. Commit semantics are
    * [[rewriteFiles]]' copy-on-write contract (atomic generation,
    * verbatim markers for untouched commits, DV carry for untouched
    * files, time-travel retention); the sidecar is rewritten as
    * (survivors still in the manifest) + (files this pass wrote), so
    * stale names from DML/compaction are pruned each cycle and the
    * list stays O(live files).
    *
    * Returns the number of backlog files reclustered (0 = nothing to
    * do — the cheap steady-state probe).
    */
  def optimizeIncremental(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      vacuum: Boolean = true,
      retentionMs: Long = RetentionDefaultMs,
      markerRetentionMs: Long = RetentionDefaultMs): Int =
      withConcurrentRetry("optimizeIncremental") {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val opStart = System.currentTimeMillis()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = manifestDirOf(fs, path)
    // partitioned tables recluster incrementally too — the backlog
    // rewrite shares zorderTable's within-partition range keys and
    // rewriteFiles' partitionBy staging
    val partColsIncr = partitionColsIn(fs, dir)
    val sidecar = readSidecarIn(fs, dir, ClusteredFile)
    require(sidecar.isDefined,
      s"$path has no clustering spec — run a full OPTIMIZE ZORDER " +
        "(zorderTable) once to establish the clustering columns; " +
        "incremental recluster maintains, it does not bootstrap")
    val lines = sidecar.get.linesIterator.toSeq
    val spec = lines.head
    val Array(curve, colsCsv) = spec.split(":", 2)
    val zCols = colsCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val clusteredNames = lines.tail.filter(_.nonEmpty).toSet
    val observed = listManifestNames(fs, dir)
    val stats = readManifestPinned(spark, dir, observed)
    require(stats.columns.contains("file_size"),
      "optimizeIncremental needs a size-carrying manifest")
    val named = stats.withColumn("__name",
      element_at(split(col("file"), "/"), -1))
    val clusteredDf = spark.createDataset(clusteredNames.toSeq)(
      org.apache.spark.sql.Encoders.STRING).toDF("__cname")
    val backlog = named.join(broadcast(clusteredDf),
      col("__name") === col("__cname"), "left_anti")
    // O(backlog) driver rows — the touched-files pattern
    val backlogFiles = backlog
      .select(col("file"), col("file_size"), col("mod_time")).collect()
    if (backlogFiles.isEmpty) { if (vacuum) vacuumTable(spark, path, retentionMs); return 0 }
    // survivors: clustered names still present in the manifest (one
    // O(live files) name list, the vacuum claim-set shape — bounds
    // the sidecar against stale DML/compaction debris)
    val liveNames = stats.select(element_at(split(col("file"), "/"), -1))
      .collect().map(_.getString(0)).toSet
    val survivors = clusteredNames.intersect(liveNames).toSeq.sorted
    // bucket ranges from the FULL manifest envelope: new files share
    // the existing layout's key space
    val aggs = zCols.flatMap(c =>
      Seq(min(mc(s"min_$c")).cast("bigint"), max(mc(s"max_$c")).cast("bigint")))
    val env = stats.agg(aggs.head, aggs.tail: _*).head()
    val bounds = zCols.zipWithIndex.map { case (c, i) =>
      require(!env.isNullAt(2 * i),
        s"clustering column $c has no non-null values recorded")
      (c, env.getLong(2 * i), env.getLong(2 * i + 1))
    }
    val schema = tableSchemaIn(spark, path, dir)
    val dv = readDvIn(spark, dir)
    val statuses = backlogFiles.map { r =>
      FileStatusWithMetadata(new FileStatus(
        r.getLong(1), false, 1, 128L * 1024 * 1024, r.getLong(2),
        new Path(r.getString(0))))
    }.toSeq
    val backlogBytes = backlogFiles.map(_.getLong(1)).sum
    val nFiles = math.max(1L,
      (backlogBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val bkts = bounds.map { case (c, lo, hi) => bucket16(col(c), lo, hi) }
    val z = curve match {
      case "hilbert" =>
        graft.plans.GraftFunctions.register(spark)
        call_function("graft_hilbert", bkts(0), bkts(1))
      case _ => zValue(bkts)
    }
    val incrKeys = partColsIncr.map(col) :+ col("__z")
    val replacement = applyDv(partAwareStatusScan(spark, path, dir,
        schema, statuses), dv)
      .withColumn("__z", z)
      .repartitionByRange(nFiles, incrKeys: _*)
      .sortWithinPartitions(incrKeys: _*)
      .drop("__z")
    rewriteFiles(spark, fs, path, dir, stats, schema,
      touched = backlogFiles.map(_.getString(0)).toSeq,
      replacement = Some(replacement),
      vacuum = vacuum, retentionMs = retentionMs,
      markerRetentionMs = markerRetentionMs, opStartMs = opStart,
      op = "OPTIMIZE INCREMENTAL",
      clusteredOf = moved => Some((spec +: (survivors ++
        moved.map(p => new Path(p).getName).sorted)).mkString("\n")),
      observedParts = Some(observed))
    backlogFiles.length
  }

  /** Write `df` z-ordered on `zCols` (each as (name, globalMin,
    * globalMax)) into ~`targetFiles` files WITH the stats manifest
    * for those columns: range partition + local sort by z-value, so
    * every file covers a compact z-range — a hypercube-ish region of
    * the column space — and min/max stats prune on EVERY z column,
    * not just a leading sort key. The caller passes the global
    * ranges (usually known, or one cheap agg) so the bucketization
    * is a deterministic plan, not a hidden extra scan per write.
    */
  def writeZOrdered(
      df: DataFrame, path: String,
      zCols: Seq[(String, Long, Long)], targetFiles: Int): Unit = {
    require(zCols.size >= 2 && zCols.size <= 4, "z-order supports 2-4 columns")
    val z = zValue(zCols.map { case (c, lo, hi) => bucket16(col(c), lo, hi) })
    val ordered = df.withColumn("__z", z)
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    writeWithStats(ordered, path, zCols.map(_._1))
  }

  /** Column name of a (resolved or unresolved) attribute node. */
  /** Predicate target as a STATS-KEY string: a bare column name, or
    * a dotted struct-field path (`a.b` — resolved trees carry
    * `GetStructField` chains, Column-DSL trees a multi-part
    * `UnresolvedAttribute`; both normalize to the path the nested
    * stats are tracked under, Delta's nested-column-stats shape).
    */
  private object Attr {
    def unapply(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        Some(u.nameParts.mkString("."))
      case g: org.apache.spark.sql.catalyst.expressions.GetStructField =>
        unapply(g.child).map(p => s"$p.${g.extractFieldName}")
      case _ => None
    }
  }

  /** Manifest stat-column reference by LITERAL name: stats columns
    * for NESTED field paths are named with dots (`min_a.b`), which
    * bare `col()` would mis-parse as struct access — always
    * backtick-quote (a no-op for flat names).
    */
  private[sources] def mc(name: String): Column = col(s"`$name`")

  /** The leaf type of a (possibly nested) field path through
    * `schema`; None when any segment fails to resolve.
    */
  private def fieldTypeOfPath(schema: StructType,
      path: String): Option[DataType] = {
    def walk(dt: DataType, rest: List[String]): Option[DataType] = rest match {
      case Nil => Some(dt)
      case h :: t => dt match {
        case st: StructType =>
          st.fields.find(_.name.equalsIgnoreCase(h)).flatMap(f => walk(f.dataType, t))
        case _ => None
      }
    }
    walk(schema, path.split("\\.").toList)
  }

  /** Column-mapping translation for a stats key that may be a NESTED
    * path: the mapping speaks TOP-LEVEL column names, so only the
    * head segment translates (`a.b` under a→c becomes `c.b`); a flat
    * name maps wholesale.
    */
  private def mapStatsKey(m: Map[String, String], c: String): String = {
    val i = c.indexOf('.')
    if (i < 0) m.getOrElse(c, c)
    else m.get(c.substring(0, i)).fold(c)(h => h + c.substring(i))
  }

  private def minC(a: String): Column = mc(s"min_$a")
  private def maxC(a: String): Column = mc(s"max_$a")
  private def litOf(v: Literal): Column =
    lit(org.apache.spark.sql.catalyst.CatalystTypeConverters
      .convertToScala(v.value, v.dataType))
}

/** A [[FileIndex]] served entirely from manifest rows: the statuses
  * (path, size, mtime) were recorded at write time, so the scan
  * plans with NO filesystem listing and no footer read — the role
  * Delta's log snapshot plays for its reader. Unpartitioned (the
  * manifest's min/max pruning replaces partition pruning); the
  * already-pruned file set is returned for any filter combination.
  */
private[graft] class ManifestFileIndex(
    root: Path, files: Seq[FileStatusWithMetadata],
    partSchema: StructType = new StructType(),
    partitioned: Seq[(InternalRow, Seq[FileStatusWithMetadata])] = Nil)
    extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)

  /** Unpartitioned: one synthetic directory holding every manifest-
    * kept file. Partitioned: one directory per distinct partition
    * tuple, and the partition filters ARE applied here — Spark's
    * FileSourceStrategy removes partition-column conjuncts from the
    * post-scan filter on the assumption that listing-time pruning
    * honored them, so ignoring them would return wrong rows, not
    * just extra files. Binding is by column name against the
    * partition schema (the filters arrive resolved against the
    * relation's own partition attributes).
    */
  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    if (partSchema.isEmpty) Seq(PartitionDirectory(InternalRow.empty, files))
    else {
      val dirs = partitioned.map { case (row, fs) => PartitionDirectory(row, fs) }
      if (partitionFilters.isEmpty) dirs
      else {
        val bound = partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partSchema.fieldNames.indexWhere(_.equalsIgnoreCase(a.name))
            require(i >= 0, s"partition filter references ${a.name}, not a " +
              s"partition column of ${partSchema.fieldNames.mkString(",")}")
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              i, partSchema(i).dataType, partSchema(i).nullable)
        }
        val pred = org.apache.spark.sql.catalyst.expressions.Predicate
          .createInterpreted(bound)
        dirs.filter(d => pred.eval(d.values))
      }
    }

  override def inputFiles: Array[String] = files.map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override val sizeInBytes: Long = files.map(_.getLen).sum

  override def partitionSchema: StructType = partSchema
}

/** LAZY, predicate-aware manifest file index — the Delta
  * TahoeFileIndex shape behind [[DataSkipping.lazyScanPlan]]: the
  * kept-file set is NOT baked at plan construction; `listFiles`
  * receives the query's own (resolved) partition and data filters
  * from `FileSourceScanExec` and evaluates the manifest under them —
  * one distributed filter over O(files) manifest rows, zero listings,
  * zero footer reads, O(kept) driver memory. Nested struct-path
  * predicates, null counts, blooms and generated-column derivation
  * all apply because the evaluation IS [[DataSkipping]]'s skip
  * planner. Partition filters are additionally applied EXACTLY to the
  * listed directories (FileSourceStrategy trusts listing-time
  * pruning), and Spark's own dynamic partition pruning re-filters the
  * listed directories at runtime — which is what makes name-addressed
  * fact⋈dim joins prune files automatically on this surface.
  *
  * Pinned to one manifest generation (`dir`) at construction: a query
  * resolves the snapshot once and every `listFiles` call serves it,
  * so concurrent compaction/DML/overwrite can never tear a plan
  * (replaced files stay on disk for the retention window).
  */
private[graft] class SkippingFileIndex(
    spark: SparkSession, path: String, dir: String,
    schema: StructType, partCols: Seq[String],
    sizeHint: Long) extends FileIndex {

  private val root = new Path(path)
  private val partSchemaV =
    StructType(partCols.map(c => schema(schema.fieldIndex(c))))

  override def rootPaths: Seq[Path] = Seq(root)

  override def partitionSchema: StructType = partSchemaV

  override def refresh(): Unit = ()

  /** Manifest-backed live bytes (DV-discounted) — no listing job;
    * drives broadcast planning exactly like `DESCRIBE DETAIL`.
    */
  override val sizeInBytes: Long = sizeHint

  override def inputFiles: Array[String] =
    DataSkipping.lazySkipStatuses(spark, path, dir, Nil)
      .map(_.getPath.toString).toArray

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val statuses = DataSkipping.lazySkipStatuses(spark, path, dir,
      partitionFilters ++ dataFilters)
    if (partCols.isEmpty) Seq(PartitionDirectory(InternalRow.empty, statuses))
    else DataSkipping.manifestIndexFor(spark, path, partCols, partSchemaV,
        statuses)
      .listFiles(partitionFilters, dataFilters)
  }
}
