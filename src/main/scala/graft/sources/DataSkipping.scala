package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

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
object DataSkipping {

  val StatsDir = "_graft_stats"
  val SchemaFile = "_table_schema.json"
  val StatsColsFile = "_stats_cols.txt"
  val FeaturesFile = "_manifest_features.txt"
  private val SwapPrefix = ".stats-swap-"

  /** Complete a torn manifest swap: compactTable builds the whole
    * replacement stats dir offline and swaps it in (delete + rename)
    * — a crash between the two leaves the table without a manifest
    * but WITH the fully-built swap dir, which this finishes. Called
    * at the entry of every manifest-touching operation; one
    * `exists` check when the table is healthy.
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
    */
  def writeWithStats(df: DataFrame, path: String, statsCols: Seq[String],
      bloomCols: Seq[String], bloomBits: Int = 1 << 16,
      bloomHashes: Int = 7): Unit = {
    require(statsCols.nonEmpty, "at least one stats column")
    df.write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    val written = spark.read.parquet(path)
    val bloom = if (bloomCols.isEmpty) None
      else Some((bloomCols, bloomBits, bloomHashes))
    statsFor(written, statsCols, withNulls = true, bloom)
      .write.mode("overwrite").parquet(s"$path/$StatsDir")
    writeSidecars(spark, s"$path/$StatsDir", written.schema, statsCols,
      Set("nulls") ++ bloom.map(b => bloomFeatureLine(b)).toSet)
  }

  private def bloomFeatureLine(b: (Seq[String], Int, Int)): String =
    s"bloom:${b._2}:${b._3}:${b._1.mkString(",")}"

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
      path: String, statsColumns: Array[String]): Map[String, Int] =
    bloomFeature(manifestFeatures(fs, path)) match {
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
      bloom: Option[(Seq[String], Int, Int)] = None): DataFrame = {
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
    scan.select(col("*"), col("_metadata"))
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
  }

  /** O(1) manifest feature flags ("nulls" = per-file null counts
    * present). Absent file = legacy manifest, no flags.
    */
  private def manifestFeatures(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Set[String] = {
    val p = new Path(s"$path/$StatsDir/$FeaturesFile")
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  /** Schema + tracked-columns + feature sidecars into `dir` (the
    * live stats dir, or a swap dir being built offline).
    */
  private def writeSidecars(spark: SparkSession, dir: String,
      schema: StructType, statsCols: Seq[String],
      features: Set[String] = Set("nulls")): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(name: String, content: String): Unit = {
      val out = fs.create(new Path(dir, name), true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    put(SchemaFile, schema.json)
    put(StatsColsFile, statsCols.mkString("\n"))
    put(FeaturesFile, features.toSeq.sorted.mkString("\n"))
  }

  /** Tracked stats columns from the sidecar (O(1)); falls back to a
    * manifest listing + footer read for pre-sidecar tables.
    */
  private def trackedCols(spark: SparkSession, path: String): Set[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(s"$path/$StatsDir/$StatsColsFile")
    if (fs.exists(p)) {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).toSet
      finally in.close()
    } else spark.read.parquet(s"$path/$StatsDir").columns
      .collect { case c if c.startsWith("min_") => c.drop(4) }.toSet
  }

  /** Append a batch to an existing stats table WITHOUT touching what
    * is already there: data files are written to a hidden staging dir
    * and moved into the table root, then the manifest GAINS rows for
    * exactly those files (parquet append). Nothing lists or re-scans
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
    * [[compactTable]] (which rebuilds the manifest from live files
    * it rewrites and vacuums the rest).
    *
    * The batch schema must equal the stored sidecar schema
    * (name + type, nullability ignored): schema EVOLUTION is
    * [[graft.streaming.FileIngest]]'s job at the ingest boundary,
    * not a property of the storage layout.
    *
    * NAMED COMMITS (`commitName`) — the exactly-once hook for
    * at-least-once writers (Structured Streaming's foreachBatch): the
    * batch's manifest rows land as ONE parquet file named
    * `<commitName>.parquet` inside the stats dir, and that file IS
    * the commit marker (an empty batch still writes a zero-row
    * marker — the marker's existence is the commit, unconditionally).
    * A replayed batch whose marker already exists is skipped up front
    * (returns false, nothing written); a crash after the data-file
    * move but before the marker leaves orphan data files that
    * manifest readers never see — the replay re-writes the batch and
    * commits, and the orphans are reclaimed by [[compactTable]]'s
    * vacuum (which deletes everything the new manifest doesn't
    * claim). Manifest-reader-visible state is therefore exactly-once
    * per commit name; names must not start with `part-` (reserved
    * for plain manifest parts, and how compaction tells markers
    * apart to preserve them).
    *
    * `statsCols` must match the table's tracked column set — a
    * mixed-schema manifest would silently mis-prune (the reader
    * adopts one file's schema and sees nulls for the other's rows).
    *
    * @return true if the batch committed; false if `commitName` was
    *         already present (idempotent replay skip)
    */
  def appendWithStats(
      df: DataFrame, path: String, statsCols: Seq[String],
      commitName: Option[String] = None): Boolean = {
    require(statsCols.nonEmpty, "at least one stats column")
    commitName.foreach(n => require(
      n.matches("[A-Za-z0-9][A-Za-z0-9._-]*") && !n.startsWith("part-"),
      s"commitName '$n' must start with an alphanumeric and use only " +
        "[A-Za-z0-9._-] (a '_'/'.' prefix would HIDE the marker from the " +
        "manifest reader — a committed-then-vacuumed batch; 'part-' is " +
        "reserved for plain manifest parts)"))
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    repairStatsSwap(fs, path)
    require(fs.exists(new Path(s"$path/$StatsDir/$SchemaFile")),
      s"$path is not a stats table with a schema sidecar; use writeWithStats first")
    val marker = commitName.map(n => new Path(s"$path/$StatsDir", s"$n.parquet"))
    if (marker.exists(fs.exists)) return false
    val tracked = trackedCols(spark, path)
    require(statsCols.toSet == tracked,
      s"statsCols [${statsCols.sorted.mkString(",")}] must equal the table's " +
        s"tracked columns [${tracked.toSeq.sorted.mkString(",")}] — a mixed-schema " +
        "manifest silently drops files from pruned reads")
    val stored = tableSchema(spark, path)
    require(df.schema.map(f => (f.name, f.dataType)) ==
      stored.map(f => (f.name, f.dataType)),
      s"append schema ${df.schema.simpleString} must match stored " +
        s"${stored.simpleString}; no evolution on the append path")
    val staging = new Path(path, s".append-${java.util.UUID.randomUUID}")
    df.write.parquet(staging.toString)
    val moved = moveIn(fs, staging, new Path(path))
    val batchStats =
      if (moved.nonEmpty) {
        // match the table's manifest generation: appending null-count
        // or bloom columns to a legacy manifest (or vice versa) is
        // the mixed-schema mis-pruning the statsCols check forbids.
        // Legacy tables are upgraded wholesale by compactTable.
        val feats = manifestFeatures(fs, path)
        statsFor(spark.read.schema(stored).parquet(moved: _*),
          statsCols, withNulls = feats.contains("nulls"), bloom = bloomFeature(feats))
      }
      else spark.read.parquet(s"$path/$StatsDir").limit(0) // zero-row marker
    marker match {
      case None if moved.isEmpty => ()
      case None =>
        batchStats.write.mode("append").parquet(s"$path/$StatsDir")
      case Some(dest) =>
        writeManifestFile(spark, fs, path, batchStats, dest)
    }
    true
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

  /** OPTIMIZE-style bin-packing: rewrite the table's CURRENT file set
    * (as the manifest defines it) into ~ceil(bytes/targetFileBytes)
    * files, publish a fresh manifest, then vacuum the replaced data
    * files. Ingest-cadence appends leave a long tail of small files;
    * at scale the per-file costs (open, footer, task schedule,
    * manifest row) dominate a scan of many small files — this is the
    * maintenance pass that pays that debt down, the role OPTIMIZE
    * plays for Delta.
    *
    * The MANIFEST is the snapshot commit point: manifest readers see
    * the pre-compaction file set until the new manifest is fully
    * written, then the post-compaction one — never a mix. Named
    * commit markers (see [[appendWithStats]]) SURVIVE compaction:
    * their rows are folded into the rewritten files, but each marker
    * name is re-created as a zero-row manifest file, so a streaming
    * replay after compaction still short-circuits instead of
    * re-appending an already-folded batch. The driver materializes
    * the file list being replaced ((path) rows — the same
    * O(snapshot files) any OPTIMIZE planner holds).
    *
    * VACUUM (`vacuum = true`, default) deletes every data file in
    * the table root the manifest doesn't claim — the replaced files
    * AND any orphans from crashed appends or a previously crashed
    * compaction — plus stale hidden staging dirs, which makes
    * compaction self-repairing: crash debris only survives until the
    * next successful run. Vacuum runs EVEN when the table already
    * meets the size target (a no-op compact is still the documented
    * orphan-reclamation path). `vacuum = false` keeps everything on
    * disk (manifest-invisible) for manual rollback. Compaction is a
    * single-writer maintenance op: plain-path readers and concurrent
    * writers (including a live stream) must not race it (Delta needs
    * its log + vacuum discipline for exactly the same reason).
    *
    * CRASH SAFETY of the manifest swap: the complete replacement
    * stats dir — part files, sidecars, preserved markers — is built
    * OFFLINE in a hidden swap dir, then swapped in (delete old +
    * rename new). A crash between the delete and the rename leaves
    * the table manifest-less but with the fully-built swap dir, and
    * every manifest-touching entry point completes the rename first
    * ([[repairStatsSwap]]) — markers can never be lost to a torn
    * compaction.
    *
    * Returns the number of files after compaction, or 0 if the table
    * already meets the target (no rewrite — vacuum still runs).
    */
  def compactTable(
      spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      vacuum: Boolean = true): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val statsDir = new Path(s"$path/$StatsDir")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    repairStatsSwap(fs, path)
    val stats = spark.read.parquet(statsDir.toString)
    require(stats.columns.contains("file_size"),
      "compactTable needs a size-carrying manifest (rewrite with writeWithStats)")
    val statsCols = stats.columns.collect { case c if c.startsWith("min_") => c.drop(4) }.toSeq
    val old = stats.select(col("file"), col("file_size")).collect()
    val totalBytes = old.map(_.getLong(1)).sum
    val target = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    if (target >= old.length) {
      // no rewrite, but vacuum is still the orphan-reclamation path
      if (vacuum) sweepUnclaimed(fs, path,
        old.map(r => new Path(r.getString(0)).getName).toSet)
      return 0
    }
    val schema = tableSchema(spark, path)
    // named commit markers to preserve across the manifest rewrite
    val markers = fs.listStatus(statsDir).map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("part-")).toSeq
    // rewrite the current snapshot: coalesce (no shuffle) into the
    // target file count, staged hidden, then moved in — invisible to
    // manifest readers until the manifest swap below
    val staging = new Path(path, s".compact-${java.util.UUID.randomUUID}")
    val snapshot = spark.read.schema(schema).parquet(old.map(_.getString(0)): _*)
    snapshot.coalesce(target).write.parquet(staging.toString)
    val moved = moveIn(fs, staging, new Path(path))
    // build the COMPLETE replacement stats dir offline: manifest
    // parts, sidecars, and the preserved markers (zero-row manifest
    // files — one Spark write, filesystem copies while still hidden)
    val swap = new Path(path, s"$SwapPrefix${java.util.UUID.randomUUID}")
    // the rewrite always emits null counts (the legacy→v2 upgrade
    // moment) and preserves the table's bloom configuration
    val bloomCfg = bloomFeature(manifestFeatures(fs, path))
    val newStats = statsFor(spark.read.schema(schema).parquet(moved: _*),
      statsCols, withNulls = true, bloom = bloomCfg)
    newStats.write.parquet(swap.toString)
    writeSidecars(spark, swap.toString, schema, statsCols,
      Set("nulls") ++ bloomCfg.map(bloomFeatureLine).toSet)
    if (markers.nonEmpty) {
      val tmp = new Path(path, s".markers-${java.util.UUID.randomUUID}")
      newStats.limit(0).write.parquet(tmp.toString)
      val part = fs.listStatus(tmp)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      require(part.length == 1, s"expected one marker part, got ${part.length}")
      markers.foreach { n =>
        org.apache.hadoop.fs.FileUtil.copy(fs, part.head.getPath,
          fs, new Path(swap, n), false,
          spark.sparkContext.hadoopConfiguration)
      }
      fs.delete(tmp, true)
    }
    // the swap: delete old, rename new. The gap is repaired by
    // repairStatsSwap at every entry point.
    fs.delete(statsDir, true)
    require(fs.rename(swap, statsDir), s"stats swap rename to $statsDir failed")
    if (vacuum) sweepUnclaimed(fs, path, moved.map(p => new Path(p).getName).toSet)
    moved.size
  }

  /** Delete every visible data file the manifest doesn't claim and
    * every stale hidden staging dir (crashed append/compact debris).
    * Single-writer maintenance only — a live writer's staging would
    * be swept.
    */
  private def sweepUnclaimed(fs: org.apache.hadoop.fs.FileSystem,
      path: String, keep: Set[String]): Unit = {
    val stagingPrefixes =
      Seq(".append-", ".compact-", ".stats-", ".markers-", SwapPrefix)
    fs.listStatus(new Path(path)).foreach { f =>
      val n = f.getPath.getName
      if (f.isFile && !n.startsWith("_") && !n.startsWith(".") && !keep(n))
        fs.delete(f.getPath, false)
      else if (f.isDirectory && stagingPrefixes.exists(n.startsWith))
        fs.delete(f.getPath, true)
    }
  }

  /** Table schema from the manifest sidecar; falls back to reading
    * the data files (a listing + footer) for pre-sidecar manifests.
    */
  private def tableSchema(spark: SparkSession, path: String): StructType = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(s"$path/$StatsDir/$SchemaFile")
    if (fs.exists(p)) {
      val in = fs.open(p)
      try DataType.fromJson(new String(
        in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
        .asInstanceOf[StructType]
      finally in.close()
    } else spark.read.parquet(path).schema
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

  /** Shared planning preamble for the pruning entry points: repair a
    * torn swap, load the manifest, derive the tracked/null/bloom
    * column sets, and rewrite `predicate` into the file-skip filter.
    * Returns (manifest frame, table schema, skip filter).
    */
  private def planSkip(spark: SparkSession, path: String,
      predicate: Column): (DataFrame, StructType, Column) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    repairStatsSwap(fs, path)
    graft.plans.GraftFunctions.register(spark)
    val stats = spark.read.parquet(s"$path/$StatsDir")
    val tracked = stats.columns.collect { case c if c.startsWith("min_") => c.drop(4) }.toSet
    val nullsTracked = stats.columns.collect { case c if c.startsWith("nulls_") => c.drop(6) }.toSet
    val bloomIdx = bloomIndex(fs, path, stats.columns)
    val schema = tableSchema(spark, path)
    val cond = resolvedCondition(spark, schema, predicate)
    (stats, schema, rewrite(cond, tracked, nullsTracked, bloomIdx).getOrElse(lit(true)))
  }

  /** (files the predicate might match, all files) from the manifest.
    * DRIVER-SIDE LISTS — the test/diagnostic surface for pruning
    * counts. The scan path is [[readSkipping]], which never
    * materializes the all-files list.
    */
  def prunedFiles(
      spark: SparkSession, path: String,
      predicate: Column): (Seq[String], Seq[String]) = {
    val (stats, _, skip) = planSkip(spark, path, predicate)
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
  def readSkipping(spark: SparkSession, path: String, predicate: Column): DataFrame = {
    val (stats, schema, skip) = planSkip(spark, path, predicate)
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
      val relation = HadoopFsRelation(
        new ManifestFileIndex(new Path(path), statuses),
        partitionSchema = new StructType(),
        dataSchema = schema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat,
        options = Map.empty)(classic)
      classic.baseRelationToDataFrame(relation).filter(predicate)
    }
  }

  /** Rewrite a row predicate into a file-stats predicate over
    * min_/max_ (and, per manifest features, nulls_/bloom_) columns.
    * None = cannot skip on this expression. `bloom` maps each
    * bloom-indexed column to its probe count; equality and IN terms
    * on those columns ALSO require the per-file Bloom to admit the
    * value — the pruning that works where min/max ranges are useless
    * (unclustered high-cardinality columns).
    */
  private[sources] def rewrite(e: Expression, tracked: Set[String],
      nullsTracked: Set[String] = Set.empty,
      bloom: Map[String, Int] = Map.empty): Option[Column] = {
    def eqTerm(a: String, v: Literal): Column = {
      val range = minC(a) <= litOf(v) && maxC(a) >= litOf(v)
      bloom.get(a).fold(range)(k => range &&
        call_function("graft_bloom_contains_col",
          xxhash64(litOf(v)), col(s"bloom_$a"), lit(k)))
    }
    e match {
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
      Some(col(s"nulls_$a") > 0L)
    case IsNotNull(Attr(a)) if nullsTracked(a) =>
      Some(col("n_rows") > col(s"nulls_$a"))
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
      Some(vs.map { case Lit(v) => eqTerm(a, v) }.reduce(_ || _))
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

/** A [[FileIndex]] served entirely from manifest rows: the statuses
  * (path, size, mtime) were recorded at write time, so the scan
  * plans with NO filesystem listing and no footer read — the role
  * Delta's log snapshot plays for its reader. Unpartitioned (the
  * manifest's min/max pruning replaces partition pruning); the
  * already-pruned file set is returned for any filter combination.
  */
private[sources] class ManifestFileIndex(
    root: Path, files: Seq[FileStatusWithMetadata]) extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, files))

  override def inputFiles: Array[String] = files.map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override val sizeInBytes: Long = files.map(_.getLen).sum

  override def partitionSchema: StructType = new StructType()
}
