package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Registry + freshness contract for incrementally-maintained
  * aggregate views ([[graft.streaming.IncrementalView]]), powering the
  * automatic query rewrite ([[GraftMvRewrite]]) — the materialized-
  * view answering path every warehouse engine ships: a grouped
  * aggregate over a 100 TB base table that a maintained view already
  * summarizes should cost O(view), not O(table), without the query
  * author knowing the view exists.
  *
  * Safety model (the part that matters at scale):
  *
  *  - A view is only SERVED while provably FRESH: the maintenance run
  *    stamps the base-table version it folded through into the view's
  *    carried idempotent-writer map (`_txn.json`, the same sidecar
  *    the folds' exactly-once stamps ride), and the rewrite compares
  *    that watermark against the base's CURRENT version at
  *    optimization time. Any base commit after the last refresh —
  *    DML, append, even a data-invisible OPTIMIZE — makes the check
  *    fail and the query silently falls back to the always-correct
  *    base scan. Staleness errors are therefore one-sided: a lost or
  *    lagging stamp costs performance, never correctness.
  *  - The stamp is written AFTER the maintenance stream drains, as an
  *    in-place atomic-rename merge into the current generation's txn
  *    sidecar (the [[DataSkipping.enableChangeFeed]] shape). It is
  *    deliberately NOT part of any fold commit: a crash between drain
  *    and stamp leaves a correct-but-unstamped view (conservative),
  *    and the single-maintainer contract every view already has means
  *    no concurrent view commit can race the rename.
  *  - Only EXACT-arithmetic value columns register for rewrite:
  *    integral types, and decimals the fold's DECIMAL(20,6) cast
  *    round-trips losslessly (scale ≤ 6, integral digits ≤ 14). A
  *    float/double column's view is still maintained and readable,
  *    but its decimal fold is not bit-identical to the base
  *    aggregate, so it must never silently answer for it.
  *
  * The registry itself is in-memory (per JVM, keyed by fully
  * qualified base path — the view's `_mv.json` root sidecar makes a
  * view self-describing so [[attach]] can re-register it in a fresh
  * session). An in-memory registry is the right scope: serving a view
  * is a session-level opt-in, exactly like Spark's own
  * `spark.sql.extensions`.
  */
object MaterializedViews {

  /** One registered view of one base table. `kind` is the maintainer
    * family: `sum_count` (sum_value/cnt), `min_max`
    * (min_value/max_value/cnt), `moments` (sum_value/sum_sq/cnt).
    */
  case class MvSpec(base: String, view: String, groupCol: String,
      valueCol: String, kind: String)

  /** Txn-map app id carrying the folded-through base version. One
    * constant suffices — a view tracks exactly one base table, whose
    * identity lives in the spec sidecar.
    */
  private[sources] val FreshApp = "graft-mv:folded-base-version"

  /** Root-level view sidecar (survives generations like the vector
    * index's model file).
    */
  private[sources] val SpecFile = "_mv.json"

  // base (qualified) -> view (qualified) -> spec
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, MvSpec]]

  /** Fully qualified form both sides of every lookup use — relation
    * paths arrive as raw strings ("/t/x") or URIs ("file:/t/x")
    * depending on the surface that built them.
    */
  private[sources] def qualified(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
  }

  /** Can the fold's DECIMAL(20,6) value cast round-trip this type
    * losslessly? Exactness is the rewrite's correctness contract —
    * see class doc.
    */
  private[sources] def exactValueType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case d: DecimalType => d.scale <= 6 && d.precision - d.scale <= 14
    case _ => false
  }

  /** Register `spec` for rewrite if its value column is exact (see
    * [[exactValueType]]); returns whether it was registered. Always
    * validates the columns against the base schema.
    */
  def register(spark: SparkSession, spec: MvSpec): Boolean = {
    val base = qualified(spark, spec.base)
    val view = qualified(spark, spec.view)
    val schema = spark.read.format("graft").load(spec.base).schema
    val resolver = spark.sessionState.conf.resolver
    require(schema.exists(f => resolver(f.name, spec.groupCol)),
      s"group column ${spec.groupCol} is not in ${spec.base}'s schema")
    val valueField = schema.find(f => resolver(f.name, spec.valueCol))
    require(valueField.nonEmpty,
      s"value column ${spec.valueCol} is not in ${spec.base}'s schema")
    if (!exactValueType(valueField.get.dataType)) false
    else {
      val q = spec.copy(base = base, view = view)
      registry.compute(base, (_, cur) =>
        (if (cur == null) Map.empty[String, MvSpec] else cur)
          .updated(view, q))
      true
    }
  }

  /** Views registered for `basePath` (already-qualified key). */
  private[sources] def viewsOf(spark: SparkSession,
      basePath: String): Seq[MvSpec] = {
    val m = registry.get(qualified(spark, basePath))
    if (m == null) Nil else m.values.toSeq.sortBy(_.view)
  }

  private[sources] def isEmpty: Boolean = registry.isEmpty

  /** Test hook: drop every registration (the serving opt-in is
    * session-level; specs persist in each view's sidecar).
    */
  def clear(): Unit = registry.clear()

  /** Persist the spec sidecar at the view root (write-aside + atomic
    * rename — crash leaves old or new, never truncated), register,
    * and advance the freshness watermark to `foldedVersion`. Called
    * by the maintainers after every successful drain. The stream
    * checkpoint rides the sidecar so `REFRESH INCREMENTAL VIEW` can
    * resume maintenance from the path alone.
    */
  private[graft] def onMaintained(spark: SparkSession, spec: MvSpec,
      checkpoint: String, foldedVersion: Long): Unit = {
    val fs = new Path(spec.view)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val specPath = new Path(spec.view, SpecFile)
    val json = DataSkipping.constraintsToJson(Map(
      "base" -> qualified(spark, spec.base),
      "groupCol" -> spec.groupCol, "valueCol" -> spec.valueCol,
      "kind" -> spec.kind, "checkpoint" -> checkpoint))
    val existing =
      if (!fs.exists(specPath)) None
      else {
        val in = fs.open(specPath)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8))
        finally in.close()
      }
    if (!existing.contains(json)) {
      val tmp = new Path(spec.view, s".mv-${java.util.UUID.randomUUID}")
      val out = fs.create(tmp, false)
      try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      org.apache.hadoop.fs.FileContext
        .getFileContext(tmp.toUri, spark.sparkContext.hadoopConfiguration)
        .rename(tmp, specPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    register(spark, spec)
    stampFoldedVersion(spark, spec.view, foldedVersion)
  }

  /** The spec a view's `_mv.json` sidecar declares, plus the stream
    * checkpoint its maintenance runs against.
    */
  def specOf(spark: SparkSession, viewPath: String): (MvSpec, String) = {
    val fs = new Path(viewPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(viewPath, SpecFile)
    require(fs.exists(p), s"$viewPath carries no $SpecFile sidecar — " +
      "only maintained views (IncrementalView.maintain*) are attachable")
    val in = fs.open(p)
    val json = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val m = DataSkipping.constraintsFromJson(json)
    (MvSpec(m("base"), qualified(spark, viewPath),
      m("groupCol"), m("valueCol"), m("kind")),
      m.getOrElse("checkpoint", ""))
  }

  /** Re-register a view from its `_mv.json` sidecar in a session that
    * did not run the maintenance (the cross-session serving path).
    * Returns the spec; registration still applies the exact-value
    * check against the CURRENT base schema.
    */
  def attach(spark: SparkSession, viewPath: String): MvSpec = {
    val spec = specOf(spark, viewPath)._1
    register(spark, spec)
    spec
  }

  /** Advance the view's folded-through watermark (monotone max) by
    * merging into the CURRENT generation's txn sidecar in place.
    * In-place is safe here where it would not be for fold stamps: the
    * single-maintainer contract serializes all view commits with this
    * rename, the map carries forward into every later generation
    * verbatim, and a lost update is only ever conservative (see class
    * doc).
    */
  private[sources] def stampFoldedVersion(spark: SparkSession,
      viewPath: String, version: Long): Unit = {
    val fs = new Path(viewPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = DataSkipping.manifestDirOf(fs, viewPath)
    val cur = DataSkipping.readSidecarIn(fs, dir, DataSkipping.TxnFile)
      .map(DataSkipping.txnMapFromJson).getOrElse(Map.empty)
    if (!cur.get(FreshApp).exists(_ >= version)) {
      val merged = cur.updated(FreshApp,
        cur.get(FreshApp).fold(version)(_ max version))
      val tmp = new Path(dir, s".txn-${java.util.UUID.randomUUID}")
      val out = fs.create(tmp, false)
      try out.write(DataSkipping.txnMapToJson(merged)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      org.apache.hadoop.fs.FileContext
        .getFileContext(tmp.toUri, spark.sparkContext.hadoopConfiguration)
        .rename(tmp, new Path(dir, DataSkipping.TxnFile),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** The serving gate: the view answers only when its folded-through
    * watermark covers the base's CURRENT version. Two sidecar/listing
    * reads, both O(1)-ish; runs only after a structural plan match.
    */
  private[sources] def isFresh(spark: SparkSession, spec: MvSpec): Boolean = {
    val baseVersion = DataSkipping.tableVersions(spark, spec.base)
      .maxOption.getOrElse(Long.MaxValue)
    DataSkipping.txnVersion(spark, spec.view, FreshApp)
      .exists(_ >= baseVersion)
  }
}
