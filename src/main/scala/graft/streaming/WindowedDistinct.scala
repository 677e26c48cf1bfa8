package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed APPROXIMATE DISTINCT — "distinct users per
  * hour" as a stream, the aggregation exact streaming distinct
  * cannot express at scale: `COUNT(DISTINCT)` per window keeps every
  * distinct value in state, and Structured Streaming refuses the
  * two-level aggregation a naive sketch needs (window agg over a
  * bucket agg). The HLL register merge collapses both into ONE
  * streaming aggregation — `groupBy(window, keys, bucket).max(rho)`
  * — because `max` is the whole merge: state per (window, keys)
  * is bounded by 2^p registers whatever the stream's cardinality,
  * and the watermark evicts closed windows exactly like any
  * windowed aggregate ([[WindowedAgg]]'s state contract).
  *
  * The register stream lands wherever the caller sinks it (append
  * mode emits each window's final registers once the watermark
  * closes it); [[estimates]] folds a landed register frame to
  * per-window estimates with [[Sketches.estimate]]'s exact
  * arithmetic — bit-identical to batch-sketching the same rows.
  */
object WindowedDistinct {

  /** The windowed register stream: window_start, window_end,
    * keys..., hll_bucket, hll_rho.
    */
  def registers(
      stream: DataFrame,
      tsCol: String,
      windowDur: String,
      watermark: String = "1 hour",
      keys: Seq[String] = Nil,
      valueCol: String,
      p: Int = 12): DataFrame = {
    val withWm =
      if (stream.isStreaming) stream.withWatermark(tsCol, watermark) else stream
    val (bucket, rho) = Sketches.registerColumns(col(valueCol), p)
    withWm
      // registerColumns contract: NULL values must not reach the
      // registers (COUNT(DISTINCT) ignores them; a NULL bucket row
      // would inflate the estimate)
      .filter(col(valueCol).isNotNull)
      .groupBy(window(col(tsCol), windowDur) +: keys.map(col)
        :+ bucket.as("hll_bucket"): _*)
      .agg(max(rho).as("hll_rho"))
      .select(Seq(col("window.start").as("window_start"),
        col("window.end").as("window_end")) ++
        keys.map(col) ++ Seq(col("hll_bucket"), col("hll_rho")): _*)
  }

  /** Per-window estimates from a landed register frame. */
  def estimates(registerFrame: DataFrame, keys: Seq[String],
      p: Int): DataFrame =
    Sketches.estimate(registerFrame,
      Seq("window_start", "window_end") ++ keys, p)
}
