package graft.streaming

/** Opt-in per-batch fold-timing collector for the streaming
  * maintenance composites (incremental views, continuous SCD2).
  *
  * The gate composites for these operators are dominated by FIXED
  * costs — full base-table write, several DML generations, one or
  * two streaming-query startups — which hides the number that
  * actually matters at serving cadence: the steady-state cost of
  * folding ONE micro-batch into the view (r9 verdict #8). With the
  * collector enabled (graft.Bench does; production never pays — a
  * single volatile read per batch otherwise), every foreachBatch
  * fold records (kind, batchId, seconds), and the bench artifact
  * emits them as `fold_sec` next to the composite totals, so a fold
  * regression is visible even when the composite number is flat.
  */
object FoldTimings {
  @volatile private var on = false
  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Double)]()

  def enable(): Unit = on = true

  def timed[T](kind: String, batchId: Long)(body: => T): T =
    if (!on) body
    else {
      val t0 = System.nanoTime()
      try body
      finally buf.add((kind, batchId, (System.nanoTime() - t0) / 1e9))
    }

  /** All recorded folds in arrival order; empties the buffer. */
  def drain(): Seq[(String, Long, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Long, Double)]()
    var e = buf.poll()
    while (e != null) { out += e; e = buf.poll() }
    out.toSeq
  }
}
