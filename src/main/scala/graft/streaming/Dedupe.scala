package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exactly-once deduplication.
  *
  * Re-expresses the reference's silver-stream dedup
  * (pos-dlt `03_Bronze-to-Silver ETL.py:321-322`:
  * `dropDuplicates(['trans_id','item_id'])` on the parsed Kafka
  * stream) with the state-eviction discipline a production stream
  * needs: an event-time watermark bounds the dedup state, so at
  * 100 TB/day the state store holds only the watermark window, not
  * the full key history.
  */
object Dedupe {

  /** Keep the first occurrence of each key combination, with dedup
    * state evicted once `eventTimeCol` falls behind the watermark.
    *
    * Exactly-once semantics: duplicates arriving within the
    * watermark delay are dropped; duplicates older than the
    * watermark have already been finalized downstream.
    */
  def exactlyOnce(
      stream: DataFrame,
      keys: Seq[String],
      eventTimeCol: String,
      watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicates(keys :+ eventTimeCol)

  /** Variant keyed WITHOUT the event-time column: two rows with the
    * same keys but different timestamps are still duplicates (the
    * reference's exact shape — trans_id+item_id identify a line).
    * Uses `dropDuplicatesWithinWatermark`, which only requires
    * duplicates to arrive within the watermark delay of each other.
    */
  def exactlyOnceByKey(
      stream: DataFrame,
      keys: Seq[String],
      eventTimeCol: String,
      watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keys)
}
