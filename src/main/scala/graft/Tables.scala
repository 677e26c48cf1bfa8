package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema'd accessors for the driver-generated test tables.
  *
  * Mirrors the reference's static-table ingest surface
  * (pos-dlt `03_Bronze-to-Silver ETL.py:116-227` reads schema'd CSVs
  * into dim tables); here the canonical store is parquet, so schemas
  * travel with the files and Catalyst prunes columns at the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.parquet` has shipped with two `ts` physical layouts
    * across testdata generations, both normalized here to a session-tz
    * micros TIMESTAMP so every consumer sees one type:
    *
    *  - plain `timestamp[us]` (current): surfaces as TIMESTAMP_NTZ;
    *    cast to TIMESTAMP (shift-free — every session in this repo
    *    pins spark.sql.session.timeZone=UTC) so event-time windows,
    *    watermarks and `unix_millis` downstream keep the type they
    *    were built against.
    *  - INT64 TIMESTAMP(NANOS) (legacy), which the Spark 4 parquet
    *    reader rejects outright: read as a raw long (`nanosAsLong`)
    *    and truncate to micros with integer division (`div`, not `/`
    *    — a double division would lose precision above 2^53 ns and
    *    round instead of truncating). Truncation matches DuckDB,
    *    which surfaces the same column as a micros TIMESTAMP.
    *
    * KNOWN SESSION-WIDE SIDE EFFECT (legacy layout only, harmless for
    * `timestamp[us]` files): the flag must be set on the session, not
    * scoped to this read — a per-read
    * `.option("spark.sql.legacy.parquet.nanosAsLong", "true")` is
    * honored during schema inference but overwritten from the
    * session conf when the execution-side reader is built (verified
    * against Spark 4.1: tasks then fail with PARQUET_TYPE_ILLEGAL),
    * and a set/restore pair breaks the returned lazy frame the same
    * way. Net effect on other reads: nano-timestamp columns
    * elsewhere surface as long instead of erroring.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // shift-free only under UTC — a non-UTC session would silently
        // move every event timestamp; fail loudly instead
        require(s.conf.get("spark.sql.session.timeZone") == "UTC",
          "Tables.events casts TIMESTAMP_NTZ assuming " +
            "spark.sql.session.timeZone=UTC; set it on the session builder")
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts read as unexpected type $other — expected INT64 " +
          "(nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP; fix the reader " +
          "instead of letting downstream window/unix_millis consumers " +
          "fail obscurely")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
