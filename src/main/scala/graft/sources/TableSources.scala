package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema'd batch CSV ingest — the reference's static-dim contract.
  *
  * pos-dlt `03_Bronze-to-Silver ETL.py:116-227` reads every dim/fact
  * CSV with an explicit StructType (never inference) and an explicit
  * `timestampFormat`; `02_Data Generation.py:98-103` fixes that
  * format. Same discipline here: explicit schemas for the test
  * tables, explicit timestamp format, header on.
  */
object TableSources {

  val defaultTimestampFormat = "yyyy-MM-dd HH:mm:ss[.SSSSSS]"

  def csv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      timestampFormat: String = defaultTimestampFormat,
      header: Boolean = true,
      sep: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", sep)
      .option("timestampFormat", timestampFormat)
      .csv(path)

  // Explicit StructTypes for the test-table star schema (the analog
  // of the reference's store/item/change-type/snapshot schemas).

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def region(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, regionSchema)
  def nation(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, nationSchema)
  def supplier(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, supplierSchema)
  def events(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, eventsSchema)
}
