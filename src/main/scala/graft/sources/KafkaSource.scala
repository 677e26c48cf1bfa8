package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.operators.PayloadParser

/** Kafka / event-hub stream source configuration.
  *
  * Re-expresses the reference's bronze ingest
  * (pos-dlt `03_Bronze-to-Silver ETL.py:246-262`: an Event Hub
  * consumed through its Kafka endpoint with SASL_SSL + PLAIN JAAS
  * auth, `startingOffsets`, and throughput capped per trigger).
  * The environment has no broker (and no kafka connector jar), so
  * the option builder and the payload transform are the tested
  * surface; `reader` wires them onto any session where the
  * connector is present.
  */
object KafkaSource {

  final case class Config(
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None,
      saslJaas: Option[String] = None,
      saslMechanism: String = "PLAIN",
      securityProtocol: String = "SASL_SSL")

  /** The exact option map `spark.readStream.format("kafka")` needs —
    * mirrors the reference's kafka.* option block one for one.
    */
  def options(cfg: Config): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "subscribe" -> cfg.topic,
      "startingOffsets" -> cfg.startingOffsets)
    val sasl = cfg.saslJaas.map(jaas => Map(
      "kafka.security.protocol" -> cfg.securityProtocol,
      "kafka.sasl.mechanism" -> cfg.saslMechanism,
      "kafka.sasl.jaas.config" -> jaas)).getOrElse(Map.empty)
    val cap = cfg.maxOffsetsPerTrigger
      .map(n => Map("maxOffsetsPerTrigger" -> n.toString)).getOrElse(Map.empty)
    base ++ sasl ++ cap
  }

  /** A JAAS config line for SASL PLAIN (the shape the reference
    * builds from its connection string). Defaults to the OSS kafka
    * client's login module — the class that exists on a plain Spark
    * + spark-sql-kafka classpath; platforms that ship a shaded kafka
    * client pass their relocated class name via `moduleClass`.
    */
  def plainJaas(username: String, password: String,
      moduleClass: String = "org.apache.kafka.common.security.plain.PlainLoginModule"): String =
    s"""$moduleClass required username="$username" password="$password";"""

  def reader(spark: SparkSession, cfg: Config): DataFrame =
    spark.readStream.format("kafka").options(options(cfg)).load()

  /** Bronze -> silver payload transform: a Kafka-shaped frame
    * (binary `value`, `timestamp`) to parsed item-level rows.
    * Works identically on a real Kafka source or a MemoryStream
    * mimicking its schema — this is the reference's
    * `03:283-324` chain.
    */
  def parsePayload(kafkaFrame: DataFrame, schema: StructType,
      itemsField: Option[String] = None): DataFrame =
    PayloadParser.parseAndExplode(
      kafkaFrame.select(col("value"), col("timestamp")),
      payloadCol = "value", schema = schema, itemsField = itemsField)
}
