package graft.sources

import graft.SparkSpec
import graft.operators.PayloadParser
import org.apache.spark.sql.functions._

class KafkaSourceSpec extends SparkSpec {

  test("option builder mirrors the reference's kafka block") {
    val opts = KafkaSource.options(KafkaSource.Config(
      bootstrapServers = "broker:9093",
      topic = "pos-txn",
      startingOffsets = "earliest",
      maxOffsetsPerTrigger = Some(5000),
      saslJaas = Some(KafkaSource.plainJaas("$ConnectionString", "secret"))))
    assert(opts("kafka.bootstrap.servers") === "broker:9093")
    assert(opts("subscribe") === "pos-txn")
    assert(opts("startingOffsets") === "earliest")
    assert(opts("maxOffsetsPerTrigger") === "5000")
    assert(opts("kafka.security.protocol") === "SASL_SSL")
    assert(opts("kafka.sasl.mechanism") === "PLAIN")
    assert(opts("kafka.sasl.jaas.config").contains("password=\"secret\""))
  }

  test("no SASL and no cap -> minimal option map") {
    val opts = KafkaSource.options(KafkaSource.Config("b:9092", "t"))
    assert(opts.keySet === Set("kafka.bootstrap.servers", "subscribe", "startingOffsets"))
  }

  test("parsePayload explodes a kafka-shaped frame to item-level rows") {
    val s = spark
    import s.implicits._
    val payload =
      """{"trans_id":"t1","store_id":5,"date_time":"2024-01-01 10:00:00",
        |"change_type_id":1,"items":[{"item_id":11,"quantity":2},
        |{"item_id":12,"quantity":1}]}""".stripMargin.replace("\n", "")
    val kafkaShaped = Seq((payload.getBytes("UTF-8"), java.sql.Timestamp.valueOf("2024-01-01 10:00:01")))
      .toDF("value", "timestamp")

    val out = KafkaSource.parsePayload(kafkaShaped,
      PayloadParser.txnSchema, itemsField = Some("items"))
    val rows = out.orderBy("item_id").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Int]("item_id")).toSeq === Seq(11, 12))
    assert(rows.map(_.getAs[Int]("quantity")).toSeq === Seq(2, 1))
    assert(rows.forall(_.getAs[String]("trans_id") == "t1"))
    assert(rows.forall(_.getAs[Int]("store_id") == 5))
  }
}
