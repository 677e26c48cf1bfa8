package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.{Expectations, Inventory}
import org.apache.spark.sql.functions._

/** The full reference DAG expressed through the Pipeline DSL:
  * bronze (events) -> silver (typed, quality-gated) -> gold
  * (current inventory), with the gold output matching the flagship
  * query bit-for-bit. This is the "user of the reference could
  * switch" proof at the pipeline level, not just per-operator.
  */
class PosPipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bronze->silver->gold DAG reproduces the flagship inventory query") {
    val s = spark
    val p = new Pipeline()
    p.table("bronze") { _ => Tables.events(s, sf) }
    p.tableWithExpectations("silver", Seq("bronze"),
      Seq(Expectations.ruleOrDrop("value_not_null", col("value").isNotNull),
        Expectations.rule("ts_recent", col("ts") >= lit("2024-01-01")))) { d =>
      d("bronze").select("event_id", "ts", "user_id", "event_type", "value")
    }
    p.table("gold", "silver") { d =>
      Inventory.currentInventoryOverEvents(s, d("silver"))
    }

    val built = p.run()
    val viaDsl = built("gold").collect().map(_.toString).sorted.toSeq
    val direct = Inventory.currentInventoryOverEvents(s, Tables.events(s, sf))
      .collect().map(_.toString).sorted.toSeq
    assert(viaDsl === direct)
    assert(viaDsl.nonEmpty)
  }
}
