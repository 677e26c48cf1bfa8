package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("co-bucketed fact join runs without a shuffle on either side") {
    val s = spark
    val orders = Tables.orders(s, sf)
    val lineitem = Tables.lineitem(s, sf)
    Bucketing.writeBucketed(orders, "orders_b", tmpDir("orders_b"), 4, Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "lineitem_b", tmpDir("lineitem_b"), 4, Seq("l_orderkey"))

    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.readTable(s, "orders_b")
        .join(Bucketing.readTable(s, "lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      // and it computes the same thing as the plain-parquet join
      val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("aggregation on the bucket key needs no exchange either") {
    val s = spark
    Bucketing.writeBucketed(Tables.lineitem(s, sf), "lineitem_b2",
      tmpDir("lineitem_b2"), 4, Seq("l_orderkey"))
    try {
      val agg = Bucketing.readTable(s, "lineitem_b2")
        .groupBy("l_orderkey").agg(sum("l_quantity"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed agg still shuffles:\n$plan")
    } finally s.sql("DROP TABLE IF EXISTS lineitem_b2")
  }
}
