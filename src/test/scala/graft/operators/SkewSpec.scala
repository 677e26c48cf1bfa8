package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals the plain join on skewed data") {
    val s = spark
    import s.implicits._
    // 10k rows, 90% on one hot key
    val big = s.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(999L)).as("k"),
        col("id").as("v"))
    val small = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")

    val plain = big.join(small, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), saltBuckets = 8)
      .select("k", "v", "name")

    assert(salted.count() === plain.count())
    assert(salted.collect().map(_.toString).sorted.toSeq ===
      plain.collect().map(_.toString).sorted.toSeq)
  }

  test("hot key is spread across salt buckets") {
    val s = spark
    import s.implicits._
    val big = s.range(1000).select(lit(7L).as("k"), col("id").as("v"))
    val buckets = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8L)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(buckets.length === 8)
    assert(buckets.max < 1000, "all rows landed in one bucket")
  }
}
