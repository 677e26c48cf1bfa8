package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sketches.approxDistinct]]: HLL accuracy in the raw regime,
  * partition invariance of the exact sketch state, plan shape.
  */
class SketchesSpec extends SparkSpec {

  test("estimate within the p=12 error envelope on 100k distinct; duplicates don't inflate") {
    val s = spark
    import s.implicits._
    val n = 100000L
    // every value appears twice — distinct is n, rows are 2n
    val df = (0L until 2 * n).map(i => ("g", i % n)).toDF("g", "v")
    val out = Sketches.approxDistinct(df, Seq("g"), "v", p = 12).collect().head
    val est = out.getAs[Double]("approx_distinct")
    // standard error 1.04/sqrt(4096) = 1.6%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.065, s"estimate $est vs exact $n")
  }

  test("sketch state is partition-invariant and group-scoped") {
    val s = spark
    import s.implicits._
    val df = (0L until 20000L).map(i => (s"g${i % 3}", i)).toDF("g", "v")
    def state(parts: Int): Map[String, (Long, Long)] =
      Sketches.approxDistinct(df.repartition(parts), Seq("g"), "v", p = 10)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Long]("hll_buckets_used"), r.getAs[Long]("hll_t_scaled"))))
        .toMap
    val a = state(2)
    assert(a === state(17), "T must be exactly partition-invariant")
    assert(a.keySet === Set("g0", "g1", "g2"))
    // three interleaved groups of ~6667 distinct each
    Sketches.approxDistinct(df, Seq("g"), "v", p = 10).collect().foreach { r =>
      val est = r.getAs[Double]("approx_distinct")
      assert(math.abs(est - 6667) / 6667 < 0.13, s"${r.getString(0)}: $est")
    }
  }

  test("sketch states merge losslessly: estimate(merge(A, B)) == estimate(A ∪ B inputs)") {
    val s = spark
    import s.implicits._
    // overlapping halves: A = [0, 60k), B = [40k, 100k); union = 100k
    val a = (0L until 60000L).map(i => ("g", i)).toDF("g", "v")
    val b = (40000L until 100000L).map(i => ("g", i)).toDF("g", "v")
    val sa = Sketches.sketch(a, Seq("g"), "v", p = 12)
    val sb = Sketches.sketch(b, Seq("g"), "v", p = 12)
    val merged = Sketches.merge(sa.unionByName(sb), Seq("g"))
    val viaMerge = Sketches.estimate(merged, Seq("g"), 12).collect().head
    val direct = Sketches.approxDistinct(a.unionByName(b), Seq("g"), "v", 12)
      .collect().head
    // the merged sketch is BIT-IDENTICAL to sketching the union
    assert(viaMerge.getAs[Long]("hll_t_scaled") ===
      direct.getAs[Long]("hll_t_scaled"), "register merge must be lossless")
    val est = viaMerge.getAs[Double]("approx_distinct")
    assert(math.abs(est - 100000) / 100000 < 0.065, s"union estimate $est")
  }

  test("foldSketch: incremental folds equal one-shot sketching; replayed batch is a no-op") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_skt").toString
    val t = s"$root/sk"
    val all = (0L until 30000L).map(i => (s"g${i % 2}", i)).toDF("g", "v")
    (0 until 3).foreach { i =>
      Sketches.foldSketch(s, t, all.filter(col("v") % 3 === i),
        Seq("g"), "v", p = 10, txn = Some("skt" -> i.toLong))
    }
    def st() = Sketches.readSketchEstimate(s, t, Seq("g"), 10)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("hll_t_scaled")).toMap
    val incremental = st()
    val direct = Sketches.approxDistinct(all, Seq("g"), "v", 10)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("hll_t_scaled")).toMap
    assert(incremental === direct,
      "fold sequence must be bit-identical to one-shot sketching")
    // replaying an already-applied batch (crash window) changes nothing
    Sketches.foldSketch(s, t, all.filter(col("v") % 3 === 1),
      Seq("g"), "v", p = 10, txn = Some("skt" -> 1L))
    assert(st() === incremental, "replay must be a no-op")
    // a batch that cannot raise any register rewrites nothing
    val versions = graft.sources.DataSkipping.tableVersions(s, t)
    Sketches.foldSketch(s, t, all.filter(col("v") % 3 === 0),
      Seq("g"), "v", p = 10, txn = Some("skt" -> 5L))
    assert(st() === incremental)
    assert(graft.sources.DataSkipping.tableVersions(s, t) === versions,
      "an unraisable fold must commit no generation")
  }

  test("plan: two partial-aggregated shuffles, no distinct expansion, no UDF") {
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).map(i => ("g", i)).toDF("g", "v")
    val plan = Sketches.approxDistinct(df, Seq("g"), "v", p = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"), "bucket sketch must map-side combine\n" + plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    intercept[IllegalArgumentException] {
      Sketches.approxDistinct(df, Seq("g"), "v", p = 3)
    }
  }
}
