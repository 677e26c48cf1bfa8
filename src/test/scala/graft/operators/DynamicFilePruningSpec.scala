package graft.operators

import graft.SparkSpec
import graft.sources.DataSkipping
import org.apache.spark.sql.functions._

class DynamicFilePruningSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_dfp").toString

  test("selective dim prunes fact files; result equals the plain join") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/fact"
    // fact clustered by key: 16 range files over keys 0..7999
    val fact = (0L until 8000L).map(i => (i, i % 97))
      .toDF("k", "payload").repartitionByRange(16, col("k"))
    DataSkipping.writeWithStats(fact, t, Seq("k"))
    // dim holds 10 keys inside one narrow band
    val dim = (4000L until 4010L).map(i => (i, s"d$i")).toDF("dk", "name")

    val got = DynamicFilePruning.joinPruned(s, t, "k", dim, "dk")
    val want = DataSkipping.readSkipping(s, t, lit(true))
      .join(dim, col("k") === col("dk"))
    assert(got.count() === 10L)
    assert(got.select("k", "payload", "dk", "name").orderBy("k").collect().toSeq
      === want.select("k", "payload", "dk", "name").orderBy("k").collect().toSeq)

    // the envelope actually pruned: the band fits one of 16 range files
    val env = DynamicFilePruning.keyEnvelope(dim, "dk", col("k"), 1000)
    val (kept, all) = DataSkipping.prunedFiles(s, t, env)
    assert(all.size === 16)
    assert(kept.size <= 2, s"expected <=2 files kept, got ${kept.size}")

    // broadcast join in the physical plan, not a shuffle join
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("a NESTED fact join key (m.k) prunes through the struct-path stats") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/fact"
    val fact = (0L until 8000L).map(i => (i, (i, s"p$i")))
      .toDF("id", "m0")
      .select(col("id"),
        struct(col("m0._1").as("k"), col("m0._2").as("tag")).as("m"))
      .repartitionByRange(16, col("m.k"))
    DataSkipping.writeWithStats(fact, t, Seq("id", "m.k"))
    val dim = (4000L until 4010L).map(i => (i, s"d$i")).toDF("dk", "name")
    val got = DynamicFilePruning.joinPruned(s, t, "m.k", dim, "dk")
    assert(got.count() === 10L)
    val env = DynamicFilePruning.keyEnvelope(dim, "dk", col("m.k"), 1000)
    val (kept, all) = DataSkipping.prunedFiles(s, t, env)
    assert(all.size === 16)
    assert(kept.size <= 2,
      s"nested-key envelope must prune: ${kept.size}/${all.size}")
    val want = DataSkipping.readSkipping(s, t, lit(true))
      .join(dim, col("m.k") === col("dk"))
    assert(got.select(col("id"), col("m.k"), col("name")).orderBy("id").collect().toSeq
      === want.select(col("id"), col("m.k"), col("name")).orderBy("id").collect().toSeq)
  }

  test("a LARGE key envelope (hundreds of keys) plans flat: exact result, still prunes, no deep OR chain") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/fact"
    val fact = (0L until 16000L).map(i => (i, i % 97))
      .toDF("k", "payload").repartitionByRange(16, col("k"))
    DataSkipping.writeWithStats(fact, t, Seq("k"))
    // 700 distinct keys confined to one band — past the OR-chain
    // threshold (the shape dynamic file pruning hands over from a
    // real dim side; at this size a per-key OR chain overflowed the
    // stack converting the Column tree and cost seconds of driver
    // time when it didn't)
    val dim = (4000L until 4700L).map(i => (i, s"d$i")).toDF("dk", "name")
    val got = DynamicFilePruning.joinPruned(s, t, "k", dim, "dk")
    assert(got.count() === 700L)
    val want = DataSkipping.readSkipping(s, t, lit(true))
      .join(dim, col("k") === col("dk"))
    assert(got.select("k", "payload").orderBy("k").collect().toSeq
      === want.select("k", "payload").orderBy("k").collect().toSeq)
    // the array-literal EXISTS envelope still prunes at file level
    val env = DynamicFilePruning.keyEnvelope(dim, "dk", col("k"), 1000)
    val (kept, all) = DataSkipping.prunedFiles(s, t, env)
    assert(all.size === 16)
    assert(kept.size <= 2, s"expected <=2 files kept, got ${kept.size}")
    // and the bloom-indexed variant takes the same flat path
    val tb = s"${tmp()}/factb"
    DataSkipping.writeWithStats(
      (0L until 16000L).map(i => (i * 1777L % 16000L, i))
        .toDF("k", "payload").repartition(16),
      tb, Seq("k"), bloomCols = Seq("k"), bloomBits = 1 << 14)
    val scattered = (0L until 300L).map(i => (i * 53L % 16000L, s"d$i"))
      .toDF("dk", "name").distinct()
    val gotB = DynamicFilePruning.joinPruned(s, tb, "k", scattered, "dk")
    val wantB = DataSkipping.readSkipping(s, tb, lit(true))
      .join(scattered, col("k") === col("dk"))
    assert(gotB.count() === wantB.count())
  }

  test("bloom-indexed fact prunes scattered keys a range never could") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/fact"
    // key space scattered: every file spans nearly the full id range,
    // so min/max admits everything — only the bloom can prune
    val fact = (0L until 8000L).map(i => (i * 1777L % 8000L, i))
      .toDF("k", "payload").repartition(16)
    DataSkipping.writeWithStats(fact, t, Seq("k"),
      bloomCols = Seq("k"), bloomBits = 1 << 14, bloomHashes = 5)
    val dim = Seq((123L, "a"), (4567L, "b")).toDF("dk", "name")

    val got = DynamicFilePruning.joinPruned(s, t, "k", dim, "dk")
    assert(got.count() === 2L)
    val env = DynamicFilePruning.keyEnvelope(dim, "dk", col("k"), 1000)
    val (kept, all) = DataSkipping.prunedFiles(s, t, env)
    assert(all.size === 16)
    assert(kept.size < all.size,
      s"bloom should prune some of ${all.size} files, kept ${kept.size}")
  }

  test("wide dim falls back to the range envelope; overflow threshold respected") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/fact"
    DataSkipping.writeWithStats(
      (0L until 8000L).map(i => (i, i)).toDF("k", "v")
        .repartitionByRange(16, col("k")), t, Seq("k"))
    // 50 keys in a band, maxKeys=10 forces the range fallback
    val dim = (2000L until 2050L).map(i => (i, i)).toDF("dk", "w")
    val got = DynamicFilePruning.joinPruned(s, t, "k", dim, "dk", maxKeys = 10)
    assert(got.count() === 50L)
    val env = DynamicFilePruning.keyEnvelope(dim, "dk", col("k"), 10)
    val (kept, all) = DataSkipping.prunedFiles(s, t, env)
    assert(kept.size < all.size, "range envelope must still prune the band")
  }

  test("empty dim prunes everything; left_semi projects fact columns only") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/fact"
    DataSkipping.writeWithStats(
      (0L until 1000L).map(i => (i, i)).toDF("k", "v").coalesce(4),
      t, Seq("k"))
    val empty = Seq.empty[(Long, String)].toDF("dk", "name")
    assert(DynamicFilePruning.joinPruned(s, t, "k", empty, "dk").count() === 0L)
    val (kept, _) = DataSkipping.prunedFiles(s, t,
      DynamicFilePruning.keyEnvelope(empty, "dk", col("k"), 10))
    assert(kept.isEmpty, "empty dim must prune every file")

    val dim = Seq((5L, "x")).toDF("dk", "name")
    val semi = DynamicFilePruning.joinPruned(s, t, "k", dim, "dk", "left_semi")
    assert(semi.columns.toSeq === Seq("k", "v"))
    assert(semi.collect().map(_.getLong(0)).toSeq === Seq(5L))
  }

  test("null keys drop on both paths; outer joins are refused") {
    val s = spark
    import s.implicits._
    val t = s"${tmp()}/fact"
    val fact = Seq[(java.lang.Long, Long)]((1L, 10L), (null, 11L), (2L, 12L))
      .toDF("k", "v")
    DataSkipping.writeWithStats(fact.coalesce(1), t, Seq("k"))
    val dim = Seq[(java.lang.Long, String)]((1L, "a"), (null, "n"))
      .toDF("dk", "name")
    val got = DynamicFilePruning.joinPruned(s, t, "k", dim, "dk")
    // null never equi-joins: only k=1 matches, on either engine
    assert(got.select("k").collect().map(_.getLong(0)).toSeq === Seq(1L))
    intercept[IllegalArgumentException] {
      DynamicFilePruning.joinPruned(s, t, "k", dim, "dk", "left_outer")
    }
  }
}
