package graft.plans

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions
import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shape regression tests: the 100 TB design claims in
  * SURVEY §4, enforced as assertions on the physical plan so a
  * refactor can't silently reintroduce a shuffle, drop a partial
  * aggregate, or fall back to a nested-loop join while every
  * correctness test stays green.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Shuffle exchanges only — BroadcastExchange is intentional. */
  private def shuffles(df: DataFrame): Int =
    "(?<!Broadcast)Exchange (hash|range|Single)".r
      .findAllIn(plan(df)).length

  test("latestByKey is ONE shuffle with a map-side partial aggregate, no window") {
    val df = Cdc.latestByKey(Tables.events(spark, sf),
      keys = Seq("user_id"), seqCols = Seq("ts", "event_id"), payload = Seq("value"))
    val p = plan(df)
    assert(shuffles(df) === 1, p)
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findAllIn(p).length >= 2, "partial + final aggregate expected\n" + p)
    assert(!p.contains("Window"), "latest-per-key must not use a window\n" + p)
  }

  test("exact dedup by hash shuffles 8-byte keys once, never the text") {
    val df = Dedup.exactByHash(Tables.documents(spark, sf), "doc_id", "text")
    assert(shuffles(df) === 1, plan(df))
  }

  test("redaction and text stats are shuffle-free") {
    val docs = Tables.documents(spark, sf)
    assert(shuffles(docs.select(TextOps.redact(col("text")))) === 0)
    assert(shuffles(docs.select(TextFunctions.qualityScore(col("text")))) === 0)
  }

  test("bruteForceTopK: corpus shuffles once through the bounded graft_topk agg; queries broadcast") {
    val emb = Tables.embeddings(spark, sf)
    val df = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", k = 5)
    val p = plan(df)
    assert(shuffles(df) === 1, p)
    assert(p.contains("BroadcastExchange"), "queries must broadcast\n" + p)
    assert(p.contains("partial_graft_topk"), "map-side partial top-k expected\n" + p)
    assert(!p.contains("Window"), p)
    // the ONE intentional nested-loop join in the engine: brute force
    // is all-pairs by definition (only a non-equi self-exclusion
    // predicate), so BroadcastNestedLoopJoin with the small query side
    // built IS the right plan — the scale path is lshTopK/ivfTopK
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("windowed aggregation: one shuffle, partial+final aggregate") {
    val df = graft.streaming.WindowedAgg.windowed(
      Tables.events(spark, sf), tsCol = "ts", windowDur = "1 hour",
      keys = Seq("event_type"), aggs = Seq(count(lit(1)).as("n")))
    val p = plan(df)
    assert(shuffles(df) === 1, p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("as-of join is an equi join with range residual, one aggregate shuffle after") {
    val ev = Tables.events(spark, sf)
    val df = AsOfJoin.latestAtOrBefore(
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts")),
      ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("s_ts"), col("value").as("s_value")),
      keys = Seq("user_id"), leftTs = "ts", rightTs = "s_ts",
      payload = Seq("s_value"))
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the range predicate must ride an equi join as a residual\n" + p)
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findAllIn(p).length >= 2, "partial + final max(struct) expected\n" + p)
  }

  test("minHashLsh band join carries only (id, band key) — no signature array crosses it") {
    // round-4 verdict #4: shipping both 32-long signatures through
    // the band-join fan-out (and the pair distinct) is the shuffle
    // the embedding path already avoids. Candidate pairs must be
    // ids-only; signatures re-join after the distinct.
    val df = Dedup.minHashLsh(Tables.documents(spark, sf), "doc_id", "text")
    // pre-AQE physical plan: join nodes exist, outputs are final
    val bandJoins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.leftKeys.exists(_.references.exists(_.name.startsWith("band"))) => j
    }
    assert(bandJoins.nonEmpty, "expected a band self-join in the plan")
    bandJoins.foreach { j =>
      val arrays = (j.left.output ++ j.right.output)
        .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      assert(arrays.isEmpty,
        s"array columns cross the band join: ${arrays.map(_.name).mkString(", ")}")
    }
  }

  test("salted join: replicated small side broadcasts, no cartesian, salt never output") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").as("custkey"), col("c_nationkey"))
    val df = Skew.saltedJoin(orders, cust, Seq("custkey"), saltBuckets = 8)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastExchange"),
      "replicated small side should broadcast — salting must not force a shuffle join\n" + p)
    assert(!df.columns.contains("__salt"), "salt is internal")
  }

  test("packSequences stays distributed: range-partitioned scan, never one partition") {
    val docs = Tables.documents(spark, sf)
    val df = TextOps.packSequences(docs, "doc_id", "n_chars", binSize = 8192,
      partitions = 8)
    // the result is built over the RDD lineage (mapPartitions carry),
    // so the invariant surfaces as partitioning, not as a SQL plan
    // node: the global prefix sum must NOT collapse to one partition
    // (a window over a global ORDER BY would)
    assert(df.rdd.getNumPartitions === 8, "two-phase scan must stay distributed")
    assert(df.rdd.toDebugString.contains("ShuffledRowRDD"),
      "range repartition expected in the lineage\n" + df.rdd.toDebugString)
  }

  test("sampleBySource is a shuffle-free codegen'd filter") {
    val docs = Tables.documents(spark, sf)
    val df = TextOps.sampleBySource(docs, "doc_id", "source",
      rates = Map("src0" -> 0.5))
    assert(shuffles(df) === 0, plan(df))
  }

  test("contamination: benchmark grams broadcast; corpus never shuffles on gram strings") {
    val docs = Tables.documents(spark, sf)
    val df = TextOps.contamination(
      docs.filter(col("doc_id") < 400), "doc_id", "text",
      docs.filter(col("doc_id") >= 400), "text", n = 5)
    val p = plan(df)
    assert(p.contains("BroadcastExchange"), "benchmark gram set must broadcast\n" + p)
    // gram-string shuffles: at most the benchmark-side distinct (tiny,
    // pre-broadcast) — the corpus-side hit join itself must be
    // broadcast, so the 100 TB side's grams never cross an exchange
    assert("Exchange hashpartitioning\\(__g".r.findAllIn(p).length <= 1,
      "corpus gram strings must not cross a shuffle\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "broadcast hit join expected\n" + p)
    // ONE corpus scan: the tokenize+ngram subtree must not be
    // duplicated into a separate counting branch
    assert("graft_word_ngrams".r.findAllIn(p).length <= 2, // corpus + bench
      "corpus n-grams computed more than once\n" + p)
  }

  test("incrementalDedup: history never shuffles; bloom probe is a codegen'd plan constant") {
    val docs = Tables.documents(spark, sf)
    val df = Dedup.incrementalDedup(
      docs, docs.filter(col("doc_id") < 50), "doc_id", "text", expectedItems = 1000L)
    val p = plan(df)
    assert(p.contains("graft_bloom_contains"),
      "bloom prefilter expression missing from the plan\n" + p)
    // both joins broadcast (candidates -> history semi; confirmed ->
    // batch flag); the only hash exchange is the distinct over the
    // CONFIRMED hash set, which is dup-count-sized, never corpus-sized
    assert(shuffles(df) <= 1, "history/batch must not shuffle\n" + p)
    assert("BroadcastExchange".r.findAllIn(p).length >= 2, p)
    assert(p.contains("LeftSemi"), "exact verify must be a semi join\n" + p)
  }

  test("incrementalEmbeddingNearDup: history never shuffles; batch keys broadcast") {
    val emb = Tables.embeddings(spark, sf)
    val df = Dedup.incrementalEmbeddingNearDup(
      emb.filter(col("vec_id") >= 50), emb.filter(col("vec_id") < 50),
      "vec_id", "embedding", threshold = 0.9)
    val p = plan(df)
    // the only exchange is the final pair distinct (pair-count-sized);
    // the history scan streams map-side through the broadcast join
    assert(shuffles(df) <= 1, "history must not shuffle\n" + p)
    assert(p.contains("BroadcastExchange"), "batch keys must broadcast\n" + p)
    assert(p.contains("graft_lsh_band_bits"),
      "band keys must come from the codegen'd signature expression\n" + p)
  }

  test("quantization, html strip, url parse, shuffle keys are all shuffle-free") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    assert(shuffles(emb.select(
      Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding"))))) === 0)
    assert(shuffles(docs.select(
      TextFunctions.stripHtml(col("text")),
      TextFunctions.urlDomain(col("text")))) === 0)
    assert(shuffles(docs.select(
      graft.operators.TextOps.shuffleKey(col("doc_id"), 7L))) === 0)
  }

  test("dedupParagraphs: winner election is a partial aggregate; ordinal-sorted reassembly, no window") {
    val df = Dedup.dedupParagraphs(
      Tables.documents(spark, sf), "doc_id", "text")
    val p = plan(df)
    assert(!p.contains("Window"), "reassembly must not use a corpus window\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("partial_min|HashAggregate".r.findAllIn(p).nonEmpty,
      "winner election should partial-aggregate\n" + p)
  }

  test("capPerGroup: bounded-heap partial agg, no per-group sort window") {
    val df = TextOps.capPerGroup(
      Tables.documents(spark, sf).select(col("doc_id"), col("source")),
      "source", "doc_id", k = 10, seed = 777L)
    val p = plan(df)
    assert(p.contains("partial_graft_topk"),
      "per-group cap must select via the map-side bounded heap\n" + p)
    assert(!p.contains("Window"),
      "a row_number window would sort whole groups in one partition\n" + p)
    assert(p.contains("LeftSemi"), "winner ids must semi-join the corpus\n" + p)
  }

  test("buildVocab: top-k via TakeOrderedAndProject, window only over the capped rows; encode broadcasts the vocab") {
    val docs = Tables.documents(spark, sf)
    val vocab = TextOps.buildVocab(docs, "text", maxVocab = 20)
    val pv = plan(vocab)
    assert(pv.contains("TakeOrderedAndProject"),
      "the maxVocab cut must be a distributed top-k, not a global sort\n" + pv)
    // the dense-rank window exists but must sit ABOVE the take (over
    // maxVocab rows), i.e. the plan has no Sort-Exchange feeding a
    // window below the take; cheap proxy: exactly one shuffle (the
    // count agg) before the driver-side take
    assert(shuffles(vocab) <= 2, s"vocab build grew extra shuffles\n$pv")
    val enc = TextOps.encodeDocs(docs, "doc_id", "text", vocab)
    val pe = plan(enc)
    assert(pe.contains("BroadcastHashJoin"),
      "token->id lookup must be a broadcast join, never a corpus shuffle on terms\n" + pe)
    assert(!pe.contains("SortMergeJoin"),
      "a sort-merge token lookup shuffles the exploded corpus\n" + pe)
  }

  test("manifest-pruned read: scan served by ManifestFileIndex with the predicate pushed down") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft_psread")
    graft.sources.DataSkipping.writeWithStats(
      (0L until 1000L).toDF("id").repartitionByRange(8, col("id")),
      dir, Seq("id"))
    val df = graft.sources.DataSkipping.readSkipping(
      s, dir, col("id") >= 100L && col("id") < 300L)
    val p = plan(df)
    // the scan's file listing comes from the manifest, not a
    // filesystem walk, and the row predicate reaches the parquet
    // reader (a scan reading all row groups for a pushed-down-able
    // range predicate is a plan regression)
    assert(p.contains("ManifestFileIndex"),
      "scan must be served by the manifest-backed file index\n" + p)
    assert("PushedFilters: \\[.*GreaterThanOrEqual\\(id,100\\)".r
      .findFirstIn(p).isDefined,
      "range predicate must be pushed to the parquet scan\n" + p)
  }

  test("no plan anywhere falls back to a cartesian/nested-loop join") {
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 100)
    val orders = Tables.orders(spark, sf)
    val candidates = Seq(
      Dedup.embeddingNearDup(emb, "vec_id", "embedding", threshold = 0.9),
      Similarity.lshTopK(emb.filter(col("vec_id") < 3), emb,
        "vec_id", "embedding", k = 5),
      Inventory.currentInventoryOverEvents(spark, Tables.events(spark, sf)),
      Dedup.dedupParagraphs(Tables.documents(spark, sf), "doc_id", "text"),
      graft.operators.TextOps.repetitionSignals(
        Tables.documents(spark, sf), "doc_id", "text"),
      orders.rollup(col("o_orderpriority")).agg(count(lit(1))),
      Dedup.semanticDedup(emb, "vec_id", "embedding",
        eps = 0.9, nCenters = 4, assignProbes = 2))
    candidates.foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("semanticCandidates: cell-keyed equi join carries only (id, cid) — vectors never cross it") {
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 100)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", nCenters = 4)
    val df = Dedup.semanticCandidates(emb, "vec_id", "embedding",
      centroids, assignProbes = 2)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the join inputs are id+cid projections: no array (vector)
    // column may reach either side of the cell-keyed join — the same
    // ids-only discipline the minhash band join is held to
    val cellJoins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.leftKeys.exists(_.references.exists(_.name.startsWith("cid"))) => j
    }
    assert(cellJoins.nonEmpty, "expected an equi join on the cell id\n" + p)
    cellJoins.foreach { j =>
      val arrays = (j.left.output ++ j.right.output)
        .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      assert(arrays.isEmpty,
        s"vector columns cross the cell join: ${arrays.map(_.name).mkString(", ")}")
    }
  }
}
