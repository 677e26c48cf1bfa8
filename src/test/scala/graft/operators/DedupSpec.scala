package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Seeded corpus with known overlap structure: doc 1/2 share most
    * n-grams, doc 3 is unrelated, doc 4 duplicates doc 1 exactly.
    */
  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3L, "completely different words about spark catalyst expressions and codegen output"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
  }

  private def exactJaccard(a: String, b: String, n: Int = 3): Double = {
    def grams(t: String) = t.toLowerCase.split("\\s+").sliding(n).map(_.mkString(" ")).toSet
    val (ga, gb) = (grams(a), grams(b))
    ga.intersect(gb).size.toDouble / ga.union(gb).size.toDouble
  }

  test("minhash estimated jaccard tracks exact jaccard") {
    val sig = Dedup.minHashSignatures(corpus, "doc_id", "text", numHashes = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def est(a: Long, b: Long): Double =
      sig(a).zip(sig(b)).count { case (x, y) => x == y }.toDouble / sig(a).size

    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // identical docs -> estimate exactly 1
    assert(est(1L, 4L) === 1.0)
    // near-dup pair: estimate within 3 sigma (sqrt(j(1-j)/64) ~ 0.06)
    val j12 = exactJaccard(texts(1L), texts(2L))
    assert(math.abs(est(1L, 2L) - j12) <= 0.2, s"est=${est(1L, 2L)} exact=$j12")
    // unrelated pair: exact jaccard 0, estimate must stay near 0
    assert(est(1L, 3L) <= 0.1)
  }

  test("simhash hamming distance is monotone in similarity") {
    val sh = Dedup.simHash(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(4L)) === 0) // identical text
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)),
      s"near-dup ${hamming(sh(1L), sh(2L))} !< unrelated ${hamming(sh(1L), sh(3L))}")
  }

  test("minHashLsh surfaces the duplicate/near-dup pairs and not the unrelated one") {
    val pairs = Dedup.minHashLsh(corpus, "doc_id", "text",
      numHashes = 32, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("exactByHash matches full-text exact dedup on the test corpus") {
    val docs = Tables.documents(spark, sf)
    val byText = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byHash = Dedup.exactByHash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byText === byHash)
  }

  test("embeddingNearDup finds exactly the planted pairs and prunes candidates") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    // 200 planted near-duplicates (cosine ~0.994) over an isotropic
    // background whose max natural cosine is ~0.6
    val planted = Similarity.plantNearDuplicates(emb, "vec_id", "embedding",
      col("vec_id") < 200, copies = 1, idOffset = 100000L, scaleStep = 0.01)
    val pairs = Dedup.embeddingNearDup(planted, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (0L until 200L).map(i => (i, i + 100000L)).toSet)

    // prune-rate: candidate pairs must be far below all-pairs
    // (round-3 verdict: r=2 banding was all-pairs in disguise)
    val n = planted.count()
    val nCand = Dedup.embeddingNearDupCandidates(planted, "vec_id", "embedding").count()
    val allPairs = n * (n - 1) / 2
    assert(nCand.toDouble / allPairs <= 0.10,
      s"candidates $nCand is ${nCand.toDouble / allPairs} of all-pairs $allPairs — not pruning")
  }

  test("simHashPairs surfaces near-dups within the hamming bound, never unrelated docs") {
    val pairs = Dedup.simHashPairs(corpus, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 4L)) === 0) // identical text -> identical simhash
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) > 0) // near-dup, small distance
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L },
      "unrelated doc must not pair")
    // banding guarantee: the pair set equals the exact all-pairs
    // hamming filter (pigeonhole -> zero false negatives)
    val sh = Dedup.simHash(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = (for {
      a <- sh.keys; b <- sh.keys if a < b
      h = java.lang.Long.bitCount(sh(a) ^ sh(b)) if h <= 8
    } yield (a, b) -> h).toMap
    assert(pairs === exact)
  }

  test("duplicateComponents resolves chained duplicates transitively") {
    val s = spark
    import s.implicits._
    // chain 1-2-3-4 (never compared end-to-end), disjoint pair 10-11,
    // and a triangle 20-21-22
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("id_a", "id_b")
    val comp = Dedup.duplicateComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("simHashPairs at maxHamming=0 pairs only identical signatures (single full-width band)") {
    val pairs = Dedup.simHashPairs(corpus, "doc_id", "text", maxHamming = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs === Map((1L, 4L) -> 0)) // only the verbatim duplicate
  }

  test("pointer jumping resolves a 50-link duplicate chain in O(log n) rounds") {
    val s = spark
    import s.implicits._
    val pairs = (1L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // plain min-propagation would need ~49 rounds; pointer jumping
    // needs ~log2(50) — a cap of 10 proves the logarithmic behavior
    val comp = Dedup.duplicateComponents(pairs, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === (1L to 50L).map(_ -> 1L).toMap)
  }

  test("deduplicate keeps one representative per cluster and all unpaired docs") {
    val s = spark
    import s.implicits._
    // corpus: docs 1,2,4 are a duplicate cluster; 3 unrelated
    val out = Dedup.deduplicate(corpus, "doc_id", "text",
      numHashes = 32, bands = 16, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out === Seq(1L, 3L)) // 1 represents {1,2,4}; 3 survives alone
  }

  test("duplicateComponents with a reliable checkpoint dir matches the localCheckpoint path") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    try {
      val pairs = ((1L until 50L).map(i => (i, i + 1)) ++ Seq((100L, 101L)))
        .toDF("id_a", "id_b")
      val local = Dedup.duplicateComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val reliable = Dedup.duplicateComponents(pairs, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable === local)
      // the rounds actually went through the reliable dir
      val listing = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      val entries = try listing.count() finally listing.close()
      assert(entries > 0, "no checkpoint data written to the reliable dir")
      // end-to-end: deduplicate through the reliable path too
      val out = Dedup.deduplicate(corpus, "doc_id", "text",
        numHashes = 32, bands = 16, threshold = 0.5,
        checkpointDir = Some(dir))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(out === Seq(1L, 3L))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("CacheScope releases an operator's tracked caches deterministically") {
    // compare persisted-RDD id SETS, not counts — unrelated
    // localCheckpoint blocks from other tests are reclaimed by the
    // ContextCleaner at arbitrary times
    def ids = spark.sparkContext.getPersistentRDDs.keySet
    val before = ids
    val scope = new CacheScope
    // distinct input plan: an identical simHash(corpus) plan is
    // already in the CacheManager from an earlier test, and persist
    // on an already-cached plan is a no-op
    val pairs = Dedup.simHashPairs(corpus.filter(col("doc_id") <= 4L), "doc_id", "text",
      maxHamming = 8, scope = scope)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    val added = ids -- before
    assert(added.nonEmpty, "simHashPairs should have persisted its signatures")
    scope.release(blocking = true)
    assert(ids.intersect(added).isEmpty, "release() must unpersist every tracked frame")
  }

  test("DF-capped ngram join equals the uncapped join on the test corpus") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 300)
    def run(cap: Option[Int]) =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, maxDf = cap)
        .select("id_a", "id_b", "shared", "n_a", "n_b")
        .collect().map(_.toString).toSet
    assert(run(Some(100)) === run(None))
  }

  test("auto-tuned DF cap matches the fixed cap and the uncapped join") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 300)
    def run(cap: Option[Int]) =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, maxDf = cap)
        .select("id_a", "id_b", "shared", "n_a", "n_b")
        .collect().map(_.toString).toSet

    // full-corpus tuning: cap sits in the df tail, result unchanged
    val full = Dedup.autoMaxDf(docs, "text", n = 3, sampleFraction = 1.0)
    assert(full >= 64, s"cap $full below the floor")
    assert(run(Some(full)) === run(None))
    assert(run(Some(full)) === run(Some(100)))

    // sampled tuning (the 100 TB path): the scaled estimate still
    // yields a cap that loses no pairs
    val sampled = Dedup.autoMaxDf(docs, "text", n = 3, sampleFraction = 0.5)
    assert(run(Some(sampled)) === run(None))
  }

  test("auto cap clears a duplicate cluster larger than the default floor") {
    val s = spark
    import s.implicits._
    // 100 identical docs: every content gram has df=100 > the floor
    // (64); a df-quantile alone would cap below it and silently drop
    // all 4950 pairs — the exact-group estimator must raise the cap
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val cluster = (0L until 100L).map(i => (i, text)).toDF("doc_id", "text")
    val noise = (100L until 200L).map(i =>
      (i, s"unique filler document number $i with its own distinct words $i")).toDF("doc_id", "text")
    val corpus = cluster.union(noise)

    val cap = Dedup.autoMaxDf(corpus, "text", n = 3, sampleFraction = 1.0)
    assert(cap >= 100, s"cap $cap must clear the 100-doc cluster")
    def run(c: Option[Int]) =
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3,
        threshold = 0.5, maxDf = c)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = run(Some(cap))
    assert(capped.size >= 4950, s"cluster pairs lost: ${capped.size}")
    assert(capped === run(None))
  }

  test("sharedSpanPairs flags a long verbatim overlap that Jaccard misses") {
    val s = spark
    import s.implicits._
    val span = (1 to 25).map(i => s"tok$i").mkString(" ")
    val fillerA = (1 to 200).map(i => s"aword$i").mkString(" ")
    val fillerB = (1 to 200).map(i => s"bword$i").mkString(" ")
    val docs = Seq(
      (1L, s"$fillerA $span"),           // long doc ending in the span
      (2L, s"$span $fillerB"),           // long doc starting with it
      (3L, (1 to 150).map(i => s"cword$i").mkString(" "))).toDF("doc_id", "text")
    // overall jaccard of (1,2) is tiny — the ratio detector misses it
    val jacc = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 20, threshold = 0.3).count()
    assert(jacc === 0)
    // the span detector finds exactly that pair: 6 shared 20-grams
    val pairs = Dedup.sharedSpanPairs(docs, "doc_id", "text", n = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 6L)))
  }

  test("dedupParagraphs keeps first global occurrence, reassembles in order") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha\n\nbeta\n\nalpha"),   // within-doc repeat of alpha
      (2L, "beta\n\ngamma"),            // beta already seen in doc 1
      (3L, "alpha\n\nbeta"),            // nothing new -> empty
      (4L, "delta")).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) === ((1L, "alpha\n\nbeta", 2L, 1L)))
    assert(out(1) === ((2L, "gamma", 1L, 1L)))
    assert(out(2) === ((3L, "", 0L, 2L)))
    assert(out(3) === ((4L, "delta", 1L, 0L)))
  }

  test("removeBoilerplate drops EVERY copy past the distinct-doc threshold, first included") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "footer\ncontent one\nfooter"), // footer twice here = ONE distinct doc
      (2L, "footer\ncontent two"),
      (3L, "footer\ncontent three"),
      (4L, "content four\nrare line"),
      (5L, "rare line\ncontent five")      // rare line: 2 docs < minDocs=3
    ).toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // footer is in 3 distinct docs -> removed everywhere (both copies in doc 1)
    assert(out(0) === ((1L, "content one", 1L, 2L)))
    assert(out(1) === ((2L, "content two", 1L, 1L)))
    assert(out(2) === ((3L, "content three", 1L, 1L)))
    // rare line in only 2 docs -> survives in both
    assert(out(3) === ((4L, "content four\nrare line", 2L, 0L)))
    assert(out(4) === ((5L, "rare line\ncontent five", 2L, 0L)))
    // within-doc repetition alone never crosses the DISTINCT-doc bar
    val solo = Dedup.removeBoilerplate(
      Seq((9L, "x\nx\nx\ny")).toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().head
    assert(solo.getString(1) === "x\nx\nx\ny")
    // all-boilerplate doc comes back empty, visible
    val all = Dedup.removeBoilerplate(
      Seq((1L, "b"), (2L, "b"), (3L, "b")).toDF("doc_id", "text"),
      "doc_id", "text", 3).orderBy("doc_id").collect()
    assert(all.forall(r => r.getString(1) == "" && r.getLong(3) == 1L))
    // hashed keys == full-string keys
    val big = (0L until 50L).map(i =>
      (i, s"shared header line\nunique body $i")).toDF("doc_id", "text")
    val h = Dedup.removeBoilerplate(big, "doc_id", "text", 3, hashKeys = true)
      .orderBy("doc_id").collect().map(_.toSeq)
    val f = Dedup.removeBoilerplate(big, "doc_id", "text", 3, hashKeys = false)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(h.toSeq === f.toSeq)
  }

  test("incrementalDedup: exact flags vs history; bloom prefilter cannot lose a dup") {
    val s = spark
    import s.implicits._
    val history = (0L until 500L).map(i => (i, s"history document number $i payload"))
      .toDF("doc_id", "text")
    val batch = (
      // 40 normalization-equal copies of history docs
      (0L until 40L).map(i => (1000L + i, s"  HISTORY   document Number $i payload ")) ++
      // 60 genuinely new docs
      (0L until 60L).map(i => (2000L + i, s"fresh content $i never seen"))).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(history, batch, "doc_id", "text",
        expectedItems = 500L, fpp = 0.01)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("in_history")).toMap
    assert(out.size === 100)
    (0L until 40L).foreach(i => assert(out(1000L + i), s"dup ${1000 + i} missed"))
    (0L until 60L).foreach(i => assert(!out(2000L + i), s"new ${2000 + i} misflagged"))

    // a deliberately tiny, saturated filter (worst case: every probe
    // positive) still yields EXACT results — fpp degrades traffic,
    // never correctness
    val saturated = Dedup.incrementalDedup(history, batch, "doc_id", "text",
        expectedItems = 2L, fpp = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("in_history")).toMap
    assert(saturated === out)
  }

  test("incrementalDedup: sharded bloom filters give shard-count-invariant results") {
    val s = spark
    import s.implicits._
    val history = (0L until 400L).map(i => (i, s"shardable history doc $i body"))
      .toDF("doc_id", "text")
    val batch = (
      (0L until 30L).map(i => (1000L + i, s"  SHARDABLE history DOC $i body ")) ++
      (0L until 30L).map(i => (2000L + i, s"novel shard text $i"))).toDF("doc_id", "text")
    def run(shards: Int) =
      Dedup.incrementalDedup(history, batch, "doc_id", "text",
          expectedItems = 400L, fpp = 0.01, shards = shards)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("in_history"))
        .toMap
    val single = run(1)
    assert(single.size === 60)
    (0L until 30L).foreach(i => assert(single(1000L + i) && !single(2000L + i)))
    // per-shard constants shrink; membership semantics must not move
    assert(run(4) === single)
    assert(run(7) === single)

    // beyond-driver-memory build: one shard-restricted history scan
    // per shard (driver holds ONE shard's words at a time) — results
    // identical to the one-pass sharded path
    def runIter(shards: Int) =
      Dedup.incrementalDedup(history, batch, "doc_id", "text",
          expectedItems = 400L, fpp = 0.01, shards = shards,
          buildShardsIteratively = true)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("in_history"))
        .toMap
    assert(runIter(4) === single)
    assert(runIter(7) === single)
    // degenerate but legal: iterative at shards = 1 (one full scan)
    assert(runIter(1) === single)
  }

  test("dedupParagraphs: hashed group keys equal the full-string path on multi-KB paragraphs") {
    val s = spark
    import s.implicits._
    // paragraphs of several KB — exactly the width the hashed shuffle
    // key exists to keep out of the winner-election exchange
    def para(tag: String): String = (1 to 400).map(i => s"$tag-word$i").mkString(" ")
    val (a, b, c) = (para("alpha"), para("beta"), para("gamma"))
    val docs = Seq(
      (1L, s"$a\n\n$b"),
      (2L, s"$b\n\n$c\n\n$a"), // b and a already seen in doc 1
      (3L, s"$c"),             // c seen in doc 2
      (4L, s"$a\n\n$a")).toDF("doc_id", "text")
    def rows(hashKeys: Boolean) =
      Dedup.dedupParagraphs(docs, "doc_id", "text", hashKeys = hashKeys)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val hashed = rows(hashKeys = true)
    assert(hashed === rows(hashKeys = false))
    assert(hashed.map(t => (t._1, t._3, t._4)) ===
      Seq((1L, 2L, 0L), (2L, 1L, 2L), (3L, 0L, 1L), (4L, 0L, 2L)))
    assert(hashed(1)._2 === c)
  }

  test("bloom build/probe: zero false negatives, bounded false positives") {
    import graft.plans.BloomFilterOps
    val (bits, k) = BloomFilterOps.sizeFor(10000L, 0.01)
    assert(bits % 64 === 0 && k >= 5 && k <= 10, s"bits=$bits k=$k")
    val words = new Array[Long](bits / 64)
    val rnd = new scala.util.Random(7)
    val members = Array.fill(10000)(rnd.nextLong())
    members.foreach(BloomFilterOps.setBits(words, k, _))
    assert(members.forall(BloomFilterOps.contains(words, k, _)),
      "bloom filters must never have false negatives")
    val memberSet = members.toSet
    val probes = Array.fill(20000)(rnd.nextLong()).filterNot(memberSet.contains)
    val fp = probes.count(BloomFilterOps.contains(words, k, _))
    assert(fp.toDouble / probes.length < 0.03,
      s"false-positive rate ${fp.toDouble / probes.length} far above the 1% design point")
  }

  test("incrementalEmbeddingNearDup admits novel vectors and flags every planted history dup") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val history = emb.filter(col("vec_id") < 400)
    val copies = Similarity.plantNearDuplicates(history, "vec_id", "embedding",
        col("vec_id") < 50, copies = 1, idOffset = 100000L, scaleStep = 0.01)
      .filter(col("vec_id") >= 100000L)
    val fresh = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
      .select(col("vec_id"), col("embedding"))
    val pairs = Dedup.incrementalEmbeddingNearDup(history, copies.union(fresh),
        "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every copy pairs with exactly its source; every fresh vector is novel
    assert(pairs === (0L until 50L).map(i => (i + 100000L, i)).toSet)
  }

  // --- randomized engine-vs-model gates (fixed seed => every run
  // sees the same corpora; a pass is a pass forever) ---------------

  private def randVec(rnd: scala.util.Random, dim: Int): Array[Float] =
    Array.fill(dim)(rnd.nextGaussian().toFloat)
  private def perturb(rnd: scala.util.Random, v: Array[Float], s: Double): Array[Float] =
    v.map(x => (x + s * rnd.nextGaussian()).toFloat)
  private def cosD(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]) =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p.toDouble * q.toDouble }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("randomized: incrementalEmbeddingNearDup equals the exact batch x history join") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { trial =>
      val hist = (0 until 300).map(i => (i.toLong, randVec(rnd, 64)))
      // 20 admission dups (perturbed copies of random history rows:
      // cosine ~0.999) + 20 genuinely novel vectors (max natural
      // cosine on isotropic 64-dim data ~0.5)
      val dupSrcs = rnd.shuffle(hist).take(20)
      val batch = dupSrcs.zipWithIndex.map { case ((_, v), j) =>
        (1000L + j, perturb(rnd, v, 0.05)) } ++
        (0 until 20).map(j => (2000L + j, randVec(rnd, 64)))
      val exact = (for {
        (bid, bv) <- batch; (hid, hv) <- hist
        if cosD(bv, hv) >= 0.92
      } yield (bid, hid)).toSet
      val engine = Dedup.incrementalEmbeddingNearDup(
          hist.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding"),
          batch.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding"),
          "vec_id", "embedding", threshold = 0.92)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(engine === exact, s"trial $trial: engine pair set diverged from the exact join")
    }
  }

  test("randomized: semanticDedup(nCenters=1) matches a driver union-find model") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    // 30 cluster bases with 0-3 perturbed copies each + 50 singletons
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]()
    var nextId = 0L
    (0 until 30).foreach { _ =>
      val base = randVec(rnd, 64)
      rows += ((nextId, base)); nextId += 1
      (0 until rnd.nextInt(4)).foreach { _ =>
        rows += ((nextId, perturb(rnd, base, 0.05))); nextId += 1
      }
    }
    (0 until 50).foreach { _ => rows += ((nextId, randVec(rnd, 64))); nextId += 1 }
    // driver model: union-find over exact pairs at eps, min-id labels
    val ids = rows.map(_._1).toArray
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    for (i <- rows.indices; j <- (i + 1) until rows.length
         if cosD(rows(i)._2, rows(j)._2) >= 0.9) {
      val (ra, rb) = (find(rows(i)._1), find(rows(j)._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = ids.map(i => (i, find(i), find(i) == i)).toSet
    val engine = Dedup.semanticDedup(
        rows.toSeq.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding"),
        "vec_id", "embedding", eps = 0.9, nCenters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(engine === expected)
  }

  test("degenerate inputs: empty batch, batch-only corpus, single-row semantic corpus") {
    val s = spark
    import s.implicits._
    val emb = Tables.embeddings(s, "/root/testdata/sf0.01").filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"))
    // empty admission batch -> no pairs, no crash
    assert(Dedup.incrementalEmbeddingNearDup(
      emb, emb.filter(col("vec_id") < 0), "vec_id", "embedding", 0.9).count() === 0)
    // empty history -> nothing to collide with
    assert(Dedup.incrementalEmbeddingNearDup(
      emb.filter(col("vec_id") < 0), emb, "vec_id", "embedding", 0.9).count() === 0)
    // single-row semantic corpus: its own kept representative
    val one = Dedup.semanticDedup(emb.filter(col("vec_id") === 7), "vec_id", "embedding",
        eps = 0.9, nCenters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(one.toSeq === Seq((7L, 7L, true)))
    // seed/nCenters mismatch fails loudly, not silently
    val err = intercept[IllegalArgumentException] {
      Dedup.semanticDedup(emb, "vec_id", "embedding", eps = 0.9, nCenters = 4,
        seedIds = Some(Seq(1L, 2L)))
    }
    assert(err.getMessage.contains("nCenters"))
  }

  // --- SemDeDup-style semantic dedup ------------------------------

  private def semanticCorpus = {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .filter(col("vec_id") < 300)
    Similarity.plantNearDuplicates(emb, "vec_id", "embedding",
      col("vec_id") < 100, copies = 2, idOffset = 100000L, scaleStep = 0.01)
  }
  private val semanticSeeds = Seq(3L, 41L, 77L, 114L, 152L, 189L, 226L, 263L)

  test("semanticDedup drops every planted copy and keeps every source (top-2 cell assignment)") {
    val out = Dedup.semanticDedup(semanticCorpus, "vec_id", "embedding",
        eps = 0.9, nCenters = 8, assignProbes = 2, seedIds = Some(semanticSeeds))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size === 500)
    (0L until 100L).foreach { i =>
      assert(out(i) === ((i, true)), s"source $i must be its own kept representative")
      assert(out(i + 100000L) === ((i, false)), s"copy 1 of $i must fold into $i")
      assert(out(i + 200000L) === ((i, false)), s"copy 2 of $i must fold into $i")
    }
    (100L until 300L).foreach { i =>
      assert(out(i) === ((i, true)), s"unpaired doc $i must survive untouched")
    }
  }

  test("semanticDedup with one cell equals exact all-pairs components") {
    val corpus = semanticCorpus
    val sem = Dedup.semanticDedup(corpus, "vec_id", "embedding",
        eps = 0.9, nCenters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val exactPairs = Dedup.embeddingNearDupExact(corpus, "vec_id", "embedding", 0.9)
    val comp = Dedup.duplicateComponents(exactPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = corpus.select(col("vec_id")).collect().map(_.getLong(0)).map { id =>
      val c = comp.getOrElse(id, id)
      (id, c, c == id)
    }.toSet
    assert(sem === expected)
  }

  test("semanticCandidates prune rate scales with nCenters and keeps planted-pair recall") {
    val corpus = semanticCorpus
    val n = corpus.count()
    val allPairs = n * (n - 1) / 2
    // an unrelated pair collides with probability ~ probes^2/nCenters
    // (balanced cells): nCenters is the pruning lever and must grow
    // with the corpus (the SemDeDup premise — ~n/1000 clusters at
    // paper scale). Assert the lever actually works on this corpus...
    def candidates(k: Int) = Dedup.semanticCandidates(corpus, "vec_id", "embedding",
      Similarity.ivfCentroids(corpus, "vec_id", "embedding", nCenters = k),
      assignProbes = 2)
    val c8 = candidates(8).count()
    val c32 = candidates(32).cache()
    val n32 = c32.count()
    assert(n32 < c8, s"nCenters 8->32 must shrink candidates ($c8 -> $n32)")
    assert(n32.toDouble / allPairs <= 0.25,
      s"candidates $n32 is ${n32.toDouble / allPairs} of all-pairs $allPairs — not pruning")
    // ...without losing the planted near-duplicate pairs: top-2 cell
    // assignment keeps boundary-straddling copies with their source
    val plantedPairs = (0L until 100L).flatMap(i => Seq(
      (i, i + 100000L), (i, i + 200000L), (i + 100000L, i + 200000L))).toSet
    val cand = c32.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    c32.unpersist()
    val recalled = plantedPairs.count(cand.contains)
    assert(recalled >= 295,
      s"only $recalled of ${plantedPairs.size} planted pairs survive 32-cell candidate pruning")
  }

  test("semanticDedup keepFarthestFromCentroid keeps the least-prototypical member per group") {
    val corpus = semanticCorpus
    val out = Dedup.semanticDedup(corpus, "vec_id", "embedding",
        eps = 0.9, nCenters = 8, assignProbes = 2, seedIds = Some(semanticSeeds),
        keepFarthestFromCentroid = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // exactly one keeper per component
    val byComponent = out.groupBy(_._2)
    byComponent.foreach { case (c, members) =>
      assert(members.count(_._3) === 1, s"component $c must keep exactly one member")
    }
    // keeper = argmin cosine-to-own-centroid (ties: min id), verified
    // by independent recomputation on the driver
    val centroids = semanticSeeds.map { id =>
      corpus.filter(col("vec_id") === id).select(col("embedding"))
        .collect().head.getSeq[Float](0).toArray
    }.toArray
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    def centroidCos(id: Long): Double = {
      val v = vecs(id)
      val best = centroids.zipWithIndex.maxBy { case (c, i) =>
        (dot(v, c) * (1.0 / norm(c)), i) // ties to the larger cell id
      }._1
      dot(v, best) / (norm(v) * norm(best))
    }
    byComponent.filter(_._2.length > 1).foreach { case (c, members) =>
      val keeper = members.find(_._3).get._1
      val expected = members.map(_._1).minBy(id => (centroidCos(id), id))
      assert(keeper === expected,
        s"component $c kept $keeper, expected least-prototypical $expected")
    }
  }

  // --- exact substring excision (Lee et al. ExactSubstr) ---

  private def excised(rows: Seq[(Long, String)], n: Int,
      hashKeys: Boolean = true): Map[Long, (String, Long, Long)] = {
    val s = spark
    import s.implicits._
    Dedup.exciseSpans(rows.toDF("id", "text"), "id", "text", n = n,
        hashKeys = hashKeys)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("excision cuts the shared span from the LATER doc only; the first occurrence keeps it") {
    val out = excised(Seq(
      (1L, "a b c d e f"),
      (2L, "x y b c d z")), n = 3)
    assert(out(1L) == (("a b c d e f", 6L, 0L)))
    // doc 2's "b c d" window duplicates doc 1's pos-1 gram: tokens
    // 2..4 excised, the unique flanks survive
    assert(out(2L) == (("x y z", 6L, 3L)))
  }

  test("excision catches WITHIN-document repeats and leaves unique docs untouched") {
    val out = excised(Seq(
      (1L, "p q r s p q r s"),
      (2L, "totally unrelated filler words here")), n = 4)
    // the second chorus copy (pos 4 window) is a duplicate of pos 0
    assert(out(1L) == (("p q r s", 8L, 4L)))
    assert(out(2L) == (("totally unrelated filler words here", 5L, 0L)))
  }

  test("a fully-duplicated doc excises to empty, visibly") {
    val out = excised(Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six")), n = 3)
    assert(out(1L)._1 == "one two three four five six")
    assert(out(2L) == (("", 6L, 6L)))
  }

  test("smaller (id, pos) wins the gram election — order independence of input") {
    // same corpus in both input orders must produce the same result
    val a = excised(Seq((5L, "k l m n o"), (9L, "z k l m n")), n = 3)
    val b = excised(Seq((9L, "z k l m n"), (5L, "k l m n o")), n = 3)
    assert(a == b)
    // doc 5 wins "k l m" (id 5 < 9); doc 9's occurrence at pos 1 and
    // "l m n" at pos 2 excise tokens 1..4, leaving only "z"
    assert(a(9L) == (("z", 5L, 4L)))
  }

  test("hashed gram keys produce the identical excision as string keys on real docs") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 60)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // plant a copy that shares a 25-token prefix with doc 0
    val prefix = docs.head._2.toLowerCase.trim.split("\\s+").take(25).mkString(" ")
    val planted = (999999L, prefix + " entirely fresh suffix content")
    val withPlant = docs :+ planted
    val viaHash = excised(withPlant, n = 20, hashKeys = true)
    val viaString = excised(withPlant, n = 20, hashKeys = false)
    assert(viaHash == viaString)
    // the planted prefix (>= 20 tokens, so fully window-covered) must
    // have been excised in its entirety — and nothing else
    val prefixLen = prefix.split(" ").length
    assert(prefixLen >= 20, s"prefix only $prefixLen tokens")
    assert(viaHash(999999L)._3 == prefixLen.toLong, viaHash(999999L).toString)
    assert(viaHash(999999L)._1 == "entirely fresh suffix content")
  }

  test("excision plan: gram election is a partial-aggregated shuffle, no Window, no cartesian") {
    val s = spark
    import s.implicits._
    val df = Dedup.exciseSpans(
      Seq((1L, "a b c d"), (2L, "b c d e")).toDF("id", "text"),
      "id", "text", n = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("partial_min") || plan.contains("partial_finalmerge_min")
      || plan.toLowerCase.contains("partial"), plan)
  }

  test("incrementalMinHashNearDup == the batch x history restriction of the full pair sketch") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    val history = docs.filter(col("doc_id") < 100)
    val batch = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" zq zr")).as("text"))
      .union(docs.filter(col("doc_id") >= 150 && col("doc_id") < 170))
    val batchIds = batch.select("doc_id").as[Long].collect().toSet

    // model: run the FULL all-pairs sketch over history ∪ batch and
    // keep only (batch, history) pairs — the incremental operator
    // must agree exactly (same hash family, same banding)
    val full = Dedup.minHashLsh(history.union(batch), "doc_id", "text",
        numHashes = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, e) =>
        if (batchIds(a) && !batchIds(b)) Some((a, b, e))
        else if (batchIds(b) && !batchIds(a)) Some((b, a, e))
        else None
      }.toSet

    val hSigs = Dedup.minHashSignatures(history, "doc_id", "text", numHashes = 32)
    val inc = Dedup.incrementalMinHashNearDup(hSigs, batch, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc === full)
    assert(inc.nonEmpty, "planted variants must hit their sources")
    // every planted variant is caught; novel rows may or may not pair
    (0L until 10L).foreach { i =>
      assert(inc.exists(_._1 == i + 100000L), s"variant of $i missed") }

    // plan: the history index is scanned, never shuffled — the only
    // exchanges are the batch's own signature aggregate and the
    // final pair distinct; the band join is broadcast
    val df = Dedup.incrementalMinHashNearDup(hSigs, batch, "doc_id", "text", 0.5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), "history must not shuffle-join\n" + plan)
  }

  test("canonicalizeUrl: each documented normalization step, and non-URL passthrough") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      // scheme+host lowercase, www strip, default port, trailing slash, fragment
      "HTTPS://WWW.Example.COM:443/A/B/#frag" -> "https://example.com/A/B",
      "HTTP://example.com:80/" -> "http://example.com",
      // non-default port kept; path case kept; query kept in order
      "http://Example.com:8080/Path?b=2&a=1" -> "http://example.com:8080/Path?b=2&a=1",
      // tracking params: leading, middle, trailing, only
      "https://x.com/p?utm_source=a&q=1" -> "https://x.com/p?q=1",
      "https://x.com/p?q=1&fbclid=zz&r=2" -> "https://x.com/p?q=1&r=2",
      "https://x.com/p?q=1&gclid=zz" -> "https://x.com/p?q=1",
      "https://x.com/p?msclkid=zz" -> "https://x.com/p",
      "https://x.com/p?utm_a=1&utm_b=2&q=3" -> "https://x.com/p?q=3",
      // ftp: unknown default port -> kept; www still stripped
      "FTP://WWW.Files.net:21/dir/" -> "ftp://files.net:21/dir",
      // userinfo stripped BEFORE host normalization: www + default
      // port must still fire behind 'User:Pw@'
      "http://User:Pw@WWW.X.com:80/a" -> "http://x.com/a",
      "https://bob@x.com/p" -> "https://x.com/p",
      // tracker keys match case-insensitively
      "https://x.com/p?UTM_Source=a&q=1" -> "https://x.com/p?q=1",
      "https://x.com/p?q=1&FBCLID=zz" -> "https://x.com/p?q=1",
      // non-URL-shaped input: no scheme; whole string treated as a
      // host-ish token (lowercased), never an error
      "not a url" -> "not a url")
    val got = cases.map(_._1).toDF("u")
      .select(graft.functions.TextFunctions.canonicalizeUrl(col("u")))
      .collect().map(_.getString(0))
    cases.map(_._2).zip(got).foreach { case (exp, g) => assert(g === exp) }
  }

  test("urlDedup keeps the lowest-id row per canonical URL with its payload") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (3L, "HTTP://A.com/x?utm_source=1", "three"),
      (1L, "http://a.com/x/", "one"),
      (2L, "http://a.com/x#f", "two"),
      (9L, "https://b.org/y", "nine")).toDF("doc_id", "url", "payload")
    val out = Dedup.urlDedup(docs, "doc_id", "url")
      .orderBy("canonical_url").collect()
    assert(out.length === 2)
    val a = out.head
    assert(a.getString(0) === "http://a.com/x")
    assert(a.getLong(1) === 1L)
    assert(a.getString(3) === "one") // payload of the KEPT row
    assert(a.getLong(4) === 3L)      // n_dupes
    assert(out(1).getLong(1) === 9L && out(1).getLong(4) === 1L)
  }

  test("urlDedup plan: one shuffle, partial min(struct), no window") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("url",
        concat(lit("http://h"), (col("doc_id") % 7).cast("string"), lit("/p")))
    val df = Dedup.urlDedup(docs, "doc_id", "url")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert("(?<!Broadcast)Exchange hash".r.findAllIn(plan).length === 1, plan)
  }
}
