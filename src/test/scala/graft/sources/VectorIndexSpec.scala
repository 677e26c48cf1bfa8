package graft.sources

import graft.{SparkSpec, Tables}
import graft.operators.Similarity
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The persisted IVF-PQ index: build-once/search-many equals the
  * query-time pipeline exactly, lookups read only the probed cells'
  * files through the manifest, and appends encode under the FROZEN
  * codebooks with the storage layer's exactly-once contract.
  */
class VectorIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_vidx").toString

  private val coarseSeeds = Seq(3L, 17L, 31L, 45L, 59L, 73L, 87L, 101L)
  private val pqSeeds = Seq(2L, 9L, 16L, 23L, 30L, 37L, 44L, 51L,
    58L, 65L, 72L, 79L, 86L, 93L, 100L, 107L)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("indexed search equals ivfPqTopK exactly at equal probes (raw and residual)") {
    val s = spark
    val emb = Tables.embeddings(s, sf)
    val queries = emb.filter(col("vec_id") < 8)
    for (residual <- Seq(false, true)) {
      val idx = s"${tmp()}/idx"
      VectorIndex.build(s, emb, "vec_id", "embedding", idx,
        nCenters = 8, m = 8, ksub = 16,
        coarseSeedIds = Some(coarseSeeds), pqSeedIds = Some(pqSeeds),
        residual = residual)
      for (nProbe <- Seq(2, 8)) {
        val direct = Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding",
          k = 5, nCenters = 8, nProbe = nProbe, m = 8, ksub = 16,
          coarseSeedIds = Some(coarseSeeds), pqSeedIds = Some(pqSeeds),
          residual = residual)
        val indexed = VectorIndex.search(s, queries, idx, k = 5, nProbe = nProbe)
        assert(rows(indexed) === rows(direct),
          s"residual=$residual nProbe=$nProbe diverged from ivfPqTopK")
        // scores too, not just ranks — the ADC arithmetic is shared
        val ds = direct.select("query_id", "neighbor_id", "cosine").collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        indexed.select("query_id", "neighbor_id", "cosine").collect()
          .foreach { r =>
            assert(ds((r.getLong(0), r.getLong(1))) === r.getDouble(2))
          }
      }
    }
  }

  test("search reads ONLY the probed cells' files (manifest pruning, files proportional to nProbe)") {
    val s = spark
    val emb = Tables.embeddings(s, sf)
    val idx = s"${tmp()}/idx"
    VectorIndex.build(s, emb, "vec_id", "embedding", idx,
      nCenters = 8, m = 8, ksub = 16,
      coarseSeedIds = Some(coarseSeeds), pqSeedIds = Some(pqSeeds))
    val mt = VectorIndex.meta(s, idx)
    // dir-qualified name (cid=N/part-...): one write task serves
    // several cells, so bare part names repeat across cell dirs
    def rel(p: String) = {
      val ph = new Path(p); s"${ph.getParent.getName}/${ph.getName}"
    }
    // manifest ground truth: file -> cell (partition value, min=max)
    val manifest = DataSkipping.readManifest(s, idx)
      .select(col("file"), col("min_cid").cast("int").as("cid")).collect()
      .map(r => rel(r.getString(0)) -> r.getInt(1))
    val allFiles = manifest.map(_._1).toSet
    assert(manifest.map(_._2).distinct.length === 8,
      "build must populate all 8 cells for this corpus")
    val probed = Seq(1, 4, 6)
    val scanned = VectorIndex.probedScan(s, idx, probed)
      .inputFiles.map(rel).toSet
    val expected = manifest.filter(pr => probed.contains(pr._2)).map(_._1).toSet
    assert(scanned === expected,
      "the pruned scan must read exactly the probed cells' files")
    assert(scanned.size < allFiles.size, "pruning must drop unprobed cells")
    // proportionality: one file per cell at build, so 3 probes = 3 files
    assert(scanned.size === 3)
  }

  test("append encodes under the FROZEN codebooks: search equals the frozen-model composition, replays are once-only") {
    val s = spark
    val emb = Tables.embeddings(s, sf)
    // the split keeps every pinned seed id (< 108) in the build set
    val base = emb.filter(col("vec_id") < 400)   // build set
    val extra = emb.filter(col("vec_id") >= 400) // appended later
    val idx = s"${tmp()}/idx"
    VectorIndex.build(s, base, "vec_id", "embedding", idx,
      nCenters = 8, m = 8, ksub = 16,
      coarseSeedIds = Some(coarseSeeds), pqSeedIds = Some(pqSeeds))
    assert(VectorIndex.append(s, extra, idx, commitName = Some("batch-1")))
    // exactly-once: the named replay short-circuits
    assert(!VectorIndex.append(s, extra, idx, commitName = Some("batch-1")))
    val queries = emb.filter(col("vec_id") < 8)
    val indexed = VectorIndex.search(s, queries, idx, k = 5, nProbe = 8)
    // expected = the frozen model (trained on BASE) applied to the
    // FULL corpus — composed by hand from the persisted meta
    val mt = VectorIndex.meta(s, idx)
    val coded = emb.select(col("vec_id").as("neighbor_id"),
      Similarity.nearestCentroidId(col("embedding"), mt.centroids).as("cid"),
      Similarity.pqEncodeCol(col("embedding"), mt.codebooks).as("codes"))
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("__qvec"))
      .withColumn("cid", explode(graft.plans.VectorExpressions
        .nearestCentroids(col("__qvec"), mt.centroids, 8)))
    val expected = Similarity.topKPerQuery(
      coded.join(broadcast(probes), Seq("cid"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          Similarity.pqAdcCol(col("__qvec"), col("codes"), mt.codebooks)
            .as("cosine")),
      5)
    assert(rows(indexed) === rows(expected))
    // the append landed in its cells: total rows = full corpus
    assert(DataSkipping.readSkipping(s, idx, lit(true)).count() === emb.count())
  }

  test("appended planted near-duplicates are recalled at low nProbe") {
    val s = spark
    val base = Tables.embeddings(s, sf)
    val idx = s"${tmp()}/idx"
    VectorIndex.build(s, base, "vec_id", "embedding", idx,
      nCenters = 8, m = 8, ksub = 16,
      coarseSeedIds = Some(coarseSeeds), pqSeedIds = Some(pqSeeds),
      residual = true)
    // plant near-duplicates of the query rows, then APPEND them: a
    // near-copy lands in its source's cell, so even nProbe=2 search
    // must surface it in the top-k
    val planted = Similarity.plantNearDuplicates(
        base, "vec_id", "embedding",
        sourceFilter = col("vec_id") < 6,
        copies = 1, idOffset = 500000L, scaleStep = 0.003)
      .filter(col("vec_id") >= 500000L)
    assert(VectorIndex.append(s, planted, idx))
    val queries = base.filter(col("vec_id") < 6)
    val got = VectorIndex.search(s, queries, idx, k = 3, nProbe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0L until 6L).foreach { q =>
      assert(got(q).contains(500000L + q),
        s"appended near-duplicate of $q must be in its top-3 at nProbe=2")
    }
  }

  test("a reopened index replays the model bit-for-bit and survives OPTIMIZE") {
    val s = spark
    val emb = Tables.embeddings(s, sf)
    val idx = s"${tmp()}/idx"
    VectorIndex.build(s, emb, "vec_id", "embedding", idx,
      nCenters = 8, m = 8, ksub = 16,
      coarseSeedIds = Some(coarseSeeds), pqSeedIds = Some(pqSeeds),
      residual = true)
    val mt = VectorIndex.meta(s, idx)
    // the sidecar round-trips raw float bits
    assert(mt.centroids.flatten.toSeq ===
      Similarity.seedCentroids(emb, "vec_id", "embedding", 8,
        Some(coarseSeeds)).flatten.toSeq)
    val queries = emb.filter(col("vec_id") < 5)
    val before = rows(VectorIndex.search(s, queries, idx, k = 5, nProbe = 3))
    // maintenance on the coded table must not disturb the index:
    // compaction folds the cells' files and must CARRY the model
    // sidecar into its new generation (the root legacy file is gone
    // after build, so a dropped carry fails loudly here)
    DataSkipping.compactTable(s, idx, targetFileBytes = 64L * 1024 * 1024,
      vacuum = false)
    assert(rows(VectorIndex.search(s, queries, idx, k = 5, nProbe = 3))
      === before)
  }

  test("rebuild swaps (model, codes) in ONE atomic generation; superseded snapshots keep their own model") {
    val s = spark
    val emb = Tables.embeddings(s, sf)
    val idx = s"${tmp()}/idx"
    VectorIndex.build(s, emb, "vec_id", "embedding", idx,
      nCenters = 8, m = 8, ksub = 16,
      coarseSeedIds = Some(coarseSeeds), pqSeedIds = Some(pqSeeds))
    val v0 = DataSkipping.tableVersions(s, idx).max
    val queries = emb.filter(col("vec_id") < 5)
    assert(VectorIndex.meta(s, idx).nCenters == 8)
    // CREATE OR REPLACE retrain: different cell count AND coding mode
    // over the live index — one overwrite generation carrying the new
    // model, old files on the removal log
    VectorIndex.build(s, emb, "vec_id", "embedding", idx,
      nCenters = 4, m = 8, ksub = 16,
      coarseSeedIds = Some(coarseSeeds.take(4)), pqSeedIds = Some(pqSeeds),
      residual = true)
    val v1 = DataSkipping.tableVersions(s, idx).max
    assert(v1 > v0, "a rebuild must commit a NEW generation")
    val mt2 = VectorIndex.meta(s, idx)
    assert(mt2.nCenters == 4 && mt2.residual)
    // the swapped index equals the query-time pipeline under the new
    // model — codes and model cannot have mixed epochs
    val direct = Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding",
      k = 5, nCenters = 4, nProbe = 2, m = 8, ksub = 16,
      coarseSeedIds = Some(coarseSeeds.take(4)), pqSeedIds = Some(pqSeeds),
      residual = true)
    assert(rows(VectorIndex.search(s, queries, idx, k = 5, nProbe = 2))
      === rows(direct))
    // the superseded generation is a CONSISTENT historical snapshot:
    // its own model (8 cells, raw) paired with its own coding — the
    // old cells are still there at v0 while the live table has 4
    val mt0 = VectorIndex.metaAt(s, idx, v0)
    assert(mt0.nCenters == 8 && !mt0.residual)
    assert(VectorIndex.probedScan(s, idx, 0 until 8, Some(v0))
      .select("cid").distinct().count() == 8L)
    assert(VectorIndex.probedScan(s, idx, 0 until 8, None)
      .select("cid").distinct().count() == 4L)
    // no root-level legacy sidecar survives to contradict any epoch
    val fs = new Path(idx).getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(idx, VectorIndex.MetaFile)))
  }
}
