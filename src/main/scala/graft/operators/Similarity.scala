package graft.operators

import graft.plans.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k — the correctness
  *    baseline. Queries are broadcast against the corpus (the 100 TB
  *    side is never shuffled for the join), and ranking is TWO-PHASE:
  *    a per-partition partial top-k collapses each map task to at
  *    most k candidates per query before the only shuffle, then a
  *    final rank merges the k x numPartitions survivors. No window
  *    ever sees the whole corpus in one partition.
  *  - `lshTopK`: random-hyperplane LSH bucketing — the scale path.
  *    Vectors only compare within their signature bucket.
  *
  * Dot products run through [[graft.plans.VectorExpressions]] — a
  * codegen'd Catalyst expression with sequential left-to-right double
  * summation, bit-identical to the DuckDB oracle's `list_reduce`.
  */
object Similarity {

  /** Codegen'd sequential-order dot product of two float vectors. */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** id/vec/norm projection reused by every similarity operator.
    * Registers the vector expressions in the owning session.
    */
  def withNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      l2Norm(col(vecCol)).as("norm"))
  }

  def cosineFromParts(vecA: Column, vecB: Column, normA: Column, normB: Column): Column =
    dot(vecA, vecB) / (normA * normB)

  /** Final ranking over a scored candidate set, as ONE bounded
    * aggregate: [[graft.plans.TopKPairs]] keeps an O(k) heap, Spark
    * runs it partially on every map task and merges k-sized states
    * after the only shuffle — no window, no per-partition candidate
    * lists in memory. Ordering is (cosine DESC, neighbor ASC).
    *
    * Input must have columns query_id, neighbor_id, cosine.
    */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(call_function("graft_topk",
        col("cosine"), col("neighbor_id"), lit(k)).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__c")))
      .select(col("query_id"), col("__c.neighbor_id").as("neighbor_id"),
        (col("__pos") + 1).cast("int").as("rank"), col("__c.cosine").as("cosine"))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param queries  small set of query vectors (broadcast side)
    * @param corpus   the full corpus (never broadcast, never globally
    *                 sorted; see [[topKPerQuery]])
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = withNorm(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))
    val c = withNorm(corpus, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("cosine",
        cosineFromParts(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    topKPerQuery(scored, k)
  }

  /** Per-vector symmetric int8 quantization — the storage-compression
    * pass a 100 TB vector corpus runs before ANN serving (4x smaller
    * than float32; recall loss is small because ranking only needs
    * relative dot products). Returns struct(scale: double,
    * q: array<int> in [-127, 127]).
    *
    * Rounding is floor(x/scale + 0.5) — half-toward-+inf, chosen
    * over `round()` because its semantics are bit-identical across
    * engines (SQL round() disagrees on negative halves between
    * implementations). A zero vector quantizes to zeros with
    * scale 1. Shuffle-free, linear: one codegen'd pass per row
    * ([[graft.plans.QuantizeInt8]] — the earlier Column composition
    * captured the array_max subtree inside the per-element lambda,
    * which Catalyst re-evaluated per element: O(d^2) per row).
    */
  def quantizeInt8(vec: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftFunctions.register)
    call_function("graft_quantize_int8", vec)
  }

  /** Inverse of [[quantizeInt8]]: array<double> ~ the original within
    * scale/2 per dimension.
    */
  def dequantizeInt8(quant: Column): Column =
    transform(quant.getField("q"), v => v.cast("double") * quant.getField("scale"))

  /** Exact top-k by approximate dot product over int8-QUANTIZED
    * vectors — the serving path of a quantized ANN corpus: the score
    * is the integer code dot ([[graft.plans.DotProductInt8]], one
    * codegen'd loop) times the two scales, so float vectors are
    * never materialized. Ranks by dot, which equals cosine ranking
    * when inputs are L2-normalized (the usual embedding-store
    * convention); on raw vectors it is dot-product search. Same
    * two-phase bounded top-k as [[bruteForceTopK]].
    */
  def bruteForceTopKInt8(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftFunctions.register)
    def quantized(df: DataFrame, p: String): DataFrame =
      df.select(col(idCol).as(s"${p}_id"),
        quantizeInt8(col(vecCol)).as(s"${p}_qz"))
    val q = quantized(queries, "q")
    val c = quantized(corpus, "c")
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("q_id") =!= col("c_id") else lit(true))
      .select(col("q_id").as("query_id"), col("c_id").as("neighbor_id"),
        (call_function("graft_dot_int8", col("q_qz.q"), col("c_qz.q"))
          .cast("double") * col("q_qz.scale") * col("c_qz.scale")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Sign-bit binary quantization: bit j of the signature is 1 iff
    * vec[j] >= 0, packed 64 bits per long — float32 vectors shrink
    * 32x (a 100 TB float corpus becomes ~3 TB of codes), and
    * Hamming distance over the codes is a few XOR+POPCNT words per
    * pair. This is the 1-bit end of the quantization ladder
    * (float32 -> int8 [[quantizeInt8]] -> m-byte PQ [[pqCodebooks]]
    * -> dim/8 bytes here); for centered/normalized embeddings
    * Hamming on sign bits is a monotone proxy for angular distance
    * (Charikar SRP with axis-aligned planes), so it serves as a
    * cheap candidate filter that an exact float rerank then orders.
    *
    * Word w packs dims [64w, 64w+63], dim j at bit (j - 64w); the
    * expression is built-ins only (fixed shifts + bitwise OR), fully
    * codegen'd, shuffle-free. Plan size grows with dim — at
    * thousands of dims move this to a custom Expression (the
    * NearestCentroids precedent).
    */
  def binarySignature(vec: Column, dim: Int): Column = {
    require(dim >= 1, "dim must be positive")
    val nWords = (dim + 63) / 64
    array((0 until nWords).map { w =>
      val lo = w * 64
      val hi = math.min(dim, lo + 64)
      (lo until hi).map { j =>
        when(vec.getItem(j) >= lit(0f), lit(1L << (j - lo))).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }: _*)
  }

  /** Hamming distance between two packed signatures: XOR + popcount
    * per word, summed — built-ins only, codegen'd.
    */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, h) => acc + h)

  /** Binary-quantized ANN: Hamming distance over packed sign bits
    * selects `candidates` neighbors per query (smallest distance,
    * ties to the smaller id), and ONLY those rows re-join their
    * float vectors for the exact cosine rerank — the
    * filter-then-rerank serving shape of every binary-quantized
    * vector store. The Hamming phase reads dim/8 bytes per corpus
    * row instead of 4·dim, and both phases end in the bounded
    * [[topKPerQuery]] aggregate (no window, no per-query candidate
    * list on the driver).
    *
    * With `candidates` >= |corpus| the result equals
    * [[bruteForceTopK]] exactly (the filter admits everything and
    * the rerank is the exact ranking) — the machinery check in
    * SimilaritySpec. The decision procedure (sign threshold >= 0,
    * Hamming tie-break, rerank order) is deterministic, so the
    * oracle replays it verbatim.
    */
  def bqTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Int = 64, candidates: Int = 50,
      excludeSelf: Boolean = true): DataFrame = {
    require(candidates >= k, "candidates must be >= k")
    val cSig = corpus.select(col(idCol).as("neighbor_id"),
      binarySignature(col(vecCol), dim).as("__csig"))
    val qSig = queries.select(col(idCol).as("query_id"),
      binarySignature(col(vecCol), dim).as("__qsig"))
    val ham = cSig.join(broadcast(qSig),
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        hammingDistance(col("__qsig"), col("__csig")).cast("double").as("__h"))
    val cand = topKPerQuery(
        ham.select(col("query_id"), col("neighbor_id"), (-col("__h")).as("cosine")),
        candidates)
      .select(col("query_id"), col("neighbor_id"))
    val cNorm = withNorm(corpus, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"))
    val qNorm = withNorm(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))
    val scored = cand.join(cNorm, Seq("neighbor_id"))
      .join(broadcast(qNorm), Seq("query_id"))
      .withColumn("cosine",
        cosineFromParts(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    topKPerQuery(scored, k)
  }

  /** Deterministic Gaussian hyperplanes (java.util.Random is
    * spec-fixed, so signatures are identical on every executor, JVM
    * and run).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Float]] =
    Array.tabulate(numPlanes) { p =>
      val rng = new java.util.Random(seed + p)
      Array.fill(dim)(rng.nextGaussian().toFloat)
    }

  /** Random-hyperplane signature: bit p = sign(v . plane_p)
    * (<= 64 planes), via the single-expression band computation.
    */
  def lshSignature(vec: Column, planes: Array[Array[Float]]): Column = {
    require(planes.length <= 64, "a packed signature holds at most 64 planes")
    bandKeys(vec, planes, 1).getItem(0)
  }

  /** Per-band bucket bits for a vector: element b = the packed signs
    * of band b's hyperplane projections, as ONE codegen'd expression
    * over a plan-constant plane matrix ([[graft.plans.LshBandBits]] —
    * building this from per-plane dot-product columns instead puts
    * numPlanes literal-carrying subtrees in the plan, and analysis +
    * codegen of that tree dominates latency). Pair with `posexplode`
    * to get (band, bits) rows.
    */
  def bandKeys(vec: Column, planes: Array[Array[Float]], bands: Int): Column = {
    require(planes.length % bands == 0, "bands must divide numPlanes")
    VectorExpressions.lshBandBits(vec, planes, bands)
  }

  /** Multi-probe keys from a MATERIALIZED band-bits value: for
    * `radius = 1`, array(bits, bits^1, bits^2, ..., bits^2^(r-1)) —
    * two vectors then collide in a band when their bit patterns are
    * within Hamming distance 1. Must be applied AFTER exploding
    * [[bandKeys]], so the r dot products per band are computed once
    * and each probe is one XOR of the result; inlining the flips
    * into [[bandKeys]]' structs instead would duplicate the whole
    * dot-product subtree per probe (at r = 16 that is 4,352 dot
    * products per row — a plan-size and codegen blowup). Probing one
    * side of a join suffices: a flip of A's key lands on B's exact
    * key whenever they differ by one bit.
    */
  def probeKeys(bits: Column, rows: Int, radius: Int): Column = {
    require(radius == 0 || radius == 1, "multi-probe radius must be 0 or 1")
    if (radius == 0) array(bits)
    else array(bits +: (0 until rows).map(j =>
      bits.bitwiseXOR(lit(1L << j))): _*)
  }

  /** LSH candidate pairs for [[lshTopK]]: (query_id, neighbor_id)
    * sharing at least one band bucket (query side multi-probed).
    * Exposed so tests can assert the PRUNE RATE — candidates must be
    * a small fraction of |queries| x |corpus|, not just recall.
    */
  def lshCandidates(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String,
      numPlanes: Int, bands: Int, dim: Int, multiProbe: Int): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val qBanded = withNorm(queries, idCol, vecCol)
      .select(col("id").as("query_id"),
        posexplode(bandKeys(col("vec"), planes, bands)).as(Seq("band", "__bits0")))
      .select(col("query_id"), col("band"),
        explode(probeKeys(col("__bits0"), numPlanes / bands, multiProbe)).as("bits"))
    val cBanded = withNorm(corpus, idCol, vecCol)
      .select(col("id").as("neighbor_id"),
        posexplode(bandKeys(col("vec"), planes, bands)).as(Seq("band", "bits")))
    cBanded.join(broadcast(qBanded), Seq("band", "bits"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
  }

  /** Approximate top-k: exact cosine ranking, but only over
    * candidates that share at least one signature BAND with the query
    * (band-OR: recall 1-(1-p^r)^b with p = 1 - angle/pi, r =
    * numPlanes/bands bits per band; multi-probe radius 1 lifts the
    * per-band term from p^r to P(Hamming <= 1)). Candidate ids are
    * deduplicated across bands before any vector is re-joined, so no
    * row carries a vector through the distinct shuffle, and nothing
    * is quadratic in the corpus.
    *
    * PRUNING vs RECALL — read before tuning (round-3 verdict): with
    * r bits per band an unrelated isotropic pair collides per band
    * with probability ~(1/2)^r (x(r+1) with multi-probe 1), so r
    * must be large enough that b x (r+1) / 2^r << 1 or candidate
    * generation degenerates to all-pairs. The defaults (r = 16,
    * b = 16, probe 1) prune unrelated pairs to ~0.4% while catching
    * genuine near-duplicates (cosine >= ~0.9, p >= 0.86) with
    * per-pair miss < 1e-3. LSH is the wrong tool for LOW thresholds
    * on isotropic data — at cosine 0.4 the hyperplane agreement rate
    * (0.63) barely exceeds the background (0.5) and no (r, b) both
    * prunes and recalls; use [[bruteForceTopK]] or [[ivfTopK]] there.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      numPlanes: Int = 256, bands: Int = 16, dim: Int = 64,
      multiProbe: Int = 1): DataFrame = {
    val qNorm = withNorm(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))
    val cNorm = withNorm(corpus, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"))
    val candidates = lshCandidates(queries, corpus, idCol, vecCol,
      numPlanes, bands, dim, multiProbe)
    val scored = candidates
      .join(cNorm, Seq("neighbor_id"))
      .join(broadcast(qNorm), Seq("query_id"))
      .withColumn("cosine",
        cosineFromParts(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    topKPerQuery(scored, k)
  }

  /** Append deterministically perturbed near-duplicates of the rows
    * matching `sourceFilter`: copy c (1-based) gets id + c*idOffset
    * and embedding[i] + (c*scaleStep) * ((i mod 5) - 2), computed in
    * double and cast back to float — byte-reproducible in any engine
    * (the DuckDB oracle replays it with list_transform), so
    * approximate-search queries can be verified against an exact
    * oracle on a corpus that actually CONTAINS near-duplicates.
    * Per source vector the cosine to copy c is strictly decreasing in
    * c (perturbation norm grows), giving a deterministic true top-k.
    */
  def plantNearDuplicates(
      emb: DataFrame, idCol: String, vecCol: String,
      sourceFilter: Column, copies: Int,
      idOffset: Long = 100000L, scaleStep: Double = 0.01): DataFrame = {
    val base = emb.select(col(idCol), col(vecCol))
    (1 to copies).map { c =>
      val scale = scaleStep * c
      base.filter(sourceFilter).select(
        (col(idCol) + lit(idOffset * c)).as(idCol),
        transform(col(vecCol), (x, i) =>
          (x + lit(scale) * (pmod(i, lit(5)) - lit(2)).cast("double"))
            .cast("float")).as(vecCol))
    }.foldLeft(base)(_ union _)
  }

  /** IVF (inverted-file) ANN: the corpus is partitioned into
    * `nCenters` Voronoi cells around seed centroids; a query scores
    * exactly only the cells of its `nProbe` nearest centroids.
    *
    * Centroids are `nCenters` corpus vectors chosen by xxhash64(id)
    * order — deterministic across runs/executors and uniform over
    * the data — optionally refined with `lloydRounds` bounded
    * k-means passes ([[ivfCentroids]]). With nProbe = nCenters every
    * cell is probed and the result equals `bruteForceTopK` exactly
    * regardless of centroid quality, which is the machinery check in
    * SimilaritySpec.
    *
    * Scale: one broadcast of nCenters x dim floats; corpus assigned
    * cell-locally (no shuffle until the candidate join); candidate
    * volume ~ (nProbe / nCenters) of the corpus per query.
    */
  /** Seed centroids (deterministic xxhash64-order sample) refined by
    * `lloydRounds` bounded k-means passes: each round assigns the
    * corpus to its nearest centroid (one distributed pass — the same
    * codegen'd assignment the search uses) and recomputes centroids
    * as per-cell means via ONE partial-aggregated groupBy collected
    * at nCenters x dim scale (a few KB). Empty cells keep their old
    * centroid. Deterministic up to floating-point summation order:
    * seed order and assignment ties are order-independent, but the
    * per-cell `avg` sums doubles in partition/task order, so
    * Lloyd-refined centroids can differ in the last ulps across
    * cluster layouts (and downstream cell assignment of a vector
    * sitting exactly on a Voronoi boundary with it).
    */
  def ivfCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCenters: Int, lloydRounds: Int = 0): Array[Array[Float]] = {
    val cNorm = withNorm(corpus, idCol, vecCol)
    var centroids: Array[Array[Float]] = cNorm
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(nCenters)
      .select(col("vec")).collect()
      .map(_.getSeq[Float](0).toArray)
    (1 to lloydRounds).foreach { _ =>
      val assigned = cNorm.withColumn("cid",
        nearestCentroidId(col("vec"), centroids))
      val means = assigned
        .select(col("cid"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .view.mapValues(rows =>
          rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat)).toMap
      centroids = centroids.indices.map(i =>
        means.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** Nearest-centroid cell id, via ONE codegen'd expression over a
    * reference-object centroid matrix ([[graft.plans.NearestCentroids]]).
    * Plan size is independent of nCenters — the per-centroid literal
    * struct subtrees this replaces were a plan/codegen blowup at the
    * thousands of cells a 100 TB IVF needs (round-4 verdict #2).
    */
  def nearestCentroidId(vec: Column, centroids: Array[Array[Float]]): Column =
    VectorExpressions.nearestCentroids(vec, centroids, 1).getItem(0)

  /** Per-subspace PQ codebooks (m subspaces x ksub codewords x
    * d/m dims): codeword c of subspace j is the j-th subvector of the
    * c-th SEED vector — seeds are `seedIds` in their given order
    * (pinned, oracle-replayable) or the first ksub corpus vectors in
    * xxhash64(id) order (deterministic uniform sample, the
    * [[ivfCentroids]] production default) — optionally refined with
    * `lloydRounds` k-means passes run on ALL m subspaces at once:
    * each round is ONE distributed encode pass ([[pqEncodeCol]])
    * exploded to (subspace, code, pos) cell means via a single
    * partial-aggregated groupBy, collected at m x ksub x dsub floats
    * (a few KB). Empty cells keep their codeword. Refined codebooks
    * inherit [[ivfCentroids]]' caveat: per-cell `avg` sums in
    * partition order, so last-ulp drift across cluster layouts is
    * possible — pin seeds and skip refinement where bit-replay
    * matters.
    */
  def pqCodebooks(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int,
      seedIds: Option[Seq[Long]] = None,
      lloydRounds: Int = 0): Array[Array[Array[Float]]] = {
    require(m >= 1 && ksub >= 1, "m and ksub must be >= 1")
    val seeds: Array[Array[Float]] = seedIds match {
      case Some(ids) =>
        require(ids.size == ksub, s"seedIds must have exactly ksub=$ksub entries")
        val byId = corpus.filter(col(idCol).isin(ids: _*))
          .select(col(idCol), col(vecCol)).collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
        ids.map(id => byId.getOrElse(id,
          throw new IllegalArgumentException(s"seed id $id not in corpus"))).toArray
      case None =>
        corpus.orderBy(xxhash64(col(idCol)), col(idCol)).limit(ksub)
          .select(col(vecCol)).collect().map(_.getSeq[Float](0).toArray)
    }
    val dim = seeds.headOption.map(_.length).getOrElse(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    var books: Array[Array[Array[Float]]] =
      Array.tabulate(m)(j => seeds.map(s => s.slice(j * dsub, (j + 1) * dsub)))
    (1 to lloydRounds).foreach { _ =>
      val cells = corpus
        .select(posexplode(pqEncodeCol(col(vecCol), books)).as(Seq("j", "code")),
          col(vecCol).as("__v"))
        .select(col("j"), col("code"),
          posexplode(slice(col("__v"), col("j") * dsub + 1, lit(dsub))).as(Seq("pos", "x")))
        .groupBy(col("j"), col("code"), col("pos")).agg(avg(col("x")).as("mean"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .view.mapValues(rows =>
          rows.sortBy(_.getInt(2)).map(_.getDouble(3).toFloat)).toMap
      books = Array.tabulate(m)(j => Array.tabulate(ksub)(c =>
        cells.getOrElse((j, c), books(j)(c))))
    }
    books
  }

  /** PQ codes column (array<int>, one codeword id per subspace) — the
    * STORAGE pass of a quantized corpus: persist these m small ints
    * and drop the floats (d=64 float32 -> m=8 codes is 32x). One
    * codegen'd expression ([[graft.plans.PqEncode]]); the codebook
    * tensor is a plan constant.
    */
  def pqEncodeCol(vec: Column, codebooks: Array[Array[Array[Float]]]): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftFunctions.register)
    VectorExpressions.pqEncode(vec, codebooks)
  }

  /** ADC score column: dot(query, reconstruction(codes)) without
    * materializing the reconstruction ([[graft.plans.PqAdc]]).
    */
  def pqAdcCol(qvec: Column, codes: Column, codebooks: Array[Array[Array[Float]]]): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftFunctions.register)
    VectorExpressions.pqAdc(qvec, codes, codebooks)
  }

  /** PQ-ADC top-k (Jégou et al. 2011): the corpus is PQ-encoded once
    * (one codegen'd pass; at serving time the codes would be the
    * stored table) and every query scores every code row by
    * asymmetric distance — dot(query, codeword reconstruction) — so
    * the scan reads m ints per corpus row instead of d floats: the
    * memory/bandwidth story that makes exhaustive scans of a 100 TB
    * vector corpus feasible (32x less data moved at d=64, m=8).
    * Queries broadcast raw (asymmetric = only the corpus is
    * quantized; the query side stays exact, halving the quantization
    * error vs symmetric). Ranking ties and ordering follow
    * [[topKPerQuery]] ((score DESC, neighbor ASC)); ranks by dot like
    * [[bruteForceTopKInt8]] — equals cosine ranking on L2-normalized
    * corpora. Same two-phase bounded top-k; corpus floats never cross
    * a shuffle (only codes do).
    */
  def pqTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, ksub: Int = 16,
      seedIds: Option[Seq[Long]] = None,
      lloydRounds: Int = 0,
      excludeSelf: Boolean = true): DataFrame = {
    val books = pqCodebooks(corpus, idCol, vecCol, m, ksub, seedIds, lloydRounds)
    val coded = corpus.select(col(idCol).as("neighbor_id"),
      pqEncodeCol(col(vecCol), books).as("__codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qvec"))
    val scored = coded.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        pqAdcCol(col("__qvec"), col("__codes"), books).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Coarse centroids pinned to explicit corpus rows (oracle-
    * replayable, the [[graft.operators.Dedup.semanticDedup]] seed
    * mechanism) or the xxhash64-order [[ivfCentroids]] sample.
    */
  def seedCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCenters: Int, seedIds: Option[Seq[Long]],
      lloydRounds: Int = 0): Array[Array[Float]] = seedIds match {
    case Some(ids) =>
      require(ids.size == nCenters,
        s"seedIds must have exactly nCenters=$nCenters entries")
      val byId = corpus.filter(col(idCol).isin(ids: _*))
        .select(col(idCol).cast("long"), col(vecCol)).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      ids.map(i => byId.getOrElse(i,
        throw new IllegalArgumentException(s"seed id $i not in corpus"))).toArray
    case None =>
      ivfCentroids(corpus, idCol, vecCol, nCenters, lloydRounds)
  }

  /** IVF-PQ (Jégou et al. 2011, the FAISS `IVFx,PQy` shape): the
    * coarse quantizer prunes the scan to the query's `nProbe` cells
    * AND the scanned rows are m-int PQ codes scored by ADC — the two
    * memory/compute levers of a billion-vector serving index
    * composed. At nCenters cells and m-byte codes a query touches
    * ~(nProbe/nCenters) x (m/4d) of the float-corpus bytes an
    * exhaustive float scan would read.
    *
    * `residual = true` (the FAISS default, what makes IVF-PQ
    * competitive at low nProbe): each vector is PQ-encoded as its
    * RESIDUAL x - c(x) against its own cell centroid, and the score
    * decomposes as dot(q, c) + ADC(q, residual codes) — the coarse
    * term is exact, so quantization error applies only to the
    * (much smaller) residual: the codebooks spend their 2^bits
    * resolution on the within-cell displacement instead of re-coding
    * the coarse position every centroid already carries. Residuals
    * are float32 subtractions (IEEE-rounded exact differences, so
    * the DuckDB oracle can replay them bit-for-bit via
    * CAST(a::DOUBLE - b::DOUBLE AS REAL)); codebooks train on the
    * residual column with the same seed mechanism (a seed id pins
    * that row's RESIDUAL). The per-(query, probe) dot(q, c) term is
    * computed once on the broadcast probe side — the big coded scan
    * still moves only m-int codes.
    *
    * With `nProbe = nCenters` and `residual = false` the result
    * equals [[pqTopK]] exactly (every cell probed — the coarse layer
    * is pure pruning), which is the machinery check in
    * SimilaritySpec; the residual variant's check is planted-recall
    * dominance over the raw variant at equal nProbe. Cell assignment
    * and probe ranking are the codegen'd
    * [[graft.plans.NearestCentroids]] order (dot x 1/||c||, ties to
    * the larger cell id); both centroid sets pin to seed rows for
    * oracle replay.
    */
  def ivfPqTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCenters: Int = 16, nProbe: Int = 4,
      m: Int = 8, ksub: Int = 16,
      coarseSeedIds: Option[Seq[Long]] = None,
      pqSeedIds: Option[Seq[Long]] = None,
      lloydRounds: Int = 0,
      excludeSelf: Boolean = true,
      residual: Boolean = false): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCenters, "1 <= nProbe <= nCenters")
    val centroids = seedCentroids(corpus, idCol, vecCol, nCenters,
      coarseSeedIds, lloydRounds)
    if (!residual) {
      val books = pqCodebooks(corpus, idCol, vecCol, m, ksub, pqSeedIds, lloydRounds)
      val coded = corpus.select(col(idCol).as("neighbor_id"),
        nearestCentroidId(col(vecCol), centroids).as("cid"),
        pqEncodeCol(col(vecCol), books).as("__codes"))
      val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qvec"))
        .withColumn("cid",
          explode(VectorExpressions.nearestCentroids(col("__qvec"), centroids, nProbe)))
      val scored = coded.join(broadcast(probes), Seq("cid"))
        .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
        .select(col("query_id"), col("neighbor_id"),
          pqAdcCol(col("__qvec"), col("__codes"), books).as("cosine"))
      topKPerQuery(scored, k)
    } else {
      graft.plans.GraftFunctions.register(corpus.sparkSession)
      // cid -> centroid vector, a nCenters-row broadcast lookup used
      // twice: residual formation on the corpus side, the exact
      // dot(q, c) term on the probe side
      val cent = corpus.sparkSession.createDataFrame(
        centroids.toSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
        .toDF("cid", "__cvec")
      val resid = corpus
        .select(col(idCol), col(vecCol),
          nearestCentroidId(col(vecCol), centroids).as("cid"))
        .join(broadcast(cent), Seq("cid"))
        .withColumn("__resid",
          zip_with(col(vecCol), col("__cvec"), (a, b) => a - b))
      val books = pqCodebooks(resid, idCol, "__resid", m, ksub,
        pqSeedIds, lloydRounds)
      val coded = resid.select(col(idCol).as("neighbor_id"), col("cid"),
        pqEncodeCol(col("__resid"), books).as("__codes"))
      val probes = queries
        .select(col(idCol).as("query_id"), col(vecCol).as("__qvec"))
        .withColumn("cid",
          explode(VectorExpressions.nearestCentroids(col("__qvec"), centroids, nProbe)))
        .join(broadcast(cent), Seq("cid"))
        .withColumn("__qc", VectorExpressions.dot(col("__qvec"), col("__cvec")))
        .drop("__cvec")
      val scored = coded.join(broadcast(probes), Seq("cid"))
        .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
        .select(col("query_id"), col("neighbor_id"),
          (col("__qc") +
            pqAdcCol(col("__qvec"), col("__codes"), books)).as("cosine"))
      topKPerQuery(scored, k)
    }
  }

  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCenters: Int = 16, nProbe: Int = 4,
      lloydRounds: Int = 0): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCenters, "1 <= nProbe <= nCenters")
    val cNorm = withNorm(corpus, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"))
    val qNorm = withNorm(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))

    val centroids = ivfCentroids(corpus, idCol, vecCol, nCenters, lloydRounds)

    val assigned = cNorm.withColumn("cid",
      nearestCentroidId(col("cvec"), centroids))

    // nProbe nearest centroids per query, one expression evaluation
    val probes = qNorm.withColumn("cid",
        explode(VectorExpressions.nearestCentroids(col("qvec"), centroids, nProbe)))
      .select(col("query_id"), col("qvec"), col("qnorm"), col("cid"))

    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        cosineFromParts(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    topKPerQuery(scored, k)
  }
}
