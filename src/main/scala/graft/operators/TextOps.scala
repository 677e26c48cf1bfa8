package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text operators (beyond the per-document
  * [[graft.functions.TextFunctions]] surface): term statistics /
  * TF-IDF and PII redaction — the feature-extraction and scrubbing
  * stages of a training-data pipeline.
  */
object TextOps {

  /** Per-(document, term) statistics: tf (occurrences in the doc),
    * df (documents containing the term).
    *
    * Scale: explode -> two hash aggregations (both partial-agg
    * friendly) + a term-keyed join of the df side, which is ≤ vocab
    * size — orders of magnitude smaller than the corpus. Integer
    * outputs, so the DuckDB oracle compares exactly (no FP).
    */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"))
  }

  /** Frequency-ranked vocabulary over the corpus: (term, term_id, n)
    * with term_id dense from `firstId` (ids below it reserved for
    * special tokens), ordered by (count desc, term asc) — the
    * deterministic tie-break makes id assignment replayable in any
    * engine. The tokenizer-prep step: a fixed token→id table the
    * encode pass and the training job both consume.
    *
    * Scale: explode + partial-agg count (the corpus never shuffles
    * raw text — 8-byte-ish terms and counts do), then the
    * top-maxVocab cut is a sort+limit, which Spark plans as
    * TakeOrderedAndProject: per-partition bounded heaps, maxVocab
    * rows per partition to the driver merge — never a global sort of
    * the distinct-term set. The dense-rank window then runs over
    * ONLY those maxVocab rows (a single partition bounded by
    * construction, not by luck).
    */
  def buildVocab(
      docs: DataFrame, textCol: String,
      maxVocab: Int, firstId: Long = 0L): DataFrame = {
    require(maxVocab > 0, "maxVocab must be positive")
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(maxVocab)
    counts.withColumn("term_id",
        (row_number().over(Window.orderBy(col("n").desc, col("term")))
          - 1 + firstId).cast("bigint"))
      .select(col("term"), col("term_id"), col("n"))
  }

  /** Token-id encoding against a vocabulary: each doc becomes its
    * token-id sequence (`ids`), out-of-vocabulary tokens mapped to
    * `unkId`, empty/token-free docs kept with an empty array (a
    * vanished doc is a silent corpus shrink; an empty one is
    * visible and filterable).
    *
    * Scale: the vocab is BROADCAST (≤ maxVocab rows by contract —
    * KBs to low MBs), so the token→id join is map-side with no
    * corpus shuffle for the lookup; per-doc reassembly sorts each
    * document's OWN (pos, id) pairs inside the aggregation — never
    * a global order-by. One shuffle total, keyed on doc id.
    */
  def encodeDocs(
      docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, unkId: Long = -1L): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))
      .filter(length(col("term")) > 0)
    val enc = toks
      .join(broadcast(vocab.select(col("term"), col("term_id"))), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("pos"),
        coalesce(col("term_id"), lit(unkId)).as("id")))).as("__ps"))
      .select(col("doc_id"),
        transform(col("__ps"), p => p.getField("id")).as("ids"))
    docs.select(col(idCol).as("doc_id")).join(enc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ids"), array().cast("array<bigint>")).as("ids"))
  }

  /** Learn a BPE merge table (Sennrich et al., "Neural Machine
    * Translation of Rare Words with Subword Units", ACL 2016) — the
    * tokenizer-TRAINING step that [[buildVocab]]'s word-level ids
    * don't cover. The corpus-sized work is ONE distributed pass: a
    * word-frequency aggregate cut to the `maxWords` most frequent
    * words (TakeOrderedAndProject, like [[buildVocab]] — this is
    * also how production BPE trainers run: merges are a function of
    * the word-frequency TABLE, never of document order, so the
    * driver loop operates on a bounded table whatever the corpus
    * size). Words symbolize as characters + `</w>`; each round
    * merges the most frequent adjacent symbol pair (frequency-
    * weighted by word count; ties to the lexicographically smallest
    * pair — deterministic across runs and engines), maintained
    * INCREMENTALLY via a pair→words index so a round touches only
    * the words containing the merged pair. Stops at `numMerges`, or
    * earlier when no pair reaches `minPairFreq`.
    *
    * Returns the merges in rank order — feed them to [[bpeEncode]] /
    * [[bpeEncodeDocs]] (and persist them; the table IS the
    * tokenizer).
    */
  def learnBpe(
      docs: DataFrame, textCol: String,
      numMerges: Int, maxWords: Int = 50000,
      minFreq: Long = 1L, minPairFreq: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(maxWords > 0, "maxWords must be positive")
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minFreq)
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val syms = words.map { case (w, _) => graft.plans.BpeEncodeTokens.symbolsOf(w) }
    val freq = words.map(_._2)
    val pairCount = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val pairWords = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def addWord(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val n = pairCount.getOrElse(p, 0L) + sign * freq(i)
        if (n <= 0L) pairCount.remove(p) else pairCount(p) = n
        if (sign > 0)
          pairWords.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += i
        j += 1
      }
    }
    syms.indices.foreach(addWord(_, 1L))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // max by (count desc, pair asc) — deterministic
      var best: (String, String) = null
      var bestN = 0L
      pairCount.foreach { case (p, n) =>
        if (n > bestN || (n == bestN && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestN = n
        }
      }
      if (best == null || bestN < minPairFreq) exhausted = true
      else {
        merges += best
        val affected = pairWords.getOrElse(best, Set.empty).toSeq
        affected.foreach { i =>
          addWord(i, -1L)
          val s = syms(i)
          var j = 0
          while (j < s.length - 1) {
            if (s(j) == best._1 && s(j + 1) == best._2) {
              s(j) = s(j) + s(j + 1)
              s.remove(j + 1)
            } else j += 1
          }
          addWord(i, 1L)
        }
        pairCount.remove(best)
        pairWords.remove(best)
        round += 1
      }
    }
    merges.toSeq
  }

  /** BPE tokens of a text column under a learned merge table — ONE
    * codegen'd expression ([[graft.plans.BpeEncodeTokens]]; the rank
    * map is a plan constant), shuffle-free and linear. Tokenization
    * matches [[TextFunctions.tokens]] exactly, so learn and encode
    * see the same words.
    */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftFunctions.register)
    call_function("graft_bpe_encode", text,
      typedLit(merges.map(p => Array(p._1, p._2)).toArray))
  }

  /** Per-document BPE token arrays: (idCol, tokens). Null text
    * yields an empty array (visible, filterable — like
    * [[encodeDocs]]).
    */
  def bpeEncodeDocs(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol),
      coalesce(bpeEncode(col(textCol), merges),
        array().cast("array<string>")).as("tokens"))

  /** RAG-style document chunking: fixed-size token windows with
    * overlap — the retrieval-corpus preparation pass that turns each
    * document into indexable passages. Chunk k of a document covers
    * tokens `[k·stride, k·stride + chunkTokens)` where
    * `stride = chunkTokens − overlapTokens`; the last chunk is the
    * first one whose window reaches the end (a trailing window that
    * would add no new token is never emitted), and a document always
    * yields at least one chunk (a trimmed-empty document yields one
    * empty chunk — visible and filterable, not silently dropped).
    * Tokenization is the corpus-wide [[TextFunctions.tokens]]
    * whitespace pass, so chunk token counts agree with
    * [[graft.functions.TextFunctions.tokenCount]] budgeting.
    *
    * Output: (idCol, chunk_id, start_token, n_tokens, chunk_text).
    *
    * Scale shape: ZERO shuffles — tokenize, chunk-count arithmetic,
    * `explode(sequence(...))` and a 1-based `slice`/`array_join` are
    * all per-row codegen'd expressions; the fan-out is bounded by
    * `len/stride` per document and composes with any downstream
    * embed/index stage without a repartition.
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens): $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = TextFunctions.tokens(col(textCol))
    val n = when(length(trim(col(textCol))) === 0, lit(0))
      .otherwise(size(toks)).cast("bigint")
    // integer ceil((n - overlap) / stride), floored at one chunk
    // (values are token counts — far inside double's exact-integer
    // range, so floor(x / y) is exact)
    val nChunks = greatest(lit(1L),
      floor((n - overlapTokens + (stride - 1)) / lit(stride)).cast("bigint"))
    val start = col("chunk_id") * stride
    docs.select(col(idCol), col(textCol),
        explode(sequence(lit(0L), nChunks.cast("bigint") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        start.as("start_token"),
        greatest(lit(0L), least(lit(chunkTokens.toLong),
          when(length(trim(col(textCol))) === 0, lit(0))
            .otherwise(size(toks)).cast("bigint") - start)).as("n_tokens"),
        array_join(slice(toks, (start + 1).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** TF-IDF with the standard smoothed idf:
    * idf = ln((N + 1) / (df + 1)) + 1. N is passed in (the caller
    * usually knows it; recomputing would add a scan).
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String, numDocs: Long): DataFrame =
    termStats(docs, idCol, textCol)
      .withColumn("tfidf",
        col("tf") * (log((lit(numDocs + 1).cast("double")) / (col("df") + 1)) + 1))

  /** BM25 top-k retrieval (Robertson/Spärck Jones; the Lucene
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf variant, which is
    * always positive):
    *
    *   score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * summed over the DISTINCT query terms — keyword search over the
    * corpus, the retrieval face of [[termStats]].
    *
    * Scale shape: the corpus tokenizes ONCE into tf/dl aggregates
    * (partial-agg friendly, raw text never shuffles); query terms
    * and their df rows are BROADCAST (bounded by the query set, not
    * the corpus), so the postings join is map-side; one doc-keyed
    * shuffle joins dl; N/total-length ride along as a broadcast
    * 1-row cross join (never a driver collect); and the final
    * ranking is the bounded [[graft.operators.Similarity.topKPerQuery]]
    * heap aggregate — no window over the corpus, no per-query
    * candidate lists in memory.
    *
    * Determinism: tf/df/dl/N are exact integers; per-(query, doc)
    * contributions fold in TERM-sorted order (left fold from 0.0),
    * so every score bit is run- and partition-independent. Ranks
    * tie-break (score DESC, doc ASC). Scores use ln(), which is
    * libm-dependent cross-ENGINE (see [[lmFamiliarity]]) — gate
    * queries compare the rank ordering, not the score value.
    *
    * @param queries (qIdCol, qTextCol) rows; tokenized with the same
    *                [[TextFunctions.tokens]] as the corpus
    * @param k       results per query
    */
  def bm25(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, "k must be positive")
    graft.plans.VectorExpressions.register(docs.sparkSession)
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = docs.select(col(idCol).as("doc_id"))
      .join(dl, Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("dl"), lit(0L))).as("total_dl"))
    val qterms = queries
      .select(col(qIdCol).as("query_id"),
        explode(TextFunctions.tokens(col(qTextCol))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val qdf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .join(broadcast(qterms.select("term").distinct()), Seq("term"))
    val dbl: String => Column = c => col(c).cast("double")
    val idf = log(lit(1.0) +
      (dbl("n_docs") - dbl("df") + lit(0.5)) / (dbl("df") + lit(0.5)))
    val avgdl = dbl("total_dl") / dbl("n_docs")
    val contrib = idf * (dbl("tf") * lit(k1 + 1.0)) /
      (dbl("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * dbl("dl") / avgdl))
    val scored = tf
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(qdf), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("__c", contrib)
      .groupBy("query_id", "doc_id")
      .agg(array_sort(collect_list(struct(col("term"), col("__c")))).as("__cs"))
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        aggregate(col("__cs"), lit(0.0),
          (acc, x) => acc + x.getField("__c")).as("cosine"))
    Similarity.topKPerQuery(scored, k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank"), col("cosine").as("score"))
  }

  /** PII redaction: emails, international-ish phone numbers and
    * 13-16-digit card-like numbers replaced with typed placeholders.
    * Pure regexp_replace chain — codegen'd, shuffle-free, linear.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+?[0-9][0-9 ().-]{7,}[0-9]"
  val cardRe = "\\b[0-9]{13,16}\\b"

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        cardRe, "<NUMBER>"),
      phoneRe, "<PHONE>")

  /** Gopher-style repetition quality signals (per document):
    *
    *  - `n_lines`, `dup_line_frac` (repeated lines / all lines),
    *    `dup_line_char_frac` (chars inside repeated lines / chars in
    *    all lines) — the "duplicate line (character) fraction" rules;
    *  - `n_paras`, `dup_para_frac` — same over blank-line-separated
    *    paragraphs;
    *  - `top_gram`, `top_gram_cnt`, `top_gram_char_frac` — the "top
    *    n-gram character fraction" rule: chars covered by the single
    *    most frequent word n-gram over the document's total chars.
    *
    * Boilerplate-heavy and template-generated pages score high on
    * these and get filtered before training.
    *
    * Scale: two explode → hash-aggregate chains (lines, n-grams),
    * both map-side partial-agg friendly and LINEAR in corpus size —
    * a per-document array self-count (`transform(distinct, x ->
    * count(filter(...)))`) would be O(len²) per doc and blow up on
    * 100k-token documents, so counting goes through the aggregate,
    * not array lambdas. The most-frequent gram is
    * `max(struct(cnt, gram))` — one partial agg, deterministic
    * tie-break (lexicographically greatest gram among tied counts).
    * "Repeated" counts ALL occurrences of a unit appearing more than
    * once (the MassiveText convention), for lines and paragraphs
    * alike. Empty docs yield zero fractions, not nulls.
    */
  def repetitionSignals(
      docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 2): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))

    // shared explode -> count -> per-doc rollup for one unit kind
    def unitStats(sep: String, p: String): DataFrame = {
      val cnt = base.select(col("doc_id"),
          explode(filter(split(col("__t"), sep), u => length(u) > 0)).as("__u"))
        .groupBy(col("doc_id"), col("__u"))
        .agg(count(lit(1)).as("__c"))
      cnt.groupBy(col("doc_id")).agg(
        sum(col("__c")).as(s"__n_$p"),
        sum(when(col("__c") > 1, col("__c")).otherwise(0L)).as(s"__dup_$p"),
        sum(col("__c") * length(col("__u"))).as(s"__chars_$p"),
        sum(when(col("__c") > 1, col("__c") * length(col("__u")))
          .otherwise(0L)).as(s"__dup_chars_$p"))
    }

    val lineStats = unitStats("\n", "l")
    val paraStats = unitStats("\n\n", "p")
    val gramCnt = base.select(col("doc_id"),
        explode(TextFunctions.wordNgrams(col("__t"), ngram)).as("__g"))
      .groupBy(col("doc_id"), col("__g"))
      .agg(count(lit(1)).as("__c"))
    val topGram = gramCnt.groupBy(col("doc_id"))
      .agg(max(struct(col("__c"), col("__g"))).as("__m"))
      .select(col("doc_id"), col("__m.__g").as("__top_gram"),
        col("__m.__c").as("__top_cnt"))

    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))
    def z(c: Column): Column = coalesce(c, lit(0L))
    // only (id, length) crosses the join shuffles — never the text
    base.select(col("doc_id"), length(col("__t")).as("__t_len"))
      .join(lineStats, Seq("doc_id"), "left")
      .join(paraStats, Seq("doc_id"), "left")
      .join(topGram, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        z(col("__n_l")).as("n_lines"),
        frac(z(col("__dup_l")), z(col("__n_l"))).as("dup_line_frac"),
        frac(z(col("__dup_chars_l")), z(col("__chars_l"))).as("dup_line_char_frac"),
        z(col("__n_p")).as("n_paras"),
        frac(z(col("__dup_p")), z(col("__n_p"))).as("dup_para_frac"),
        coalesce(col("__top_gram"), lit("")).as("top_gram"),
        z(col("__top_cnt")).as("top_gram_cnt"),
        frac(z(col("__top_cnt")) * length(coalesce(col("__top_gram"), lit(""))),
          col("__t_len")).as("top_gram_char_frac"))
  }

  /** Corpus-wide frequent terms ("heavy hitters"), EXACT, without
    * ever shuffling the full term space: a Misra-Gries sketch
    * ([[graft.plans.HeavyHittersAgg]]) runs as a partial aggregate —
    * k counters per task cross the wire — and by the MG guarantee
    * its survivors are a SUPERSET of every term with frequency >
    * n/(k+1); an exact count over just those candidates (broadcast
    * semi join, then a partial-agg count) turns the superset into
    * the exact answer. Same approximate-prune-exact-verify shape as
    * [[Dedup.incrementalDedup]].
    *
    * `k` defaults to ceil(1/minFreqRatio) + 1, the smallest sketch
    * whose guarantee covers the threshold; raise it to shrink the
    * candidate set (fewer exact counts), never for correctness.
    * `totalTokens` skips the counting scan when the caller already
    * knows n.
    *
    * Returns (term, freq) for terms with freq >= ceil(n *
    * minFreqRatio); row order is unspecified (sort downstream if
    * needed — the result is at most ~1/minFreqRatio rows).
    */
  def heavyTerms(
      docs: DataFrame, textCol: String, minFreqRatio: Double,
      sketchK: Int = 0, totalTokens: Option[Long] = None): DataFrame = {
    require(minFreqRatio > 0 && minFreqRatio <= 1, "minFreqRatio in (0,1]")
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftFunctions.register)
    val terms = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val n = totalTokens.getOrElse(terms.count())
    val threshold = math.ceil(n * minFreqRatio).toLong
    val k = if (sketchK > 0) sketchK
      else math.ceil(1.0 / minFreqRatio).toInt + 1
    val candidates = terms
      .agg(call_function("graft_heavy_hitters", col("term"), lit(k)).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item").as("term"))
    terms.join(broadcast(candidates), Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= threshold)
  }

  /** Benchmark-contamination detection (the GPT-3-style n-gram
    * decontamination pass): flags corpus documents sharing word
    * n-grams with an evaluation/benchmark set, so they can be
    * dropped before training and the benchmark stays meaningful.
    *
    * Per document: `n_grams` (distinct n-grams), `n_contaminated`
    * (distinct n-grams also present anywhere in the benchmark),
    * `contaminated_frac`, and `contaminated` (>= `minMatches` hits
    * — published pipelines use ANY overlap at n=13).
    *
    * Scale: the benchmark side is an eval suite — thousands of
    * documents, not terabytes — so its distinct-gram set is
    * broadcast and the corpus side is a linear scan + explode +
    * broadcast LEFT SEMI join + partial-agg count: the 100 TB corpus
    * is never shuffled on gram strings. Set `broadcastBench=false`
    * only if the "benchmark" is itself huge (falls back to a
    * shuffled semi join). Exact-match semantics (no hashing) keep
    * results engine-replayable; at extreme scale swap the join key
    * for xxhash64(gram) to shrink the broadcast.
    */
  def contamination(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String,
      n: Int = 13, minMatches: Int = 1,
      broadcastBench: Boolean = true): DataFrame = {
    // ONE corpus scan: n_grams rides the explode (explode_outer keeps
    // gram-less docs), the benchmark join is a broadcast left join
    // with a hit marker, and one partial aggregate produces both the
    // per-doc hit count and the constant n_grams — tokenizing the
    // 100 TB side twice (separate count + hits subtrees) would double
    // the dominant cost
    val perGram = docs.select(col(idCol).as("doc_id"),
        array_distinct(TextFunctions.wordNgrams(col(textCol), n)).as("__gs"))
      .select(col("doc_id"), size(col("__gs")).cast("bigint").as("__n_grams"),
        explode_outer(col("__gs")).as("__g"))
    val benchGrams0 = bench.select(explode(array_distinct(
        TextFunctions.wordNgrams(col(benchTextCol), n))).as("__g"))
      .distinct()
      .withColumn("__hit", lit(true))
    val benchGrams = if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    perGram.join(benchGrams, Seq("__g"), "left")
      .groupBy(col("doc_id"))
      .agg(max(col("__n_grams")).as("n_grams"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_contaminated"))
      .select(
        col("doc_id"), col("n_grams"), col("n_contaminated"),
        when(col("n_grams") > 0,
          col("n_contaminated").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)).as("contaminated_frac"),
        (col("n_contaminated") >= minMatches).as("contaminated"))
  }

  /** Deterministic source-weighted sampling — the data-mixing stage
    * of a training pipeline ("webtext at 100%, common-crawl at 25%"):
    * a row survives iff its id's hash bucket (0..9999) falls under
    * its source's rate x 10000.
    *
    * Hash-based (not `rand()`): the SAME rows are kept on every run,
    * engine and retry — reproducible mixtures, and an engine-
    * replayable oracle (multiplicative hashing is plain integer
    * arithmetic; swap in xxhash64 via `bucketFn` when external
    * replay doesn't matter). Shuffle-free, codegen'd filter; at
    * 100 TB this is a scan that keeps rate x rows, nothing else.
    */
  def sampleBySource(
      docs: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      bucketFn: Column => Column = defaultBucket): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    if (rates.size <= 64) {
      // small maps: one codegen'd CASE chain, shuffle-free
      val rateCol = rates.foldLeft(lit(math.round(defaultRate * 10000)): Column) {
        case (acc, (src, r)) =>
          when(col(sourceCol) === src, lit(math.round(r * 10000))).otherwise(acc)
      }
      docs.filter(bucketFn(col(idCol)) < rateCol)
    } else {
      // thousands of sources: a per-source literal CASE subtree is the
      // plan-size blowup LshBandBits/NearestCentroids exist to avoid —
      // broadcast-join a tiny rates table instead (no shuffle on docs)
      val spark = docs.sparkSession
      import spark.implicits._
      val ratesDf = broadcast(
        rates.toSeq.map { case (s, r) => (s, math.round(r * 10000)) }
          .toDF(sourceCol, "__rate"))
      docs.join(ratesDf, Seq(sourceCol), "left")
        .filter(bucketFn(col(idCol)) <
          coalesce(col("__rate"), lit(math.round(defaultRate * 10000))))
        .drop("__rate")
        .select(docs.columns.map(col): _*) // original column order
    }
  }

  /** Token-BUDGET source mixing — the unit a training mixture is
    * actually specified in ("300B tokens of web, 100B of code"):
    * doc-fraction sampling ([[sampleBySource]]) under-represents
    * sources with long documents, so this keeps each source's
    * documents — in deterministic seeded-hash order — until the
    * source's TOKEN budget is met. A doc survives iff the token sum
    * of hash-earlier docs of the same source is below the budget:
    * the boundary-crossing doc is kept (any budget >= 1 keeps at
    * least one doc). Determinism matches the other samplers (same
    * rows on every run/engine/retry); growth stability is
    * necessarily WEAKER than [[sampleBySource]]'s per-row bucket
    * test: a fixed budget over a grown corpus must drop something,
    * but only new docs hashing EARLIER than a kept doc can displace
    * it — appended data never reshuffles the selection wholesale.
    * Sources absent from `budgets` are dropped (budget 0) —
    * explicit mixtures only.
    *
    * Scale: a per-source running sum. A window over
    * (PARTITION BY source ORDER BY key) sorts each source in ONE
    * partition — a mega-source (the whole of common-crawl under one
    * label) is exactly the skew that breaks. Instead this extends
    * [[packSequences]]' two-phase scan to grouped prefixes:
    * range-partition by (source, key, id) — each partition holds a
    * contiguous slice of the composite order, so a source spans
    * consecutive partitions — then one pass computes per-(partition,
    * source) token sums (nPartitions x nSources longs to the driver;
    * sources here are mixture LABELS, dozens not millions — per-
    * DOMAIN limits belong to [[capPerGroup]]), the driver prefixes
    * them per source, and each partition streams its rows against
    * its broadcast base. Output: (id, source, n_tokens,
    * tokens_before) — the exclusive prefix makes the budget decision
    * auditable and the oracle replayable. Rows with a NULL id,
    * source, or token count are dropped (no position, no mixture
    * label, or no budget weight — visible behavior, not an error;
    * same contract as [[capPerGroup]]'s null ids).
    */
  def sampleByTokenBudget(
      docs: DataFrame, idCol: String, sourceCol: String, tokensCol: String,
      budgets: Map[String, Long], seed: Long = 0L,
      partitions: Int = 0): DataFrame = {
    require(budgets.nonEmpty, "at least one source budget")
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val projected = docs.select(
      col(idCol).cast("bigint").as("id"),
      col(sourceCol).cast("string").as("source"),
      col(tokensCol).cast("bigint").as("n_tokens"),
      shuffleKey(col(idCol), seed).as("__k"))
      // null n_tokens would NPE at the typed-Dataset boundary deep in
      // phase 1 — drop them visibly with the other null keys instead
      .filter(col("source").isNotNull && col("id").isNotNull &&
        col("n_tokens").isNotNull)
    val ordCols = Seq(col("source"), col("__k"), col("id"))
    val ranged =
      if (partitions > 0) projected.repartitionByRange(partitions, ordCols: _*)
      else projected.repartitionByRange(ordCols: _*)
    val sorted = ranged.sortWithinPartitions(ordCols: _*)
    val ds = sorted.as[(Long, String, Long, Long)]
    // phase 1: per-(partition, source) sums — partition count x
    // mixture-label count longs, the only driver-side data
    val partSums = ds.rdd.mapPartitionsWithIndex { case (i, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { case (_, src, w, _) => m(src) = m.getOrElse(src, 0L) + w }
      Iterator((i, m.toMap))
    }.collect().sortBy(_._1)
    val running = scala.collection.mutable.Map.empty[String, Long]
    val bases: Array[Map[String, Long]] = partSums.map { case (_, m) =>
      val snapshot = m.keysIterator
        .map(s => s -> running.getOrElse(s, 0L)).toMap
      m.foreach { case (s, w) => running(s) = running.getOrElse(s, 0L) + w }
      snapshot
    }
    val bcBases = spark.sparkContext.broadcast(bases)
    val bcBudgets = spark.sparkContext.broadcast(budgets)
    // phase 2: stream each partition against its base offsets; keep
    // while the exclusive prefix is under budget
    ds.rdd.mapPartitionsWithIndex { case (i, it) =>
      val run = scala.collection.mutable.Map[String, Long]() ++ bcBases.value(i)
      val buds = bcBudgets.value
      it.flatMap { case (id, src, w, _) =>
        val before = run.getOrElse(src, 0L)
        run(src) = before + w
        if (before < buds.getOrElse(src, 0L)) Some((id, src, w, before))
        else None
      }
    }.toDF("id", "source", "n_tokens", "tokens_before")
  }

  /** Per-group document cap — the FineWeb/C4-style per-DOMAIN limit
    * ("at most k pages per registrable domain"): within each group,
    * keep the k rows with the smallest (seeded shuffle key, id) and
    * drop the rest. Hash-based like [[sampleBySource]], so the SAME
    * k representatives survive on every run, engine and retry, and
    * adding more data never evicts a previously-kept row in favor of
    * a hash-larger one.
    *
    * Scale: selection is `groupBy(group).agg(graft_topk(...))` — the
    * bounded O(k)-heap [[graft.plans.TopKPairs]] aggregate runs
    * partially on every map task and merges k-sized states, so a
    * mega-domain (the whole of wikipedia under one key) costs k
    * heap entries per task, never a per-group sort. A `row_number`
    * window would sort every group's full row set in one partition —
    * exactly the skew this operator exists to cap. The winner
    * (group, id) pairs (|groups| x k of them) then semi-join the
    * corpus on BOTH columns — an id that wins a slot in one group
    * must not keep its namesake rows in other groups. Rows with a
    * NULL id are dropped (no position in the deterministic order —
    * visible behavior, not an error). Ids are assumed unique within
    * a group (the usual corpus contract); duplicated (group, id)
    * rows would all survive one slot.
    */
  def capPerGroup(
      docs: DataFrame, groupCol: String, idCol: String, k: Int,
      seed: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftFunctions.register)
    // key < p = 1e9+7 < 2^30: exact in double, so graft_topk's
    // (score DESC, id ASC) order on -key is exactly (key ASC, id ASC)
    val scored = docs.select(col(groupCol).as("__g"),
      col(idCol).cast("bigint").as("__id"),
      (-shuffleKey(col(idCol), seed)).cast("double").as("__s"))
    val kept = scored.groupBy(col("__g"))
      .agg(call_function("graft_topk", col("__s"), col("__id"), lit(k)).as("__top"))
      .select(col("__g"), explode(col("__top")).as("__c"))
      .select(col("__g"), col("__c.neighbor_id").as("__kid"))
    // <=> so a NULL group (a legal groupBy key, capped like any
    // other) keeps its winners instead of being equi-join-dropped
    docs.join(kept,
      col(groupCol) <=> col("__g") && col(idCol) === col("__kid"), "left_semi")
  }

  /** Deterministic train/val/test split assignment: each row gets
    * the first label whose cumulative fraction bound exceeds its
    * hash bucket — `Seq(("train",0.8),("val",0.1),("test",0.1))`
    * maps buckets [0,8000) / [8000,9000) / [9000,10000). Hash-based
    * like [[sampleBySource]]: the same row lands in the same split
    * on every run, engine and retry, and adding MORE data never
    * reassigns existing rows across splits (the property `rand()`
    * or row-number splits lack). Fractions must sum to 1 (±1e-9),
    * and — since buckets quantize to 1/10000 — each fraction must be
    * at least 0.0001 (a smaller one would silently round to an
    * empty split). A NULL id gets a NULL split (visible, filterable
    * — not silently dumped into the last label). Shuffle-free: one
    * codegen'd CASE over the bucket.
    */
  def assignSplits(
      docs: DataFrame, idCol: String,
      fractions: Seq[(String, Double)],
      splitCol: String = "split",
      bucketFn: Column => Column = defaultBucket): DataFrame = {
    require(fractions.nonEmpty, "at least one fraction")
    require(fractions.forall(f => math.round(f._2 * 10000) >= 1),
      "each fraction must be >= 0.0001 (bucket granularity is 1/10000; " +
        s"got ${fractions.filter(f => math.round(f._2 * 10000) < 1).map(_._1).mkString(",")})")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val bounds = fractions.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 10000)
    }.tail
    val bucket = bucketFn(col(idCol))
    val chain = fractions.map(_._1).zip(bounds).init
      .foldRight(lit(fractions.last._1): Column) {
        case ((label, bound), rest) => when(bucket < bound, label).otherwise(rest)
      }
    // when without otherwise: null bucket (null id) -> null split
    docs.withColumn(splitCol, when(bucket.isNotNull, chain))
  }

  /** Reference-corpus n-gram familiarity score — the CCNet/KenLM-
    * style "does this document look like the reference domain"
    * filter: score each doc by the average add-one-smoothed bigram
    * probability under a bigram model counted from `ref`.
    *
    *   score(doc) = avg_i P(w_i | w_{i-1}),
    *   P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)
    *
    * over the reference corpus (c = counts, V = reference vocabulary
    * size; c(w1) is the token's total unigram count). Deliberately
    * NOT log-space perplexity: ln() is libm-dependent and breaks
    * cross-engine bit-parity, while +,/ are IEEE-exact — and the
    * ranking direction is the same (higher = more familiar). The
    * per-doc sum is a LEFT FOLD over the position-sorted
    * probability array, so the floating addition order — and hence
    * every output bit — is identical on every run, partitioning,
    * and engine.
    *
    * Scale: both count tables are bounded by the REFERENCE
    * vocabulary (the in-domain sample — orders of magnitude smaller
    * than the corpus being scored) and broadcast; the corpus side is
    * one gram explode, two map-side joins, and one shuffle keyed on
    * doc id for the per-doc fold. Docs with fewer than 2 tokens get
    * (n_bigrams = 0, score = 0.0) — visible, filterable.
    */
  def lmFamiliarity(
      docs: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String): DataFrame = {
    val refGrams = ref
      .select(explode(TextFunctions.wordNgrams(col(refTextCol), 2)).as("__g"))
      .groupBy("__g").agg(count(lit(1)).as("__cb"))
    // materialized ONCE (localCheckpoint, blocks reclaimed when
    // unreferenced): both the vocab-size action and the broadcast
    // join below read it — without this the reference corpus would
    // be tokenized and aggregated twice
    val refToks = ref
      .select(explode(TextFunctions.tokens(col(refTextCol))).as("__w1"))
      .groupBy("__w1").agg(count(lit(1)).as("__cu"))
      .localCheckpoint()
    val vocabSize = refToks.count() // bounded: reference vocabulary
    require(vocabSize > 0,
      "reference corpus has no tokens — every smoothed probability " +
        "would divide by zero; pass a non-empty in-domain reference")
    val pairs = docs.select(col(idCol).cast("bigint").as("doc_id"),
      posexplode(TextFunctions.wordNgrams(col(textCol), 2)).as(Seq("pos", "__g")))
    val scored = pairs
      .join(broadcast(refGrams), Seq("__g"), "left")
      .withColumn("__w1", substring_index(col("__g"), " ", 1))
      .join(broadcast(refToks), Seq("__w1"), "left")
      .withColumn("__p",
        (coalesce(col("__cb"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("__cu"), lit(0L)) + lit(vocabSize)).cast("double"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("__p")))).as("__ps"))
      .select(col("doc_id"),
        size(col("__ps")).cast("bigint").as("n_bigrams"),
        (aggregate(col("__ps"), lit(0.0),
          (acc, x) => acc + x.getField("__p")) / size(col("__ps"))).as("score"))
    docs.select(col(idCol).cast("bigint").as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** Leakage-safe split assignment: near-duplicate documents must
    * land in the SAME split — a train/test pair of near-dups is
    * evaluation leakage, the canonical reason benchmark numbers
    * inflate. The split is therefore keyed on each doc's
    * duplicate-CLUSTER representative (its connected component over
    * the near-dup pair graph, min id of the cluster) instead of its
    * own id: every member of a cluster hashes the same bucket, so a
    * cluster is atomically train, val, or test. Docs absent from
    * `pairs` are their own representative. Same deterministic,
    * growth-stable hash-bucket election as [[assignSplits]] — adding
    * data never moves an existing cluster across splits.
    *
    * `pairs` is (id_a, id_b) from any pair detector
    * (minhash/simhash/ngram/embedding). Scale: component labels via
    * [[Dedup.duplicateComponents]] (O(log diameter) rounds, count-
    * only driver traffic), then one equi-join of the corpus against
    * the labels (≤ paired docs — broadcast when small, AQE decides).
    */
  def assignSplitsLeakageSafe(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      fractions: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    val comps = Dedup.duplicateComponents(pairs)
      .withColumnRenamed("id", "__cid")
    val withRep = docs
      .join(comps, col(idCol) === col("__cid"), "left")
      .withColumn("__rep", coalesce(col("component"), col(idCol).cast("bigint")))
      .drop("__cid", "component")
    assignSplits(withRep, "__rep", fractions, splitCol).drop("__rep")
  }

  /** Multiplicative hash of a numeric id into 0..9999 — exactly
    * replayable as integer SQL in any engine. The id is reduced mod
    * p BEFORE the multiply: (p-1) * (2654435761 mod p) ≈ 6.5e17
    * stays inside a 64-bit long, whereas multiplying a raw 100 TB-
    * scale id first would silently wrap in Spark and error in
    * engines that check BIGINT overflow — diverging mixtures at
    * exactly the id ranges this is for.
    */
  def defaultBucket(id: Column): Column =
    pmod(pmod(pmod(id.cast("bigint"), lit(1000000007L)) * lit(654435747L),
      lit(1000000007L)), lit(10000L))

  /** Seeded multiplicative shuffle key over a numeric id — full
    * 0..p-1 range (p = 1e9+7), same overflow-safe reduce-first shape
    * as [[defaultBucket]], replayable as integer SQL in any engine.
    *
    * The seed feeds the MULTIPLIER, not an addend: `(key + seed)
    * mod p` would merely rotate the ordering (every epoch nearly the
    * same permutation — a subtle but real training-order bug), while
    * a different multiplier yields a genuinely different linear
    * permutation. [[shuffleKeyConstants]] exposes the derived
    * (multiplier, addend) so an external engine can replay the
    * exact arithmetic.
    */
  def shuffleKey(id: Column, seed: Long): Column = {
    val (m, s) = shuffleKeyConstants(seed)
    pmod(pmod(id.cast("bigint"), lit(1000000007L)) * lit(m) + lit(s),
      lit(1000000007L))
  }

  /** (multiplier, addend) mod p for a seed; multiplier is never 0. */
  def shuffleKeyConstants(seed: Long): (Long, Long) = {
    val p = 1000000007L
    val s = ((seed % p) + p) % p
    val m = (654435747L + (s * 2654435761L) % p) % p // fits: < 1e9 * 2.66e9
    (if (m == 0L) 1L else m, s)
  }

  /** Deterministic global corpus shuffle — the training-order pass:
    * rows are totally ordered by (seeded hash key, id) and each gets
    * its global ordinal. Hash-based, so the SAME permutation on
    * every run, engine and retry (unlike `rand()`), and naturally
    * source-interleaving: consecutive output rows come from
    * unrelated input regions, which is exactly what a data loader
    * wants instead of file-order correlation.
    *
    * Scale: `repartitionByRange` + per-partition sort is Spark's
    * distributed total order (never one partition). The ordinal is
    * the rank in that total order — computed by the same two-phase
    * scan as [[packSequences]] (per-partition counts to the driver,
    * broadcast base offsets, partition-local carry), and well
    * defined regardless of where sampling places the range bounds
    * because (key, id) is unique per row.
    */
  def shuffleDeterministic(
      docs: DataFrame, idCol: String, seed: Long = 0L,
      keyCol: String = "shuffle_key", posCol: String = "shuffle_pos",
      partitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val keyed = docs.withColumn(keyCol, shuffleKey(col(idCol), seed))
    val ordCols = Seq(col(keyCol), col(idCol))
    val ranged =
      if (partitions > 0) keyed.repartitionByRange(partitions, ordCols: _*)
      else keyed.repartitionByRange(ordCols: _*)
    val sorted = ranged.sortWithinPartitions(ordCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        posCol, org.apache.spark.sql.types.LongType, nullable = false))
    // zipWithIndex = per-partition counts (one scalar each to the
    // driver) + partition-local carry — the classic two-phase rank
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** GPT-style sequence packing (concat-and-chunk): documents are
    * concatenated in `idCol` order and cut into fixed-`binSize`
    * token bins; each document reports its global start offset, its
    * bin, and its offset within the bin (documents may straddle a
    * boundary — exactly what concat-packing does in pretraining).
    *
    * Scale: this is a GLOBAL running sum. A window over a global
    * ORDER BY collapses to one partition — instead this runs the
    * classic two-phase distributed scan: range-partition by id, one
    * pass computes per-partition weight sums (only nPartitions longs
    * reach the driver), then each partition streams its rows adding
    * its broadcast base offset. The one legitimate `mapPartitions`
    * rung: a prefix scan's carry is inherently sequential WITHIN a
    * partition and embarrassingly parallel ACROSS them.
    *
    * The two passes re-read the sorted input. By DEFAULT nothing is
    * persisted (the sort simply runs twice — correct, never leaks);
    * pass a [[CacheScope]] to cache the sorted projection across the
    * passes and `release()` it after consuming the result. A
    * silently-pinned default cache would leak a corpus-sized block
    * per invocation in a long-lived session.
    */
  def packSequences(
      docs: DataFrame, idCol: String, weightCol: String,
      binSize: Long, partitions: Int = 0,
      scope: Option[CacheScope] = None): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val projected = docs.select(col(idCol).cast("bigint").as("id"),
      col(weightCol).cast("bigint").as("w"))
    val ranged =
      if (partitions > 0) projected.repartitionByRange(partitions, col("id"))
      else projected.repartitionByRange(col("id"))
    val sortedPlain = ranged.sortWithinPartitions("id")
    val sorted = scope.fold(sortedPlain)(_.cache(sortedPlain))
    val ds = sorted.as[(Long, Long)]
    val partSums = ds.rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val bc = spark.sparkContext.broadcast(offsets)
    ds.rdd.mapPartitionsWithIndex { case (i, it) =>
      var run = bc.value(i)
      it.map { case (id, w) =>
        val start = run
        run += w
        (id, w, start, start / binSize, start % binSize)
      }
    }.toDF("id", "w", "start_offset", "bin", "bin_offset")
  }
}
