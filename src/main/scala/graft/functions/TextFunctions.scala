package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines. Everything is Catalyst expression work (no Scala
  * UDFs): array/structural helpers compose `functions._`, while the
  * per-document counting surface (token/stopword/punct/digit) runs
  * through [[graft.plans.TextStats]] — a single-pass codegen'd
  * expression that whole-stage CSE evaluates once per row no matter
  * how many derived columns reference it. No shuffle anywhere.
  */
object TextFunctions {

  /** All counting stats for a document in one pass: struct with
    * n_chars, n_tokens, n_hits (tokens in `words`), n_punct,
    * n_digit.
    *
    * Registers graft's functions on the ACTIVE session (idempotent)
    * so compositions work on any DataFrame whose session is current
    * at call time — not only frames read via [[graft.Tables]] or
    * sessions built with GraftExtensions. Columns don't carry a
    * session, so a frame from a session that is neither active nor
    * otherwise registered still needs
    * [[graft.plans.GraftFunctions.register]] first.
    */
  def textStats(text: Column, words: Seq[String] = Nil): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftFunctions.register)
    call_function("graft_text_stats", text, lit(words.toArray))
  }

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Whitespace token count. (Computed from the stopword-list stats
    * struct — the word list doesn't affect this field, and using the
    * SAME expression everywhere lets codegen CSE run the text scan
    * once per row across tokenCount/stopwordRatio/punctRatio/
    * qualityScore.)
    */
  def tokenCount(text: Column): Column =
    textStats(text, enStopwords).getField("n_tokens")

  /** Cheap BPE-style subword-count estimate (~4 chars/token, the
    * published GPT-family rule of thumb), as a codegen'd expression.
    */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text).cast("double") / lit(4.0)).cast("bigint")

  /** Word n-grams (default 3) of the whitespace tokens, each n-gram a
    * space-joined string. Documents shorter than n yield an empty
    * array. Runs as the single codegen'd
    * [[graft.plans.WordNgrams]] expression — the equivalent
    * transform/sequence/slice/concat_ws composition evaluates three
    * interpreted lambdas per gram and dominated corpus-wide gram
    * explodes (see the expression's doc).
    */
  def wordNgrams(text: Column, n: Int = 3): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftFunctions.register)
    call_function("graft_word_ngrams", text, lit(n))
  }

  /** Count of tokens that appear in `words`. */
  def wordListHits(text: Column, words: Seq[String]): Column =
    textStats(text, words).getField("n_hits")

  val enStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this")

  /** Stopword ratio: stopword tokens / all tokens (0 for empty docs). */
  def stopwordRatio(text: Column): Column = {
    val st = textStats(text, enStopwords)
    val n = st.getField("n_tokens")
    when(n === 0, lit(0.0))
      .otherwise(st.getField("n_hits").cast("double") / n.cast("double"))
  }

  private def statRatio(text: Column, field: String): Column = {
    val st = textStats(text, enStopwords)
    when(st.getField("n_chars") === 0, lit(0.0)).otherwise(
      st.getField(field).cast("double") / st.getField("n_chars").cast("double"))
  }

  def punctRatio(text: Column): Column = statRatio(text, "n_punct")
  def digitRatio(text: Column): Column = statRatio(text, "n_digit")

  /** Ratio of chars in `charsRegex` (a character class body) — the
    * generic regexp fallback for classes TextStats doesn't count.
    */
  def charClassRatio(text: Column, charsRegex: String): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, s"[$charsRegex]", "")))
        .cast("double") / length(text).cast("double"))

  def upperRatio(text: Column): Column = charClassRatio(text, "A-Z")

  /** Mean token length in characters (0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(
      aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)).cast("double")
        / n.cast("double"))
  }

  /** Canonical form for exact/near dedup — the C4/FineWeb-style
    * normalization pass: lowercase, strip punctuation (keep letters,
    * digits and whitespace, unicode-aware), collapse whitespace
    * runs, trim. Two documents differing only in case, punctuation
    * or spacing normalize identically; pair with
    * [[graft.operators.Dedup.exactByHash]] (hash the normalized
    * column) for canonical exact dedup. Pure codegen'd regexp work —
    * shuffle-free, linear.
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]+", " "),
      "\\s+", " "))

  /** Composite document quality score in [0,1]: rewards stopword
    * presence and healthy token length; penalizes punctuation/digit
    * noise. Weights follow the C4/Gopher-style published heuristics.
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(tokenCount(text).between(10, 100000), lit(1.0)).otherwise(lit(0.0))
    val sw = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    val noise = greatest(lit(0.0), lit(1.0) - (punctRatio(text) + digitRatio(text)) * lit(2.0))
    (lenOk * lit(0.4) + sw * lit(0.3) + noise * lit(0.3))
  }

  /** Marker-stopword language scores. Returns the best language by
    * hit count with deterministic preference order (earlier in
    * `markers` wins ties); "und" when nothing matches.
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que"),
    "es" -> Seq("el", "los", "las", "es", "una", "para", "como", "pero"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  def langScores(text: Column): Column =
    struct(markers.map { case (lang, ws) => wordListHits(text, ws).as(s"s_$lang") }: _*)

  def langId(text: Column): Column = {
    // array_max over (score, -priority, lang) structs: highest score
    // wins, ties broken toward earlier (higher-priority) languages.
    val scored = array(markers.zipWithIndex.map { case ((lang, ws), i) =>
      struct(
        wordListHits(text, ws).as("score"),
        lit(-i).as("prio"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_max(scored)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** HTML → text boilerplate strip (the C4-style extraction pass a
    * web-crawl pipeline runs before any quality/dedup stage):
    * script/style blocks dropped wholesale, tags replaced by spaces,
    * the six ubiquitous named entities decoded (ordered so `&amp;`
    * unescapes LAST — decoding it first would double-unescape
    * `&amp;lt;`), whitespace collapsed. Pure codegen'd
    * regexp/replace chain — shuffle-free, linear, engine-replayable
    * (patterns avoid backreferences, which RE2 engines reject).
    */
  /** Unicode NFC canonical composition ([[graft.plans.NfcNormalize]])
    * — run BEFORE any hash-equality dedup: combining-character
    * variants ("Café" as e+U+0301 vs precomposed U+00E9) are
    * byte-different, render identically, and silently survive every
    * exact-dedup pass. Codegen'd; DuckDB replays via
    * `nfc_normalize`.
    */
  def nfcNormalize(text: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftFunctions.register)
    call_function("graft_nfc", text)
  }

  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(html, "(?is)<script[^>]*>.*?</script\\s*>", " "),
      "(?is)<style[^>]*>.*?</style\\s*>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Host part of a URL (lowercased; empty string when the input
    * isn't URL-shaped — same no-match semantics in Spark and RE2
    * engines). Userinfo and port are stripped.
    */
  def urlHost(url: Column): Column =
    regexp_extract(lower(trim(url)),
      "^[a-z][a-z0-9+.-]*://(?:[^@/]*@)?([^/?#:]+)", 1)

  /** Host with a leading `www.` removed — the key for domain-level
    * blocklists and per-domain sampling caps. (Public-suffix-aware
    * registrable domains need a suffix table; this is the standard
    * cheap approximation.)
    */
  def urlDomain(url: Column): Column =
    regexp_replace(urlHost(url), "^www\\.", "")

  /** Canonical URL form for exact-URL dedup (the FineWeb/CCNet first
    * pass — the same page crawled as `HTTP://WWW.X.com/a/?utm_…` and
    * `http://x.com/a` must collide BEFORE any text-level dedup runs):
    *
    *  1. fragment dropped (`#…` never reaches the server);
    *  2. scheme and host lowercased (RFC 3986: both case-insensitive;
    *     path/query case is preserved — they are not);
    *  3. userinfo (`user:pass@`) dropped — it never names a distinct
    *     public resource in crawl data, and leaving it in place would
    *     shield the host from the normalizations below;
    *  4. leading `www.` and the scheme's default port (`:80`/`:443`)
    *     stripped from the host;
    *  5. tracking parameters removed (`utm_*`, `fbclid`, `gclid`,
    *     `msclkid`, ANY key case — `(?i)` inline flag, RE2-safe),
    *     with separator repair and trailing `?`/`&` cleanup;
    *  6. trailing slashes stripped from the path.
    *
    * Pure codegen'd regexp chain — shuffle-free, linear, and every
    * pattern avoids backreferences so RE2 engines (the DuckDB
    * oracle) replay it byte-identically. Non-URL-shaped input has no
    * scheme/host match and passes through steps 4-5 only — still
    * deterministic, never an error.
    */
  def canonicalizeUrl(url: Column): Column = {
    val schemeRe = "^[A-Za-z][A-Za-z0-9+.-]*://"
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, schemeRe, 0))
    val rest = regexp_replace(noFrag, schemeRe, "")
    // authority = everything before /?#; userinfo ('...@') stripped
    // BEFORE host normalization — otherwise 'user@www.x.com' keeps
    // its www. and default port (the authority regex would treat the
    // whole of it as host)
    val authority = regexp_extract(rest, "^[^/?#]*", 0)
    val hostPort = regexp_replace(
      lower(regexp_replace(authority, "^[^@]*@", "")), "^www\\.", "")
    val host = when(scheme === "http://", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https://", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathq = regexp_replace(rest, "^[^/?#]*", "")
    val path = regexp_replace(regexp_extract(pathq, "^[^?]*", 0), "/+$", "")
    val trackers = "(?i:utm_[^=&#]*|fbclid|gclid|msclkid)"
    val query = regexp_replace(
      regexp_replace(
        regexp_replace(regexp_replace(pathq, "^[^?]*", ""),
          s"&($trackers)=[^&#]*", ""),
        s"\\?($trackers)=[^&#]*&?", "?"),
      "[?&]+$", "")
    concat(scheme, host, path, query)
  }

  /** Deterministic rolling polynomial fingerprint over the document's
    * characters: h = (h*31 + code(c)) mod 1e9+7. Reproducible in any
    * engine (incl. the DuckDB oracle) — unlike murmur/xxhash.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + ascii(ch).cast("long"), lit(1000000007L)))
}
