package graft.streaming

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.{Dedup, Expectations}
import org.apache.spark.sql.functions._

/** End-to-end LLM training-data pipeline through the streaming
  * engine — the web-crawl analog of PosPipelineSpec: raw HTML pages
  * stream in, silver extracts text (stripHtml) + domain + quality
  * signals with a Drop expectation, gold deduplicates on normalized
  * text ACROSS micro-batches and restarts (checkpointed
  * dropDuplicates state), and the persisted event log accounts for
  * every row. This is the integration claim for the r6 operators:
  * they compose into the DLT-style pipeline, not just standalone
  * queries.
  */
class CrawlPipelineSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_crawl").toString

  test("crawl pipeline: html -> clean+quality gate -> cross-batch dedup gold") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val drop = s"$root/drop"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(drop))

    def page(body: String) =
      s"<html><head><script>x=1</script></head><body><p>$body</p></body></html>"
    val goodA = "the quick brown fox jumps over the lazy dog and runs far away home"
    val goodB = "a completely different sentence about spark pipelines and the data they carry"
    val junk = "!!! ??? ;;; 123 456" // < 10 tokens, no stopwords -> score 0

    Seq(
      (1L, "https://www.siteA.com/x", page(goodA)),
      (2L, "https://siteB.org/y", page(goodB)),
      (3L, "https://mirror.net/copy", page(goodA)), // exact dup of 1
      (4L, "https://spam.biz/z", page(junk))        // fails the quality gate
    ).toDF("doc_id", "url", "html")
      .coalesce(1).write.mode("append").parquet(drop)

    val schema = s.read.parquet(drop).schema
    def build() = {
      val p = new StreamingPipeline(s, s"$root/pipe")
      p.source("bronze")(s.readStream.schema(schema).parquet(drop))
      p.tableWithExpectations("silver", Seq("bronze"), Seq(
        // rules see the BUILT table's columns (post-projection)
        Expectations.ruleOrDrop("quality_floor",
          TextFunctions.qualityScore(col("text")) >= 0.4)))(t =>
        t("bronze").select(
          col("doc_id"),
          TextFunctions.urlDomain(col("url")).as("domain"),
          TextFunctions.stripHtml(col("html")).as("text"),
          TextFunctions.tokenCount(TextFunctions.stripHtml(col("html"))).as("n_tokens")))
      p.table("gold", "silver")(t =>
        t("silver")
          .withColumn("__h", xxhash64(Dedup.normalize(col("text"))))
          .dropDuplicates("__h")
          .drop("__h"))
      p
    }

    build().runOnce()
    val gold1 = s.read.parquet(s"$root/pipe/gold/data")
      .select("doc_id", "domain", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // dup 3 collapsed, junk 4 dropped, html stripped, domain parsed
    assert(gold1.map(_._1).toSet === Set(1L, 2L))
    assert(gold1.find(_._1 == 1L).get._2 === "sitea.com")
    assert(gold1.find(_._1 == 1L).get._3 === goodA)

    // event log: silver saw 4 rows, dropped exactly the junk one
    val silverLog = build().eventLog
      .filter(col("table_name") === "silver")
      .select(explode(col("expectations")).as("e"), col("rows_in"), col("rows_out"))
      .select(col("e.rule"), col("e.failed"), col("rows_in"), col("rows_out"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(silverLog.toSeq === Seq(("quality_floor", 1L, 4L, 3L)))

    // second drop AFTER a pipeline restart: a cross-run duplicate of
    // doc 1 must be suppressed by the CHECKPOINTED dedup state; the
    // genuinely new page must land
    Seq(
      (6L, "https://again.com/copy2", page(goodA)),  // dup of run-1 doc
      (7L, "https://fresh.io/new", page(goodB + " with extra new words appended here"))
    ).toDF("doc_id", "url", "html")
      .coalesce(1).write.mode("append").parquet(drop)

    build().runOnce()
    val gold2 = s.read.parquet(s"$root/pipe/gold/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gold2 === Set(1L, 2L, 7L),
      s"cross-run dedup state lost or new row missing: $gold2")
  }
}
