package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
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

  /** TF-IDF with the standard smoothed idf:
    * idf = ln((N + 1) / (df + 1)) + 1. N is passed in (the caller
    * usually knows it; recomputing would add a scan).
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String, numDocs: Long): DataFrame =
    termStats(docs, idCol, textCol)
      .withColumn("tfidf",
        col("tf") * (log((lit(numDocs + 1).cast("double")) / (col("df") + 1)) + 1))

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
}
