package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k — the correctness
  *    baseline. Queries are broadcast against the corpus, so the
  *    corpus (the 100 TB side) is never shuffled; per-partition
  *    top-k candidates are cut down before the final shuffle.
  *  - `lshTopK`: random-hyperplane LSH bucketing — the scale path.
  *    Vectors only compare within their signature bucket.
  *
  * All arithmetic is `functions._` expression work (zip_with +
  * aggregate) in double precision with a fixed left-to-right
  * summation order, so results are deterministic and reproducible by
  * the oracle.
  */
object Similarity {

  /** Sequential-order dot product of two float vectors, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** id/vec/norm projection reused by every similarity operator. */
  def withNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      l2Norm(col(vecCol)).as("norm"))

  def cosineFromParts(vecA: Column, vecB: Column, normA: Column, normB: Column): Column =
    dot(vecA, vecB) / (normA * normB)

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param queries  small set of query vectors (broadcast side)
    * @param corpus   the full corpus (never broadcast, never sorted
    *                 globally: rank is a per-query window over the
    *                 candidate set)
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = withNorm(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))
    val c = withNorm(corpus, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("vec").as("cvec"), col("norm").as("cnorm"))
    val joined = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("cosine",
        cosineFromParts(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for plane p,
    * dimension d: a value in [-1, 1) derived from xxhash64 (no RNG
    * state — reproducible across executors and runs).
    */
  private def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(2000001L)).cast("double") / lit(1000000.0)) - lit(1.0)

  /** Random-hyperplane signature: bit p = sign(v . plane_p). */
  def lshSignature(vec: Column, numPlanes: Int): Column =
    (0 until numPlanes).map { p =>
      val proj = aggregate(
        transform(vec, (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Approximate top-k: exact cosine ranking but only within each
    * hyperplane-signature bucket. At 100 TB the bucket join replaces
    * the full cross product; recall is tuned with `numPlanes`
    * (fewer planes -> bigger buckets -> higher recall).
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      numPlanes: Int = 8): DataFrame = {
    val q = withNorm(queries, idCol, vecCol)
      .withColumn("sig", lshSignature(col("vec"), numPlanes))
      .select(col("id").as("query_id"), col("vec").as("qvec"),
        col("norm").as("qnorm"), col("sig"))
    val c = withNorm(corpus, idCol, vecCol)
      .withColumn("sig", lshSignature(col("vec"), numPlanes))
      .select(col("id").as("neighbor_id"), col("vec").as("cvec"),
        col("norm").as("cnorm"), col("sig"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        cosineFromParts(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }
}
