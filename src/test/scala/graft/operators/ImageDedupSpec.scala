package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual image dedup ([[Multimodal.ImageIoCodec.dHash]] +
  * [[Dedup.imageDHashPairs]]): raw-image near-duplicate detection
  * before any embedding model exists — difference hashes over a real
  * decode, banded-Hamming pairing, robust to resize + re-encode.
  */
class ImageDedupSpec extends SparkSpec {

  /** The closed-form dHash of [[Multimodal.synthPngBlocks]]'s block
    * grid — the same arithmetic the DuckDB oracle replays.
    */
  private def expectedDHash(id: Long): Long = {
    def v(cx: Long, cy: Long): Long = {
      val k = id * 7919L + cx * 104729L + cy * 1299709L
      var m = k * 2654435761L % 4294967296L
      m ^= m >>> 16
      m = m * 40503L % 4294967296L
      m ^= m >>> 10
      m % 256L
    }
    var h = 0L
    for (cy <- 0L until 7L; cx <- 0L until 8L)
      if (v(cx + 1, cy) > v(cx, cy)) h |= 1L << (cy * 8 + cx)
    h
  }

  test("dHash of a block PNG equals the closed form through the real decode stack") {
    (0L until 40L).foreach { id =>
      val got = Multimodal.ImageIoCodec.dHash(Multimodal.synthPngBlocks(id))
      assert(got === expectedDHash(id), s"id=$id")
    }
    // undecodable payloads hit the sentinel
    assert(Multimodal.ImageIoCodec.dHash(Array[Byte](1, 2, 3)) === -1L)
    assert(Multimodal.ImageIoCodec.dHash(null) === -1L)
  }

  test("a resized, re-encoded copy stays within the Hamming radius; unrelated images do not") {
    val hams = (0L until 60L).map { id =>
      val orig = Multimodal.synthPngBlocks(id)
      val resized = Multimodal.ImageIoCodec.resize(orig, 36, 28)._1
      java.lang.Long.bitCount(
        Multimodal.ImageIoCodec.dHash(orig) ^
          Multimodal.ImageIoCodec.dHash(resized))
    }
    assert(hams.max <= 4, s"resized copies must stay near: ${hams.max}")
    // unrelated pairs sit far apart (the avalanched block values —
    // linear/quadratic forms left some id pairs a near-constant
    // shift apart, within the pairing radius)
    val hs = (0L until 500L).map(expectedDHash)
    val cross = for (i <- hs.indices; j <- i + 1 until hs.size)
      yield java.lang.Long.bitCount(hs(i) ^ hs(j))
    assert(cross.min > 4, s"unrelated images must not collide: ${cross.min}")
  }

  test("imageDHashPairs finds exactly the planted resized duplicates, banded (never all-pairs)") {
    val s = spark
    import s.implicits._
    val ids = (0L until 100L).toDF("doc_id")
    val orig = Multimodal.withBlockImagePayload(s, ids, "doc_id")
    val dups = Multimodal.withBlockImagePayload(s,
      ids.filter(col("doc_id") % 5 === 0), "doc_id",
      idOffset = 100000L, resizeTo = Some((36, 28)))
    val hashes = Multimodal.withImageDHash(s, orig.unionByName(dups),
      "id", "payload")
    val pairs = Dedup.imageDHashPairs(hashes, "id")
      .select("id_a", "id_b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val planted = (0L until 100L by 5L).map(i => i -> (i + 100000L)).toSet
    assert(pairs === planted, s"missing=${planted -- pairs} extra=${pairs -- planted}")
    // undecodable rows never fabricate pairs (sentinels collide only
    // with each other and are dropped)
    val withBroken = hashes.unionByName(
      Seq((900001L, -1L), (900002L, -1L)).toDF("id", "dhash"))
    val pairs2 = Dedup.imageDHashPairs(withBroken, "id")
      .filter(col("id_a") >= 900000L || col("id_b") >= 900000L).count()
    assert(pairs2 === 0L, "sentinel hashes must not pair")
  }
}
