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

  // --- pHash (DCT) — the brightness/contrast-robust variant ---------

  /** Tone-adjust a PNG through the real pixel stack: per-channel
    * `a * (c - 128) + 128 + b`, clamped, re-encoded — the
    * brightness/contrast edit pHash is built to survive.
    */
  private def toneShift(png: Array[Byte], a: Double, b: Double): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val out = new java.awt.image.BufferedImage(
      img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    def adj(c: Int): Int =
      math.max(0, math.min(255, math.round(a * (c - 128) + 128 + b).toInt))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      out.setRGB(x, y, (adj((rgb >> 16) & 0xff) << 16) |
        (adj((rgb >> 8) & 0xff) << 8) | adj(rgb & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  test("pHash survives brightness/contrast shifts within the radius; unrelated images stay far; sentinel holds") {
    val radius = 10
    val hams = (0L until 40L).map { id =>
      val orig = Multimodal.synthPngBlocks(id)
      val toned = toneShift(orig, a = 1.15, b = 25.0)
      java.lang.Long.bitCount(
        Multimodal.ImageIoCodec.pHash(orig) ^
          Multimodal.ImageIoCodec.pHash(toned))
    }
    assert(hams.max <= radius,
      s"tone-shifted copies must stay within $radius bits: ${hams.max}")
    // unrelated images: well-separated (the banding verify filter
    // keeps precision even if a rare pair dips near the radius)
    val hs = (0L until 300L).map(id =>
      Multimodal.ImageIoCodec.pHash(Multimodal.synthPngBlocks(id)))
    val cross = for (i <- hs.indices; j <- i + 1 until hs.size)
      yield java.lang.Long.bitCount(hs(i) ^ hs(j))
    assert(cross.min > radius, s"unrelated images collide: ${cross.min}")
    assert(Multimodal.ImageIoCodec.pHash(Array[Byte](9, 9)) === -1L)
    assert(Multimodal.ImageIoCodec.pHash(null) === -1L)
  }

  test("imagePHashPairs finds exactly the planted tone-shifted duplicates through the banded join") {
    val s = spark
    import s.implicits._
    val base = (0L until 80L).map(id => (id, Multimodal.synthPngBlocks(id)))
    val dups = (0L until 80L by 4L).map(id =>
      (id + 200000L, toneShift(Multimodal.synthPngBlocks(id), 1.2, 30.0)))
    val images = s.createDataFrame(base ++ dups).toDF("id", "payload")
    val hashes = Multimodal.withImagePHash(s, images, "id", "payload")
    val pairs = Dedup.imagePHashPairs(hashes, "id")
      .select("id_a", "id_b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val planted = (0L until 80L by 4L).map(i => i -> (i + 200000L)).toSet
    assert(pairs === planted,
      s"missing=${planted -- pairs} extra=${pairs -- planted}")
  }
}
