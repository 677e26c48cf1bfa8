package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("per-partition decode path agrees with the expression-based metadata") {
    val docs = Tables.documents(spark, sf)
    val withPayload = Multimodal.withPayloadMeta(docs, "doc_id", "text")

    val viaExpr = withPayload
      .select(col("doc_id").cast("long"), col("fmt"), col("width"), col("height"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap

    val viaPartitions = Multimodal.decodePartitioned(spark,
        withPayload.select(col("doc_id"), col("payload")), "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap

    assert(viaPartitions === viaExpr)
    assert(viaPartitions.nonEmpty)
  }

  test("feature extraction yields L1-normalized ANN-ready vectors") {
    val docs = Tables.documents(spark, sf).limit(50)
    val feats = Multimodal.extractFeaturesPartitioned(spark,
      Multimodal.withPayloadMeta(docs, "doc_id", "text"), "doc_id", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    assert(feats.nonEmpty)
    feats.foreach { case (id, v) =>
      assert(v.length === 16)
      val s = v.map(_.toDouble).sum
      assert(s >= 0.99 && s <= 1.01, s"doc $id L1 sum $s")
    }
    // deterministic: second run identical
    val again = Multimodal.extractFeaturesPartitioned(spark,
      Multimodal.withPayloadMeta(docs, "doc_id", "text"), "doc_id", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    feats.foreach { case (id, v) => assert(again(id) === v) }
  }

  test("resize bounds dimensions and shrinks payloads") {
    val docs = Tables.documents(spark, sf).limit(50)
    val withP = Multimodal.withPayloadMeta(docs, "doc_id", "text")
    val orig = withP.select("doc_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val resized = Multimodal.resizePartitioned(spark, withP, "doc_id",
      maxW = 128, maxH = 128).collect()
    resized.foreach { r =>
      val (id, bytes, w, h) = (r.getLong(0), r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3))
      assert(w <= 128 && h <= 128, s"doc $id resized to ${w}x$h")
      assert(bytes.length <= orig(id))
    }
  }

  test("frame sampling fans out one row per kept frame, no shuffle") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 20)
    val withP = Multimodal.withPayloadMeta(docs, "doc_id", "text")
    val frames = Multimodal.frameSamplePartitioned(spark, withP, "doc_id",
      frameSize = 100, every = 2)
    val nBytes = withP.select("doc_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val counts = frames.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.foreach { case (id, n) =>
      val total = math.ceil(nBytes(id) / 100.0).toLong
      assert(n === (total + 1) / 2, s"doc $id: $n frames of $total")
    }
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  // --- real javax.imageio codec over generated PNG/JPEG payloads ---

  private def genImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | 0x40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("ImageIoCodec decodes real PNG/JPEG bytes through the partitioned shell") {
    val s = spark
    import s.implicits._
    // doc 5: a valid PNG signature followed by garbage — matches the
    // PNG reader but THROWS during header parse; must degrade to the
    // sentinel, not fail the task
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      1, 2, 3, 4, 5, 6, 7, 8)
    val df = Seq(
      (1L, genImage(17, 9, "png")),
      (2L, genImage(64, 32, "jpg")),
      (3L, Array[Byte](1, 2, 3)), // not an image
      (4L, null.asInstanceOf[Array[Byte]]),
      (5L, corrupt))
      .toDF("doc_id", "payload").repartition(2)
    val out = Multimodal.decodePartitioned(s, df, "doc_id",
        codec = Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) === (("png", 17, 9)))
    assert(out(2L) === (("jpeg", 64, 32)))
    assert(out(3L) === (("unknown", -1, -1)))
    assert(out(4L) === (("unknown", -1, -1)))
    assert(out(5L) === (("unknown", -1, -1)))
    // corrupt payloads also flow through the pixel-decoding paths
    assert(Multimodal.ImageIoCodec.extractFeatures(corrupt, 8).toSeq
      === Seq.fill(8)(0.0f))
    assert(Multimodal.ImageIoCodec.resize(corrupt, 10, 10)._1.isEmpty)
  }

  test("ImageIoCodec.decodeFull is value-identical to decode + pixelSums composed") {
    // one reader-discovery + one pixel decode must produce exactly
    // what the two-pass composition did, on every payload class:
    // valid, truncated-after-header, garbage, empty/null
    val png = genImage(17, 9, "png")
    val payloads = Seq(png, png.take(40), Array[Byte](1, 2, 3),
      Array.emptyByteArray, null)
    payloads.foreach { bytes =>
      val (fmt, w, h) = Multimodal.ImageIoCodec.decode(bytes)
      val (sr, sg, sb) = Multimodal.ImageIoCodec.pixelSums(bytes)
      assert(Multimodal.ImageIoCodec.decodeFull(bytes) === ((fmt, w, h, sr, sg, sb)))
    }
    // and the valid payload really decodes (guards against a parity
    // test that passes because both sides degraded to the sentinel)
    assert(Multimodal.ImageIoCodec.decodeFull(png)._1 === "png")
    assert(Multimodal.ImageIoCodec.decodeFull(png)._4 >= 0L)
  }

  test("ImageIoCodec resize produces a real decodable PNG in the bounding box") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, genImage(200, 100, "png")), (2L, genImage(30, 20, "png")))
      .toDF("doc_id", "payload")
    val out = Multimodal.resizePartitioned(s, df, "doc_id",
        maxW = 50, maxH = 50, codec = Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3)))).toMap
    // 200x100 into 50x50: scale 4 -> 50x25; small image untouched in size
    assert((out(1L)._2, out(1L)._3) === ((50, 25)))
    assert((out(2L)._2, out(2L)._3) === ((30, 20)))
    // the resized payload is itself a valid PNG with those dimensions
    val redecoded = Multimodal.ImageIoCodec.decode(out(1L)._1)
    assert(redecoded === (("png", 50, 25)))
  }

  test("ImageIoCodec features: L1-normalized, deterministic, light vs dark separable") {
    val dim = 16
    val light = genImage(40, 40, "png") // gradient image
    val dark = {
      val img = new java.awt.image.BufferedImage(40, 40,
        java.awt.image.BufferedImage.TYPE_INT_RGB) // all black
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val f1 = Multimodal.ImageIoCodec.extractFeatures(light, dim)
    val f2 = Multimodal.ImageIoCodec.extractFeatures(light, dim)
    assert(f1.toSeq === f2.toSeq)
    assert(math.abs(f1.map(_.toDouble).sum - 1.0) < 1e-3)
    // all-black image has zero luminance everywhere -> zero-ish vector
    val fd = Multimodal.ImageIoCodec.extractFeatures(dark, dim)
    assert(fd.map(_.toDouble).sum < 1e-3)
  }

  test("decode runs distributed (no single-partition collapse)") {
    val docs = Tables.documents(spark, sf).repartition(4)
    val out = Multimodal.decodePartitioned(spark,
      Multimodal.withPayloadMeta(docs, "doc_id", "text")
        .select(col("doc_id"), col("payload")), "doc_id")
    assert(out.rdd.getNumPartitions === 4)
  }

  test("JavaSoundCodec decodes real WAV containers: meta and exact PCM features") {
    // mono 8k and stereo 16k — the real javax.sound stack, not header
    // arithmetic
    for (id <- Seq(0L, 1L, 7L, 63L)) {
      val wav = Multimodal.synthWavPcm16(id)
      val m = Multimodal.JavaSoundCodec.decodeMeta(wav)
      assert(m.fmt === "pcm_signed")
      assert(m.sampleRate === 8000 * (1 + id % 3))
      assert(m.channels === 1 + id % 2)
      assert(m.bitsPerSample === 16)
      assert(m.nFrames === 64 + id % 64)

      val (peak, sumAbs) = Multimodal.JavaSoundCodec.pcmFeatures(wav)
      // replay the synthesis arithmetic directly
      val samples = for {
        i <- 0 until (64 + id % 64).toInt
        ch <- 0 until (1 + id % 2).toInt
      } yield math.abs(((id * 31 + i * 7 + ch * 13) % 2003 - 1001).toInt)
      assert(peak === samples.max)
      assert(sumAbs === samples.map(_.toLong).sum)
    }
  }

  test("synthPng roundtrips through the real PNG stack with exact closed-form pixel sums") {
    for (id <- Seq(0L, 1L, 8L, 62L, 499L)) {
      val png = Multimodal.synthPng(id)
      // genuine PNG signature
      assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
      val (fmt, w, h) = Multimodal.ImageIoCodec.decode(png)
      assert(fmt === "png")
      assert(w === 8 + id % 9)
      assert(h === 8 + id % 7)
      // lossless roundtrip: decoded sums equal the synthesis arithmetic
      val (sr, sg, sb) = Multimodal.ImageIoCodec.pixelSums(png)
      val px = for (y <- 0 until h; x <- 0 until w) yield (
        (id * 7 + x * 3 + y * 5) % 256,
        (id * 11 + x * 13 + y * 2) % 256,
        (id * 3 + x + y * 17) % 256)
      assert(sr === px.map(_._1).sum)
      assert(sg === px.map(_._2).sum)
      assert(sb === px.map(_._3).sum)
    }
    // sentinel on garbage
    assert(Multimodal.ImageIoCodec.pixelSums(Array.fill[Byte](64)(7)) === ((-1L, -1L, -1L)))
  }

  test("store-mode PNG encoder decodes pixel-identical to the ImageIO encode it replaced") {
    import java.awt.image.BufferedImage
    for (id <- Seq(0L, 1L, 17L, 123L, 499L)) {
      // the OLD synthesis route: BufferedImage + ImageIO PNG writer
      val w = (8 + id % 9).toInt
      val h = (8 + id % 7).toInt
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val r = ((id * 7 + x * 3 + y * 5) % 256).toInt
        val g = ((id * 11 + x * 13 + y * 2) % 256).toInt
        val b = ((id * 3 + x + y * 17) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val oldDecoded = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      val newDecoded = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.synthPng(id)))
      assert(newDecoded.getWidth === oldDecoded.getWidth)
      assert(newDecoded.getHeight === oldDecoded.getHeight)
      for (y <- 0 until h; x <- 0 until w)
        assert((newDecoded.getRGB(x, y) & 0xffffff) ===
          (oldDecoded.getRGB(x, y) & 0xffffff), s"pixel ($x,$y) of id $id")
    }
  }

  test("corrupt or truncated audio degrades to the sentinel, never throws") {
    val garbage = Array.fill[Byte](100)(42)
    assert(Multimodal.JavaSoundCodec.decodeMeta(garbage).fmt === "unknown")
    assert(Multimodal.JavaSoundCodec.pcmFeatures(garbage) === ((0, 0L)))
    // a REAL header cut off mid-data: meta may parse, features must not blow up
    val truncated = Multimodal.synthWavPcm16(5L).take(50)
    Multimodal.JavaSoundCodec.decodeMeta(truncated)
    Multimodal.JavaSoundCodec.pcmFeatures(truncated)
    assert(Multimodal.JavaSoundCodec.decodeMeta(null).sampleRate === -1)
    assert(Multimodal.JavaSoundCodec.pcmFeatures(Array.emptyByteArray) === ((0, 0L)))
  }

  test("AviMjpegCodec demuxes a real RIFF container and decodes real JPEG frames") {
    for (id <- Seq(0L, 3L, 7L, 11L)) {
      val avi = Multimodal.synthAviMjpeg(id)
      val expFrames = (3 + id % 5).toInt
      val expW = (16 + (id % 4) * 8).toInt
      val expH = (16 + (id % 3) * 8).toInt

      // header-only metadata from the strf BITMAPINFOHEADER
      assert(Multimodal.AviMjpegCodec.decode(avi) === (("mjpeg", expW, expH)))

      // full demux: every frame is a REAL decodable JPEG at the
      // declared dimensions
      val frames = Multimodal.AviMjpegCodec.demuxFrames(avi)
      assert(frames.length === expFrames)
      frames.foreach { f =>
        assert(Multimodal.ImageIoCodec.decode(f) === (("jpeg", expW, expH)))
      }

      // sampling keeps every 2nd
      assert(Multimodal.AviMjpegCodec.frameSample(avi, 0, 2).length ===
        (expFrames + 1) / 2)

      // poster-frame features are the first frame's features
      val pf = Multimodal.AviMjpegCodec.extractFeatures(avi, 16)
      assert(pf.toSeq === Multimodal.ImageIoCodec.extractFeatures(frames.head, 16).toSeq)
    }
  }

  test("AVI with an audio stream listed first: decode still finds the VIDEO strf") {
    import java.nio.{ByteBuffer, ByteOrder}
    def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(cc.getBytes("US-ASCII")); bb.putInt(payload.length); bb.put(payload)
      bb.array()
    }
    def list(t: String, cs: Array[Byte]*): Array[Byte] =
      chunk("LIST", t.getBytes("US-ASCII") ++ cs.flatten)
    def strh(fcc: String) = chunk("strh",
      fcc.getBytes("US-ASCII") ++ new Array[Byte](52))
    // audio strf = WAVEFORMATEX-ish bytes that would misparse as dims
    val audioStrf = chunk("strf", Array.fill[Byte](16)(9))
    val videoStrf = chunk("strf", {
      val bb = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40); bb.putInt(320); bb.putInt(240)
      bb.array()
    })
    val hdrl = list("hdrl",
      list("strl", strh("auds"), audioStrf),
      list("strl", strh("vids"), videoStrf))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ list("movi")
    val bb = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(body.length); bb.put(body)
    assert(Multimodal.AviMjpegCodec.decode(bb.array()) === (("mjpeg", 320, 240)))
  }

  test("corrupt or truncated AVI degrades to empty/sentinel, never throws") {
    val garbage = Array.fill[Byte](64)(7)
    assert(Multimodal.AviMjpegCodec.demuxFrames(garbage).isEmpty)
    assert(Multimodal.AviMjpegCodec.decode(garbage) === (("unknown", -1, -1)))
    assert(Multimodal.AviMjpegCodec.demuxFrames(null) === Seq.empty)
    // real container cut mid-movi: the walk stops at the truncation
    val truncated = Multimodal.synthAviMjpeg(3L).dropRight(400)
    val frames = Multimodal.AviMjpegCodec.demuxFrames(truncated)
    assert(frames.length < 6)
    frames.foreach(f => Multimodal.ImageIoCodec.decode(f)) // decodable or sentinel

    // a final ODD-sized chunk with its pad byte missing (real AVIs
    // omit the trailing pad): frames walked so far must SURVIVE, not
    // be discarded by an out-of-bounds advance
    val base = Multimodal.synthAviMjpeg(4L) // 7 frames
    val odd = Array.concat(base,
      "frm0".getBytes("US-ASCII"),
      Array[Byte](3, 0, 0, 0), // declared size 3, odd
      Array[Byte](1, 2, 3))    // payload, NO pad byte
    // patch the RIFF size to cover the appended chunk
    val bb = java.nio.ByteBuffer.wrap(odd).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, odd.length - 8)
    assert(Multimodal.AviMjpegCodec.demuxFrames(odd).length === 7)
  }

  test("audio decode runs through the partitioned shell, distributed") {
    val docs = Tables.documents(spark, sf).repartition(4)
    val out = Multimodal.decodeAudioPartitioned(spark,
      Multimodal.withAudioPayload(spark, docs, "doc_id"), "id")
    assert(out.rdd.getNumPartitions === 4)
    val row = out.filter(col("id") === 1L).collect().head
    assert(row.getString(1) === "pcm_signed")
    assert(row.getInt(2) === 16000)
    assert(row.getInt(3) === 2)
  }

  test("cross-modality pipeline: real images -> features -> embedding near-dup finds re-encodes") {
    // The integration claim: the multimodal decode shell feeds the
    // similarity stack directly — near-duplicate IMAGE detection is
    // image features (javax.imageio, partition-local) into the same
    // banded-LSH near-dup operator the text/embedding path uses. A
    // JPEG re-encode of a PNG is the classic web near-dup: pixels
    // perturbed by lossy coding, features close but not equal.
    val s = spark
    import s.implicits._

    def blockImage(id: Int, format: String): Array[Byte] = {
      // 8x8 block pattern from an id-seeded generator: distinct ids
      // give uncorrelated on/off grids (cosine ~0.5), a re-encode
      // keeps the grid (cosine ~1)
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rnd = new java.util.Random(id * 7919L)
      val bits = Array.fill(8, 8)(rnd.nextBoolean())
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = if (bits(y / 8)(x / 8)) 230 else 20
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, bos)
      bos.toByteArray
    }

    val images = ((0 until 20).map(i => (i.toLong, blockImage(i, "png"))) ++
      // ids 100+i are JPEG re-encodes of ids i < 5 -> planted near-dups
      (0 until 5).map(i => (100L + i, blockImage(i, "jpg"))))
      .toDF("img_id", "payload").repartition(3)

    val feats = Multimodal.extractFeaturesPartitioned(
      s, images, "img_id", dim = 64, codec = Multimodal.ImageIoCodec)
    val pairs = Dedup.embeddingNearDup(
        feats, "id", "features", threshold = 0.95)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 5).map(i => (i.toLong, 100L + i)).toSet
    assert(expected.subsetOf(pairs), s"missed re-encodes: ${expected -- pairs}")
    // no unrelated pair: everything found involves a planted re-encode
    assert(pairs.forall { case (a, b) => (b - a) == 100L },
      s"unrelated images paired: ${pairs.filterNot { case (a, b) => b - a == 100L }}")
  }
}
