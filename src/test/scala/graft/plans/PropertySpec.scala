package graft.plans

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (ScalaCheck) for the pure compute kernels behind
  * the codegen expressions — the places where a subtle bit/edge bug
  * would pass example tests and corrupt results at scale.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  test("bloom: inserted keys are ALWAYS contained, whatever the sizing") {
    val gen = for {
      bitsLog <- Gen.choose(6, 14)
      k <- Gen.choose(1, 16)
      keys <- Gen.listOfN(100, Gen.long)
    } yield (bitsLog, k, keys)
    check(Prop.forAll(gen) { case (bitsLog, k, keys) =>
      val words = new Array[Long]((1 << bitsLog) / 64)
      keys.foreach(BloomFilterOps.setBits(words, k, _))
      keys.forall(BloomFilterOps.contains(words, k, _))
    }, "bloom no-false-negatives")
  }

  test("word n-grams: equals the sliding-window reference on arbitrary text") {
    // the reference replays SPARK's composition semantics —
    // split(trim(lower(text)), '\s+') — NOT the Java conveniences:
    // trim strips only ' ' (Java String.trim strips all <= U+0020)
    // and split keeps trailing empty tokens (Spark split runs with
    // limit -1); GraftExtensionsSpec pins the same against the
    // actual Spark engine
    def ref(text: String, n: Int): Seq[String] = {
      val lowered = text.toLowerCase()
      val trimmed = lowered
        .replaceAll("^ +", "").replaceAll(" +$", "")
      val toks = trimmed.split("\\s+", -1).toSeq
      if (toks.length < n) Nil else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    val gen = for {
      n <- Gen.choose(1, 5)
      words <- Gen.listOf(Gen.oneOf(
        Gen.alphaNumStr.map(_.take(8)), Gen.const("  "), Gen.const("\tx\n"),
        Gen.const("héllo"), Gen.const("世界")))
    } yield (words.mkString(" "), n)
    check(Prop.forAll(gen) { case (text, n) =>
      val got = WordNgrams.compute(text, n).array.toSeq
        .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
      got == ref(text, n)
    }, "wordNgrams == reference")
  }

  test("shuffle key: always in [0, p); same seed same key; different seed different permutation") {
    val p = 1000000007L
    check(Prop.forAll(Gen.long, Gen.long) { (id, seed) =>
      val (m, a) = graft.operators.TextOps.shuffleKeyConstants(seed)
      val idm = ((id % p) + p) % p
      val key = (idm * m + a) % p
      m > 0 && m < p && key >= 0 && key < p
    }, "shuffleKey range")
    // distinct (m, a) constants give DISTINCT key functions — a
    // deterministic fact: two affine maps mod p agree on at most one
    // point, so they must differ on {0, 1}. (The stronger "any two
    // seeds reorder a 50-element sample" is NOT a theorem — rare
    // multiplier pairs sort a small prefix identically, and ScalaCheck
    // found such a pair — so the sample-order claim is pinned by the
    // fixed example below, not quantified over all seeds.)
    check(Prop.forAll(Gen.choose(0L, 1L << 40), Gen.choose(0L, 1L << 40)) { (s1, s2) =>
      val (m1, a1) = graft.operators.TextOps.shuffleKeyConstants(s1)
      val (m2, a2) = graft.operators.TextOps.shuffleKeyConstants(s2)
      ((m1, a1)) == ((m2, a2)) ||
        (0L to 1L).exists(i => (i * m1 + a1) % p != (i * m2 + a2) % p)
    }, "distinct constants are distinct key functions")
    // fixed-example reorder: two specific seeds produce genuinely
    // different 50-element orders (the property users care about)
    locally {
      val (m1, a1) = graft.operators.TextOps.shuffleKeyConstants(42L)
      val (m2, a2) = graft.operators.TextOps.shuffleKeyConstants(43L)
      def order(m: Long, a: Long) =
        (0L until 50L).sortBy(i => (i * m + a) % p)
      assert(order(m1, a1) != order(m2, a2))
    }
  }

  test("misra-gries merge math: decrement-by-(k+1)th-largest preserves non-negativity and bound") {
    val gen = for {
      k <- Gen.choose(1, 20)
      items <- Gen.listOfN(500, Gen.choose(0, 40).map(i => s"w$i"))
    } yield (k, items)
    check(Prop.forAll(gen) { case (k, items) =>
      // reference MG over the stream, then check invariants the
      // aggregate's buffers rely on
      val buf = scala.collection.mutable.HashMap.empty[String, Long]
      items.foreach { it =>
        if (buf.contains(it)) buf(it) += 1
        else if (buf.size < k) buf(it) = 1
        else {
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.filterInPlace((_, c) => c > 0)
        }
      }
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
      val n = items.size.toLong
      val heavy = exact.filter(_._2 > n / (k + 1)).keys
      buf.size <= k &&
        buf.values.forall(_ > 0) &&
        heavy.forall(buf.contains) && // the guarantee itself
        buf.forall { case (it, c) => c <= exact.getOrElse(it, 0L) } // lower bound
    }, "MG invariants")
  }

  test("nearest-centroids kernel: equals the sort-based reference selection on arbitrary inputs") {
    // the bounded top-nProbe insertion in NearestCentroids.compute is
    // the one hand-rolled selection loop in the vector family — the
    // semantic dedup + IVF paths both key cell assignment off it, so
    // an off-by-one in the insertion order silently reassigns cells
    val gen = for {
      dim <- Gen.choose(1, 16)
      nc <- Gen.choose(1, 12)
      nProbe <- Gen.choose(1, 12)
      vec <- Gen.listOfN(dim, Gen.choose(-4.0f, 4.0f))
      cents <- Gen.listOfN(nc, Gen.listOfN(dim, Gen.choose(-4.0f, 4.0f)))
      zeroIdx <- Gen.option(Gen.choose(0, nc - 1)) // sometimes a zero centroid
    } yield (vec.toArray, cents.map(_.toArray).toArray, nProbe, zeroIdx)
    check(Prop.forAll(gen) { case (vec, cents0, nProbe, zeroIdx) =>
      val cents = cents0.clone()
      zeroIdx.foreach(i => cents(i) = Array.fill(cents(i).length)(0.0f))
      val invNorms = cents.map { c =>
        val n = math.sqrt(c.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
        if (n == 0.0) 0.0 else 1.0 / n
      }
      val got = NearestCentroids.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(vec),
        cents, invNorms, math.min(nProbe, cents.length)).toSeq
      // reference: full sort by (score DESC, id DESC), take nProbe
      val scores = cents.indices.map { i =>
        var s = 0.0
        var d = 0
        val n = math.min(vec.length, cents(i).length)
        while (d < n) { s += vec(d).toDouble * cents(i)(d).toDouble; d += 1 }
        (s * invNorms(i), i)
      }
      val want = scores.sortBy { case (s, i) => (-s, -i) }
        .take(math.min(nProbe, cents.length)).map(_._2)
      got == want
    }, "nearest-centroids selection")
  }

  test("poly hash: matches a BigInt reference; seed-sensitive") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.choose(0L, 100L)) { (s, seed) =>
      val ref = s.codePoints().toArray.foldLeft(BigInt(seed % PolyHash.Mod)) {
        (h, cp) => (h * 31 + cp) % PolyHash.Mod
      }
      PolyHash.compute(s, seed) == ref.toLong
    }, "polyHash reference")
  }
}
