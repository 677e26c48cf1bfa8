package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the streaming offsets — checkpointed state that
  * must survive a json round-trip (restart path: the engine hands the
  * source a SerializedOffset holding exactly the json written
  * earlier) and compare order-insensitively (a filesystem listing
  * carries no order contract).
  */
class OffsetPropertySpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: $res")
  }

  // commit names as appendWithStats enforces them: [A-Za-z0-9._-]+
  private val nameGen: Gen[String] = for {
    n <- Gen.choose(1, 24)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('.', '_', '-')))
  } yield cs.mkString

  test("StatsCommitOffset: json round-trips; equality and hash are order-insensitive") {
    check(Prop.forAll(Gen.listOf(nameGen)) { names =>
      val off = StatsCommitOffset(names)
      val parsed = StatsCommitOffset.parse(off.json)
      val shuffled = StatsCommitOffset(names.reverse)
      parsed == off &&
        shuffled == off &&
        shuffled.hashCode == off.hashCode &&
        parsed.commits.sorted == names.distinct.sorted ||
        // duplicates collapse is NOT promised — names are unique by
        // construction (marker filenames); allow exact multiset too
        parsed.commits.sorted == names.sorted
    }, "StatsCommitOffset round-trip")
  }

  test("CdfVersionOffset: json round-trips through the defensive regex parse") {
    check(Prop.forAll(Gen.long) { v =>
      val off = CdfVersionOffset(v)
      CdfVersionOffset.from(
        new org.apache.spark.sql.execution.streaming.Offset {
          override def json: String = off.json
        }).version == v
    }, "CdfVersionOffset round-trip")
  }
}
