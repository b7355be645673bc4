package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based monoid laws — the soundness condition for bolt
  * state merging (reference Processor.hs:49 mergeFn must be an
  * associative, commutative merge with an identity for snapshots and
  * partial aggregation to be order-insensitive).
  */
class MonoidLawsSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val entry = for {
    k <- Gen.oneOf("a", "b", "c", "d", "e", "f", "g")
    v <- Gen.chooseNum(0L, 1000L)
  } yield (k, v)
  private val state: Gen[Map[String, Long]] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.mapOfN(n, entry))

  test("LongSum: identity, associativity, commutativity") {
    for (Seq(a, b, c) <- samples(Gen.listOfN(3, Gen.chooseNum(-1000L, 1000L)), 200)) {
      assert(LongSum.combine(a, LongSum.empty) == a)
      assert(LongSum.combine(LongSum.combine(a, b), c) ==
        LongSum.combine(a, LongSum.combine(b, c)))
      assert(LongSum.combine(a, b) == LongSum.combine(b, a))
    }
  }

  test("TopN: identity, commutativity, boundedness, max-merge") {
    val m = TopN(3)
    for (Seq(a, b) <- samples(Gen.listOfN(2, state), 300)) {
      val ab = m.combine(a, b)
      assert(ab == m.combine(b, a))
      assert(ab.size <= 3)
      assert(m.combine(m.empty, m.empty) == m.empty)
      // every surviving value is the max across both inputs for its key
      ab.foreach { case (k, v) =>
        assert(v == math.max(a.getOrElse(k, Long.MinValue), b.getOrElse(k, Long.MinValue)))
      }
      // merging with empty only truncates, never alters survivors' values
      m.combine(a, m.empty).foreach { case (k, v) => assert(a(k) == v) }
    }
  }
}
