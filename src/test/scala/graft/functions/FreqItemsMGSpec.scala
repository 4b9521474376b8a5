package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the MG summary itself — the math the q27b verdict
  * row leans on, checked against brute-force counts on generated zipf-ish
  * streams under random chunking and random merge order. */
class FreqItemsMGSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  /** zipf-ish stream: item i drawn with weight ~ 1/(i+1). */
  private val streamGen: Gen[List[Int]] = for {
    n <- Gen.chooseNum(50, 2000)
    universe <- Gen.chooseNum(5, 200)
    items <- Gen.listOfN(n, Gen.frequency(
      (1 to universe).map(i => (universe / i, Gen.const(i - 1))): _*))
  } yield items

  test("one-sided guarantee: every item above N/(k+1) survives adds + random merges") {
    (1 to 60).foreach { trial =>
      val stream = streamGen(Gen.Parameters.default, Seed(trial.toLong)).getOrElse(Nil)
      val rnd = new scala.util.Random(trial)
      val k = 2 + rnd.nextInt(39)
      // random chunking, each chunk its own summary, merged in random order
      val chunks = stream.grouped(math.max(1, stream.length / (1 + rnd.nextInt(8)))).toList
      val summaries = chunks.map { c =>
        val m = new MGSummary(k)
        c.foreach(i => m.add(u(s"t$i")))
        m
      }
      val merged = rnd.shuffle(summaries).reduce { (a, b) => a.merge(b); a }
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = stream.length.toLong
      val bound = n / (k + 1L) // undercount ≤ N/(k+1)
      val present = merged.counts.keySet.map(_.toString)
      exact.foreach { case (i, c) =>
        if (c > bound)
          assert(present.contains(s"t$i"),
            s"trial=$trial item t$i count=$c > bound=$bound (n=$n k=$k) missing")
      }
      // estimates never overcount and undercount by at most the bound
      merged.counts.foreach { case (s, stored) =>
        val eff = stored - merged.debt
        val truth = exact.getOrElse(s.toString.stripPrefix("t").toInt, 0L)
        assert(eff <= truth, s"trial=$trial $s overcounted: eff=$eff truth=$truth")
        assert(truth - eff <= bound,
          s"trial=$trial $s undercount past bound: eff=$eff truth=$truth bound=$bound")
      }
      assert(merged.counts.size <= k, s"trial=$trial summary exceeded its k counters")
    }
  }

  test("serialize round-trips effective counts") {
    val m = new MGSummary(3)
    Seq("a", "a", "b", "c", "d", "a", "d").foreach(s => m.add(u(s)))
    val back = MGSummary.deserialize(3, m.serialize())
    val eff = m.counts.map { case (s, c) => s.toString -> (c - m.debt) }.toMap
    val effBack = back.counts.map { case (s, c) => s.toString -> (c - back.debt) }.toMap
    assert(eff == effBack)
  }
}
