package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.datasketches.kll.KllLongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE

/** Property tests for the KLL quantile math the q29 verdict row leans
  * on, independent of Spark: rank-error bounds against brute force under
  * random chunking, random merge order, and the serialize/deserialize
  * path [[KllSketchAgg]]/[[KllMergeAgg]] use between partials. KLL
  * compaction is RANDOMIZED, so (unlike theta exact mode) assertions are
  * always bound-shaped — the 2ε slack q29's gate uses — except below
  * compaction size, where the sketch provably retains every item. */
class KllSketchSpec extends AnyFunSuite {

  private val k = KllSketchAgg.defaultK
  private val eps = KllSketchAgg.epsilon(k)
  private val ps = Seq(0.5, 0.9, 0.99)

  /** The aggregate's serialize→deserialize hop, verbatim. */
  private def roundTrip(s: KllLongsSketch): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(s.toByteArray))

  /** Random chunking + serde hop per partial + random merge order —
    * the shapes a shuffle can produce. */
  private def buildMerged(vals: Seq[Long], rnd: scala.util.Random): KllLongsSketch = {
    val chunks = vals.grouped(math.max(1, vals.length / (1 + rnd.nextInt(8)))).toList
    val partials = chunks.map { c =>
      val s = KllLongsSketch.newHeapInstance(k)
      c.foreach(s.update)
      roundTrip(s)
    }
    rnd.shuffle(partials).reduce { (x, y) => x.merge(y); x }
  }

  /** Tie-aware rank check: the returned value's exact rank SPAN
    * [count(<q), count(≤q)]/n must intersect [p−slack, p+slack]. Under
    * duplicates the inclusive rank alone can exceed p by the atom's
    * whole mass even from a perfect sketch — ScalaCheck's
    * boundary-biased chooseNum creates exactly such atoms (measured:
    * an atom at 10000 pushed inclusive rank 2.1ε past p while the span
    * condition held). Same condition as the q29 gate. */
  private def spanInBound(sorted: Seq[Long], q: Long, p: Double, slack: Double): Boolean = {
    val n = sorted.size.toDouble
    val rLt = sorted.count(_ < q) / n
    val rLe = sorted.count(_ <= q) / n
    rLt <= p + slack && rLe >= p - slack
  }

  private val streamGen: Gen[List[Long]] = for {
    n <- Gen.chooseNum(500, 30000)
    // duplicate-heavy, skewed domain — rank guarantees are
    // distribution-free and must hold here too
    vals <- Gen.listOfN(n, Gen.frequency(
      (5, Gen.chooseNum(0L, 100L)),
      (3, Gen.chooseNum(0L, 10000L)),
      (1, Gen.chooseNum(0L, 1000000000L))))
  } yield vals

  test("merged quantiles stay within 2*eps normalized rank of brute force") {
    (1 to 30).foreach { trial =>
      val vals = streamGen(Gen.Parameters.default, Seed(trial.toLong)).getOrElse(Nil)
      val rnd = new scala.util.Random(trial)
      val sk = buildMerged(vals, rnd)
      assert(sk.getN == vals.size.toLong, s"trial=$trial stream length lost in merge")
      val sorted = vals.sorted
      ps.foreach { p =>
        val q = sk.getQuantile(p, INCLUSIVE)
        assert(spanInBound(sorted, q, p, 2 * eps),
          s"trial=$trial p=$p: rank span of $q " +
            s"[${sorted.count(_ < q)}, ${sorted.count(_ <= q)}]/${sorted.size} " +
            s"misses p±2eps=${2 * eps}")
      }
    }
  }

  test("below compaction size the sketch is exact and merge-order invariant") {
    (1 to 30).foreach { trial =>
      val rnd = new scala.util.Random(100 + trial)
      val n = 1 + rnd.nextInt(k) // ≤ k items: level 0 never compacts
      val vals = List.fill(n)(rnd.nextLong() % 1000)
      val sk = buildMerged(vals, rnd)
      assert(!sk.isEstimationMode, s"trial=$trial: n=$n should stay exact")
      val sorted = vals.sorted
      ps.foreach { p =>
        val q = sk.getQuantile(p, INCLUSIVE)
        // INCLUSIVE exact semantics: smallest item whose rank covers p
        val want = sorted(math.max(0, math.ceil(p * n).toInt - 1))
        assert(q == want, s"trial=$trial p=$p: exact-mode quantile $q != $want")
      }
    }
  }

  test("kll_merge of stored dailies answers like one big sketch (both in bound)") {
    (1 to 20).foreach { trial =>
      val rnd = new scala.util.Random(200 + trial)
      val days = 3 + rnd.nextInt(10)
      val perDay = (1 to days).map { d =>
        // each day a different shifted distribution, so merging matters
        List.fill(500 + rnd.nextInt(3000))(rnd.nextInt(10000).toLong + d * 1000L)
      }
      // daily build sketches → stored bytes → merge via the KllMergeAgg
      // update path (heapify each stored sketch into the buffer)
      val dailies = perDay.map { vals =>
        val s = KllLongsSketch.newHeapInstance(k)
        vals.foreach(s.update)
        s.toByteArray
      }
      val buf = KllLongsSketch.newHeapInstance(k)
      rnd.shuffle(dailies).foreach(b => buf.merge(KllLongsSketch.heapify(Memory.wrap(b))))
      val all = perDay.flatten.sorted
      assert(buf.getN == all.size.toLong)
      ps.foreach { p =>
        val q = buf.getQuantile(p, INCLUSIVE)
        assert(spanInBound(all, q, p, 2 * eps),
          s"trial=$trial p=$p: merged-rollup rank span of $q misses p±2eps")
      }
    }
  }
}
