package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}

/** Property tests for the theta summary math the q28c verdict row leans
  * on, independent of Spark: exact-mode unions and intersections against
  * brute-force sets, under random chunking, random merge order, and the
  * serialize/deserialize path [[ThetaSketchAgg]] uses between partials. */
class ThetaSketchSpec extends AnyFunSuite {

  private val lgK = 12

  private def freshUnion(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  /** The aggregate's serialize→deserialize hop, verbatim. */
  private def roundTrip(u: Union): Union = {
    val back = freshUnion()
    back.union(Memory.wrap(u.getResult.toByteArray))
    back
  }

  private val streamGen: Gen[(List[Long], List[Long])] = for {
    na <- Gen.chooseNum(1, 3000)
    nb <- Gen.chooseNum(1, 3000)
    a <- Gen.listOfN(na, Gen.chooseNum(0L, 2000L))
    b <- Gen.listOfN(nb, Gen.chooseNum(0L, 2000L))
  } yield (a, b)

  test("exact mode: union + intersection estimates equal brute force under random merges") {
    (1 to 40).foreach { trial =>
      val (a, b) = streamGen(Gen.Parameters.default, Seed(trial.toLong))
        .getOrElse((Nil, Nil))
      val rnd = new scala.util.Random(trial)
      def build(vals: List[Long]): CompactSketch = {
        // random chunking, one partial Union per chunk, each partial
        // pushed through the serde hop, merged in random order
        val chunks = vals.grouped(math.max(1, vals.length / (1 + rnd.nextInt(6)))).toList
        val partials = chunks.map { c =>
          val u = freshUnion()
          c.foreach(u.update)
          roundTrip(u)
        }
        val merged = rnd.shuffle(partials).reduce { (x, y) =>
          x.union(y.getResult); x
        }
        merged.getResult
      }
      val (sa, sb) = (build(a), build(b))
      assert(math.rint(sa.getEstimate).toLong == a.distinct.size.toLong,
        s"trial=$trial union estimate drifted in exact mode")
      val i = SetOperation.builder().setLogNominalEntries(lgK).buildIntersection()
      i.intersect(sa); i.intersect(sb)
      val exactBoth = (a.toSet & b.toSet).size.toLong
      assert(math.rint(i.getResult.getEstimate).toLong == exactBoth,
        s"trial=$trial intersection ${i.getResult.getEstimate} != exact $exactBoth")
    }
  }

  test("estimation mode: the intersection interval covers the true overlap") {
    // well past 2^12 distinct keys per side, so both sketches sample —
    // the regime where the plain estimate carries union-size-dependent
    // error and only the library interval is a valid guarantee. 30
    // seeded trials at 3 standard deviations: per-trial miss odds ~0.3%,
    // the run is deterministic so no flake budget is needed.
    (1 to 30).foreach { trial =>
      val rnd = new scala.util.Random(1000 + trial)
      val nA = 20000 + rnd.nextInt(20000)
      val nB = 20000 + rnd.nextInt(20000)
      val overlap = 2000 + rnd.nextInt(8000)
      val base = rnd.nextLong() & 0xffffffffL
      val a = (0L until nA).map(base + _)
      val b = (0L until overlap).map(base + _) ++
        (0L until (nB - overlap)).map(base + 1000000L + _)
      def sk(vals: Seq[Long]): Array[Byte] = {
        val u = freshUnion(); vals.foreach(u.update); u.getResult.toByteArray
      }
      val (sa, sb) = (sk(a), sk(b))
      assert(!ThetaSketchAgg.isExact(sa) && !ThetaSketchAgg.isExact(sb),
        s"trial=$trial: sides must be in estimation mode for this leg")
      val (lo, est, hi) = ThetaSketchAgg.intersectBounds(sa, sb, numStdDev = 3)
      assert(lo <= overlap && overlap <= hi,
        s"trial=$trial: true overlap $overlap outside [$lo, $hi] (est $est)")
      // the interval is informative, not vacuous: width stays well under
      // the smaller side's cardinality
      assert(hi - lo < math.min(nA, nB).toDouble,
        s"trial=$trial: interval [$lo, $hi] wider than the smaller side")
    }
  }

  test("driver helpers agree with the library on stored sketch bytes") {
    val u1 = freshUnion(); (1L to 100L).foreach(u1.update)
    val u2 = freshUnion(); (51L to 150L).foreach(u2.update)
    val (b1, b2) = (u1.getResult.toByteArray, u2.getResult.toByteArray)
    assert(math.rint(ThetaSketchAgg.estimate(b1)).toLong == 100L)
    assert(math.rint(ThetaSketchAgg.intersectEstimate(b1, b2)).toLong == 50L)
  }
}
