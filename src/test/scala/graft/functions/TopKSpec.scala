package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the bounded top-k selection summary — the claim
  * x42 leans on: under ANY chunking of the input and ANY merge order,
  * the retained set equals the brute-force top-k under (ord DESC,
  * tag ASC). Unlike the sketch summaries this one is EXACT, so the
  * assertion is equality, not a bound. */
class TopKSpec extends AnyFunSuite {

  /** streams with heavy ord-value collisions so the tag tiebreak is
    * genuinely exercised (tags unique by construction). */
  private val streamGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 800)
    ords <- Gen.listOfN(n, Gen.chooseNum(-20L, 20L))
  } yield ords.zipWithIndex.map { case (o, i) => (o, i.toLong) }

  private def brute(xs: List[(Long, Long)], k: Int): List[(Long, Long)] =
    xs.sorted(TopKBuffer.better.reverse).take(k)

  test("merged summary equals brute-force top-k under random chunking and merge order") {
    (1 to 80).foreach { trial =>
      val stream = streamGen(Gen.Parameters.default, Seed(trial.toLong)).getOrElse(Nil)
      val rnd = new scala.util.Random(trial)
      val k = 1 + rnd.nextInt(12)
      val chunks = stream.grouped(math.max(1, stream.length / (1 + rnd.nextInt(8)))).toList
      val partials = chunks.map { c =>
        val b = new TopKBuffer(k)
        c.foreach { case (o, t) => b.add(o, t) }
        b
      }
      val merged = rnd.shuffle(partials) match {
        case Nil => new TopKBuffer(k)
        case hd :: tl => tl.foldLeft(hd) { (a, b) => a.merge(b); a }
      }
      assert(merged.sortedBest.toList == brute(stream, k),
        s"trial=$trial k=$k n=${stream.length}")
      assert(merged.heap.size <= k, s"trial=$trial buffer exceeded k")
    }
  }

  test("serialize round-trips the retained set through the shuffle hop") {
    (1 to 20).foreach { trial =>
      val stream = streamGen(Gen.Parameters.default, Seed(1000L + trial)).getOrElse(Nil)
      val k = 1 + trial % 7
      val b = new TopKBuffer(k)
      stream.foreach { case (o, t) => b.add(o, t) }
      val back = TopKBuffer.deserialize(k, b.serialize())
      assert(back.sortedBest.toList == b.sortedBest.toList, s"trial=$trial")
    }
  }

  test("ranking is the row_number order: higher ord wins, ties to the smaller tag") {
    val b = new TopKBuffer(3)
    Seq((5L, 9L), (5L, 2L), (7L, 4L), (1L, 1L), (5L, 3L)).foreach { case (o, t) => b.add(o, t) }
    assert(b.sortedBest.toList == List((7L, 4L), (5L, 2L), (5L, 3L)))
  }
}
