package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkTestBase

/** x46 PassJoin edit-distance similarity join: brute-force parity on the
  * real corpus, candidate completeness on adversarial synthetic pairs
  * (random strings + ≤τ random edits), short-bucket coverage, and the
  * no-cross-product plan shape. */
class EditJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val tau = TextOps.x46EditTau

  /** Plain full-DP Levenshtein — the spec's independent referee. */
  private def lev(a: String, b: String): Int = {
    val prev = Array.range(0, b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      Array.copy(cur, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  private def titlesDf(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "lang", "title")
      .withColumn("m", length(col("title")).cast("long"))

  private def bruteForce(rows: Seq[(Long, String, String)]): Set[(Long, Long, Int)] =
    (for {
      (ida, la, ta) <- rows; (idb, lb, tb) <- rows
      if ida < idb && la == lb
      d = lev(ta, tb) if d <= tau
    } yield (ida, idb, d)).toSet

  private def viaOperator(rows: Seq[(Long, String, String)]): Set[(Long, Long, Int)] =
    TextOps.x46PairsFromTitles(titlesDf(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3).toInt)).toSet

  test("x46: operator equals brute force on the sf0.001 corpus") {
    val rows = graft.model.Tables.documents(spark, sf0001)
      .select(col("doc_id").cast("long"), col("lang"),
        concat_ws(" ", slice(split(col("text"), " "), 1, TextOps.x46TitleToks)))
      .as[(Long, String, String)].collect().toSeq
    val expected = bruteForce(rows)
    assert(expected.nonEmpty, "corpus should contain near-identical titles")
    assert(viaOperator(rows) === expected)
  }

  test("x46: candidate generation is complete for random ≤τ-edit pairs") {
    val alpha = Gen.oneOf('a', 'b', 'c')
    val editGen = for {
      n <- Gen.choose(1, 40)
      s1 <- Gen.stringOfN(n, alpha)
      k <- Gen.choose(0, tau)
      edits <- Gen.listOfN(k, Gen.oneOf[Int](0, 1, 2)) // sub / del / ins
    } yield {
      var s = s1
      for (op <- edits; if s.nonEmpty || op == 2) {
        val p = math.abs(s.hashCode ^ op * 31) % math.max(s.length, 1)
        op match {
          case 0 if s.nonEmpty => s = s.updated(p, (('a' + (s(p) - 'a' + 1) % 3).toChar))
          case 1 if s.nonEmpty => s = s.take(p) + s.drop(p + 1)
          case _ => s = s.take(p) + "b" + s.drop(p)
        }
      }
      (s1, s)
    }
    // adversarial shapes for the multi-match window bounds: all edits
    // clustered at one end (max |d| for the first/last segments)
    val clustered = Seq(
      ("abcabcabcabcabcabcabcabc", "xxxxx" + "abcabcabcabcabcabcabcabc"), // 5 inserts at 0
      ("abcabcabcabcabcabcabcabc", "abcabcabcabcabcabcabcabc".drop(5)),  // 5 deletes at 0
      ("abcabcabcabcabcabcabcabc", "abcabcabcabcabcabcabcabc" + "yyyyy"), // 5 inserts at end
      ("abcabcabcabcabcabcabcabc", "abcabcabcabcabcabcabcabc".dropRight(5)),
      ("aaabbbcccaaabbbccc", "bbb" + "aaabbbcccaaabbbccc".dropRight(2)),  // mixed ends
      ("abababababababab", "babababababababa"))                            // shift-by-one
    val pairs = ((0 until 200).map(i => graft.SparkTestBase.sampleGen(editGen, 1000 + i))
      ++ clustered)
      .filter { case (a, b) => lev(a, b) <= tau }
    assert(pairs.size >= 160, s"generator should mostly stay within tau, got ${pairs.size}")
    // one operator invocation over all pairs at once: docs 2i / 2i+1 share
    // a private language so only intended pairs can match
    val rows = pairs.zipWithIndex.flatMap { case ((s1, s2), i) =>
      Seq((2L * i, s"l$i", s1), (2L * i + 1, s"l$i", s2)) }
    val got = viaOperator(rows)
    val want = bruteForce(rows)
    assert(want.subsetOf(got) && got === want)
    pairs.zipWithIndex.foreach { case ((s1, s2), i) =>
      assert(got.contains((2L * i, 2L * i + 1, lev(s1, s2))),
        s"missed pair ($s1, $s2) d=${lev(s1, s2)}") }
  }

  test("x46: short titles pair through the short bucket, mixed lengths stay exact") {
    val rows = Seq(
      (1L, "en", "a"), (2L, "en", "ab"), (3L, "en", "abcde"),
      (4L, "en", "abcdefghij"), (5L, "en", "abcdefghijklmno"),
      (6L, "en", ""), (7L, "de", "ab"), (8L, "en", "zzzzzzzzzz"))
    assert(viaOperator(rows) === bruteForce(rows))
  }

  test("x46: plan is equi-join only — no cross product, candidates via shuffle-hash") {
    val plan = TextOps.x46EditJoin(spark, sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.take(40).mkString("\n"))
    // the candidate join must never sort the probe explosion
    assert(plan.contains("ShuffledHashJoin"), plan.linesIterator.take(40).mkString("\n"))
  }
}
