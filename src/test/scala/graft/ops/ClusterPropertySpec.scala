package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** Property test for x24's connected-components engine: for ANY random
  * graph, the distributed min-label fixpoint must produce exactly the
  * components a driver-side union-find produces (labels = min member id,
  * singletons label themselves). */
class ClusterPropertySpec extends SparkTestBase {

  private def edgeGen(n: Long): Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, n - 1), Gen.choose(0L, n - 1)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) })

  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  test("connectedComponents fails loudly when the iteration cap is hit") {
    val s = spark
    import s.implicits._
    // a 10-node chain has diameter 9: min-label needs ~9 rounds, so a cap
    // of 3 must abort with the documented error, never return a
    // half-converged labeling
    val nodes = (0L until 10L).toDF("doc_id")
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("d1", "d2")
    val e = intercept[IllegalArgumentException] {
      PipelineOps.connectedComponents(nodes, chain, maxIters = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connectedComponents collapses a 200-node chain (diameter 199) within the O(log n) cap") {
    val s = spark
    import s.implicits._
    // the shape the old min-label propagation priced at O(diameter)
    // rounds: a long path. The star contraction must label it with the
    // iteration budget of the LOG bound (16 ≫ log₂ 200 ≈ 7.6 alternating
    // rounds, ≪ the 199 rounds propagation would need)
    val n = 200L
    val nodes = (0L until n).toDF("doc_id")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = PipelineOps.connectedComponents(nodes, chain, maxIters = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until n).map(_ -> 0L).toMap)
  }

  test("connectedComponents releases every superseded round's checkpoint blocks") {
    val s = spark
    import s.implicits._
    val before = s.sparkContext.getPersistentRDDs.keySet
    val nodes = (0L until 64L).toDF("doc_id")
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("d1", "d2")
    val labels = PipelineOps.connectedComponents(nodes, chain)
    labels.collect()
    val pinned = s.sparkContext.getPersistentRDDs.keySet -- before
    // multi-round run: only the FINAL star forest's checkpoint may stay
    // pinned (the result plan reads it); every superseded round must have
    // been released at the RDD layer — Dataset.unpersist would leave one
    // block set per round here
    assert(pinned.size <= 1,
      s"superseded star-contraction rounds left ${pinned.size} checkpointed RDDs pinned")
  }

  test("connectedComponents == union-find for 15 random graphs") {
    val s = spark
    import s.implicits._
    val n = 20L
    (1 to 15).foreach { i =>
      val edges = edgeGen(n)(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Nil)
      val nodes = (0L until n).toDF("doc_id")
      val pairs = edges match {
        case Nil => Seq.empty[(Long, Long)].toDF("d1", "d2")
        case es => es.toDF("d1", "d2")
      }
      val got = PipelineOps.connectedComponents(nodes, pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = unionFind(n, edges)
      assert(got == expected, s"seed=$i edges=$edges")
    }
  }
}
