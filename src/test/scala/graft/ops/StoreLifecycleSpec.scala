package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The freeze → serve → re-freeze lifecycle, end to end — the full
  * store cycle no single-store spec exercises: labels + label index
  * frozen on an EARLIER corpus installment, served (stale but valid)
  * against the grown corpus with x74 quantifying the staleness, x75
  * folding the arrivals into the stored labeling, then BOTH stores
  * re-persisted at the SAME paths — x74 flips stale→fresh and the
  * re-reads serve the new stamps (the in-session overwrite
  * invalidation [[Artifacts.writeStamped]] guarantees). */
class StoreLifecycleSpec extends SparkTestBase {

  test("labels + label index: freeze on an old installment, serve stale, re-freeze fresh") {
    val tmp = Files.createTempDirectory("graft_lifecycle_").toString
    val labelsPath = s"$tmp/labels"
    val idxPath = s"$tmp/label_index"
    val full = graft.model.Tables.documents(spark, sf0001)
    val mxFull = full.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val nFull = full.count()
    // the EARLIER installment: the corpus as of the current 9/10
    // boundary — exactly the docs the full corpus calls history
    val cutoff = Math.floorDiv(9L * mxFull, 10L)
    val oldDir = s"$tmp/corpus0"
    full.filter(col("doc_id") <= cutoff).write.parquet(s"$oldDir/documents.parquet")
    val nOld = full.filter(col("doc_id") <= cutoff).count()

    // FREEZE: persist both label-lifecycle stores on the old installment
    PipelineOps.persistLabels(spark, oldDir, labelsPath)
    PipelineOps.persistLabelIndex(spark, oldDir, idxPath)

    val serving = spark.newSession()
    serving.conf.set("spark.graft.labelsPath", labelsPath)
    serving.conf.set("spark.graft.labelIndexPath", idxPath)
    try {
      // x74 quantifies the staleness of both stores against the GROWN
      // corpus: boundary lag and (for labels) the rows a fresh persist
      // would add
      val before = Audit.x74ArtifactFreshness(serving, sf0001).collect()
        .map(r => r.getString(0) -> r).toMap
      val lab0 = before("x24_labels")
      assert(lab0.getLong(7) == 0L, s"stale labels store not flagged: $lab0")
      assert(lab0.getLong(1) == cutoff && lab0.getLong(2) == mxFull &&
        lab0.getLong(3) == mxFull - cutoff,
        s"labels boundary lag wrong: $lab0")
      assert(lab0.getLong(6) == nFull - nOld,
        s"labels row_drift must price the fresh persist: $lab0")
      val idx0 = before("s21_index")
      assert(idx0.getLong(7) == 0L && idx0.getLong(3) > 0L,
        s"stale label index not flagged with magnitude: $idx0")

      // SERVE: the stale-but-valid stores still serve — s21's batch twin
      // assigns every arrival from the stored index, and x75 folds the
      // arrivals into the stored labeling (seeded at the store's OWN
      // frozen boundary, read from the stamp)
      val assigned = PipelineOps.labelRouteDecisions(serving, sf0001)
      assert(assigned.count() == nFull - nOld,
        "the router must assign exactly the docs past the store's boundary")
      val maintained = PipelineOps.x75IncLabels(serving, sf0001)
      assert(maintained.count() == nFull, "x75 must relabel the whole corpus")
      assert(maintained.filter(col("doc_id") > cutoff).count() == nFull - nOld,
        "x75's arrivals are exactly the docs past the stored max_id")

      // RE-FREEZE: persist both stores on the grown corpus at the SAME
      // paths — the serving session must re-validate the new stamps
      // (writeStamped evicts the memoized reads), and x74 flips fresh
      PipelineOps.persistLabels(serving, sf0001, labelsPath)
      PipelineOps.persistLabelIndex(serving, sf0001, idxPath)
      val after = Audit.x74ArtifactFreshness(serving, sf0001).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(after("x24_labels").getLong(7) == 1L,
        s"re-persisted labels still stale: ${after("x24_labels")}")
      assert(after("s21_index").getLong(7) == 1L,
        s"re-persisted label index still stale: ${after("s21_index")}")
      assert(after("x24_labels").getLong(3) == 0L &&
        after("x24_labels").getLong(6) == 0L,
        s"fresh store must read zero magnitude: ${after("x24_labels")}")
      // and the re-frozen store SERVES: the router answers every arrival
      // from the REFRESHED index (the memoized stale read was evicted by
      // the overwrite — this re-read would throw on the old plan's
      // deleted files, and re-validates the new stamp)
      assert(PipelineOps.labelRouteDecisions(serving, sf0001).count() == nFull - nOld,
        "the router must keep serving from the re-frozen index")
    } finally {
      serving.conf.unset("spark.graft.labelsPath")
      serving.conf.unset("spark.graft.labelIndexPath")
    }
  }
}
