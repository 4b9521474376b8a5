package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Sources

/** Restart semantics — the reference's consume-atomicity contract
  * (`WalHeadHandle.java:29-42`: a failed commit replays the record; the
  * callback detects the redo). Spark form: checkpointed offsets + an
  * idempotent sink ⇒ stopping and restarting the pipeline never produces
  * duplicate effects. */
class RecoverySpec extends SparkTestBase {

  test("pipeline restart from checkpoint: no duplicate effects, no lost records") {
    val s = spark
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-recover").toString
    val walDir = s"$tmp/wal"
    Files.createDirectories(java.nio.file.Paths.get(walDir))
    TestSink.reset()

    Seq(WalRecord(0, 1, "ADD", "a0"), WalRecord(1, 2, "ADD", "a1"))
      .toDF().write.mode("append").parquet(walDir)
    val p1 = new WalPipeline(Sources.walFileStream(s, walDir), new TestSink,
      s"$tmp/ckpt", pollMillis = 10L, retrySleepMs = 1L)
    p1.start()
    p1.processAllAvailable()
    p1.close() // stop — consumer instance goes away (reference close())

    // records arrive while no consumer is running
    Seq(WalRecord(2, 1, "UPDATE", "a2"), WalRecord(3, 3, "ADD", "a3"))
      .toDF().write.mode("append").parquet(walDir)

    // a NEW consumer resumes from the same checkpoint
    val p2 = new WalPipeline(Sources.walFileStream(s, walDir), new TestSink,
      s"$tmp/ckpt", pollMillis = 10L, retrySleepMs = 1L)
    p2.start()
    try {
      p2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(TestSink.target.asScala.toMap ==
        Map(1L -> "a2", 2L -> "a1", 3L -> "a3"))
      // ids 0 and 1 were applied before the restart; if the restarted query
      // replayed them, the idempotent sink must have flagged them, not
      // re-applied (appliedThru still monotonic)
      assert(TestSink.appliedThru.get(1L) == 2L)
      assert(TestSink.appliedThru.get(2L) == 1L)
    } finally p2.close()
  }

  test("abnormal query termination surfaces as INACCESSIBLE_IO_FAILURE") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[WalRecord]
    val metrics = new WalMetrics
    s.streams.addListener(metrics)
    val q = ms.toDS().writeStream
      .foreachBatch { (_: org.apache.spark.sql.Dataset[WalRecord], _: Long) =>
        throw new java.io.IOException("target unreachable and not retried here")
      }
      .option("checkpointLocation", Files.createTempDirectory("graft-fail").toString)
      .start()
    metrics.queryId = q.id
    try {
      ms.addData(WalRecord(0, 1, "ADD", "x"))
      intercept[Exception] { q.processAllAvailable() }
      // listener events are async; wait briefly
      val deadline = System.currentTimeMillis() + 10000
      while (metrics.state.get() != WalState.INACCESSIBLE_IO_FAILURE &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(metrics.state.get() == WalState.INACCESSIBLE_IO_FAILURE)
    } finally {
      if (q.isActive) q.stop()
      s.streams.removeListener(metrics)
    }
  }
}
