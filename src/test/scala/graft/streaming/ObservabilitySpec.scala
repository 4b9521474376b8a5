package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution
import graft.SparkTestBase

/** The `observe()` metrics path (SURVEY.md §3 E3): per-action metric rows
  * without a second pass over the data — the batch analog of the
  * reference's gauges (`WalConsumer.java:78-98`). */
class ObservabilitySpec extends SparkTestBase {
  test("observe() surfaces wal_num_records and value sum in one pass") {
    val s = spark
    val captured = new AtomicReference[Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("wal").foreach(captured.set)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      graft.model.Tables.events(s, sf0001)
        .observe("wal", count(lit(1)).as("wal_num_records"),
          sum(graft.model.Tables.cents(col("value"))).as("value_c"))
        .write.format("noop").mode("overwrite").save()
      val deadline = System.currentTimeMillis() + 10000
      while (captured.get() == null && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val m = captured.get()
      assert(m != null, "observed metrics not delivered")
      assert(m.getAs[Long]("wal_num_records") == 1000L)
      assert(m.getAs[Long]("value_c") > 0L)
    } finally s.listenerManager.unregister(listener)
  }

  test("replayed batch feeds the already-done meter and observed metrics") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    TestSink.reset()
    val ms = MemoryStream[WalRecord]
    val tmp = java.nio.file.Files.createTempDirectory("graft-meter").toString
    // reporter emissions (the JmxReporter-analog path) captured per
    // progress event
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, Long]]()
    val p = new WalPipeline(ms.toDS(), new TestSink, s"$tmp/ckpt",
      pollMillis = 10L, retrySleepMs = 1L,
      reporterEmit = g => emitted.add(g))
    p.start()
    try {
      ms.addData(WalRecord(0, 1, "ADD", "name1"), WalRecord(1, 2, "ADD", "name2"))
      p.processAllAvailable()
      assert(p.metrics.numIgnoredAlreadyDone.get() == 0L)
      // the reference's replay scenario (WalConsumerTest.java:66-68): the
      // same records delivered again — the sink flags each as already done
      ms.addData(WalRecord(0, 1, "ADD", "name1"), WalRecord(1, 2, "ADD", "name2"),
        WalRecord(2, 1, "UPDATE", "updated-name"))
      p.processAllAvailable()
      assert(p.metrics.numIgnoredAlreadyDone.get() == 2L,
        s"expected 2 ignored replays, got ${p.metrics.numIgnoredAlreadyDone.get()}")
      assert(p.metrics.numSynchronized.get() > 0L)
      // observe() metrics must land in StreamingQueryProgress (async bus)
      val deadline = System.currentTimeMillis() + 10000
      while (p.metrics.lastObserved.get().isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(p.metrics.lastObserved.get().get("wal_num_records").exists(_ > 0L),
        s"observed metrics missing: ${p.metrics.lastObserved.get()}")
      // the scrape point exposes the full reference gauge set
      val g = p.metrics.gauges
      assert(g("wal_num_ignored_already_done") == 2L)
      assert(g.keySet == Set("wal_state", "wal_num_records", "wal_num_synchronized",
        "wal_num_ignored_already_done", "wal_num_io_failures", "wal_not_empty_seconds"))
      // the reporter (JmxReporter analog) pushed the same gauge set per
      // progress event — async bus, so wait like the observe() path does
      val repDeadline = System.currentTimeMillis() + 10000
      while (emitted.isEmpty && System.currentTimeMillis() < repDeadline)
        Thread.sleep(50)
      assert(!emitted.isEmpty, "reporter emitted nothing")
      assert(emitted.peek().keySet == g.keySet,
        s"reporter gauge keys drifted: ${emitted.peek().keySet}")
    } finally p.close()
  }
}
