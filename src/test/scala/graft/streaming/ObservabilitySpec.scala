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
}
