package graft.streaming

import graft.SparkTestBase

/** The stream-gate harnesses (StreamGate) feed the REAL streaming
  * transforms from the sf tables and dump the sink for the driver's
  * DuckDB compare — these tests pin the same equivalences locally. */
class StreamGateSpec extends SparkTestBase {

  test("s9 gate == batch q16 as-of on the real event log") {
    val got = StreamGate.s9TemporalAsof(spark, sf0001).collect().map(_.toString).toSeq
    val want = graft.ops.Windows.q16Asof(spark, sf0001).collect().map(_.toString).toSeq
    assert(got == want, s"rows ${got.size} vs ${want.size}; " +
      s"first diff: ${got.zipAll(want, "<missing>", "<missing>").find(t => t._1 != t._2)}")
  }

  test("s8 gate: exact counts cover every arrival and all verdict flags hold") {
    val rows = StreamGate.s8NoveltyStream(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // the split streams the newest 10% of documents
    val nDocs = graft.model.Tables.documents(spark, sf0001).count()
    assert(rows.length >= nDocs / 20, s"suspiciously few arrivals: ${rows.length} of $nDocs")
    rows.foreach { r =>
      assert(r.getLong(3) == 1L, s"stream gram count diverged from exact: $r")
      assert(r.getLong(4) == 1L, s"bloom missed a true hit (impossible one-sided error): $r")
      assert(r.getLong(5) == 1L, s"bloom false-positive surplus out of bound: $r")
    }
  }
}
