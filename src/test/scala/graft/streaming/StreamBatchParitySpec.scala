package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** Stream/batch parity property: feeding a random mutation log through the
  * stateful streaming view in arbitrary micro-batch splits must end in the
  * same state as the batch last-op-wins replay — the incremental engine
  * may never disagree with the batch engine (the reference has only one
  * engine, so parity is its implicit contract). */
class StreamBatchParitySpec extends SparkTestBase {

  private val opGen = Gen.oneOf("ADD", "UPDATE", "DELETE")
  private val logGen: Gen[List[(Long, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0L, 4L), opGen))

  test("snapshotStream over random micro-batch splits == sequential replay") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    (1 to 5).foreach { seed =>
      val log = logGen(Gen.Parameters.default, Seed(seed.toLong)).getOrElse(Nil)
        .zipWithIndex.map { case ((k, op), i) => WalRecord(i.toLong, k, op, s"p$i") }
      val cut1 = log.length / 3
      val cut2 = 2 * log.length / 3
      val ms = MemoryStream[WalRecord]
      val q = Streams.snapshotStream(ms.toDS())
        .writeStream.format("memory").queryName(s"parity$seed").outputMode("update").start()
      try {
        Seq(log.slice(0, cut1), log.slice(cut1, cut2), log.drop(cut2)).foreach { b =>
          if (b.nonEmpty) ms.addData(b)
          q.processAllAvailable()
        }
        val got = s.table(s"parity$seed").as[EntityState].collect()
          .groupBy(_.entityId).map { case (k, vs) => k -> vs.maxBy(_.lastId) }
          .collect { case (k, st) if !st.deleted => k -> st.payload }
        var last = Map.empty[Long, WalRecord]
        log.foreach(r => last += r.entityId -> r)
        val expected = last.collect {
          case (k, r) if r.operation != "DELETE" => k -> r.payload
        }
        assert(got == expected, s"seed=$seed log=$log")
      } finally q.stop()
    }
  }

  test("s9 temporal as-of over the REAL event log == batch q16, any batch split") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    implicit val ctx = s.sqlContext
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the driver's events table, in log order (the WAL delivery contract)
    val log = graft.model.Tables.events(s, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy("event_id")
      .as[(Long, Long, String)].collect()
      .map { case (e, u, t) => ProbeEvent(e, u, t) }
    val expected = graft.ops.Windows.q16Asof(s, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().toSeq
    val ms = MemoryStream[ProbeEvent]
    val q = Streams.temporalAsofStream(ms.toDS())
      .writeStream.format("memory").queryName("s9real").outputMode("append").start()
    try {
      // three uneven batch cuts, mid-lineage on purpose
      val cuts = Seq(log.length / 4, log.length / 2, log.length)
      var from = 0
      cuts.foreach { to =>
        if (to > from) ms.addData(log.slice(from, to).toIndexedSeq: _*)
        q.processAllAvailable()
        from = to
      }
      val got = s.table("s9real").as[AsofMatch].collect()
        .sortBy(_.eventId)
        .map(m => (m.eventId, m.userId, m.priorViewId)).toSeq
      assert(got.size == expected.size && got == expected,
        s"stream/batch divergence: got ${got.size} rows, expected ${expected.size}")
    } finally {
      q.stop()
      s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
