package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase

class SnapshotTableSpec extends SparkTestBase {

  test("materialized snapshot table tracks the golden scenario across batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val tmp = Files.createTempDirectory("graft-snap").toString
    val ms = MemoryStream[WalRecord]
    val q = SnapshotTable.materialize(ms.toDS(), s"$tmp/table", s"$tmp/ckpt")
    def state(): Map[Long, String] =
      SnapshotTable.read(s, s"$tmp/table").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    try {
      ms.addData(WalRecord(0, 1, "ADD", "name1"), WalRecord(1, 2, "ADD", "name2"))
      q.processAllAvailable()
      assert(state() == Map(1L -> "name1", 2L -> "name2"))

      // replay + update + add (already-done replay must lose the merge)
      ms.addData(WalRecord(1, 2, "ADD", "name2-replay"),
        WalRecord(2, 1, "UPDATE", "updated-name"), WalRecord(3, 3, "ADD", "name3"))
      q.processAllAvailable()
      assert(state() == Map(1L -> "updated-name", 2L -> "name2", 3L -> "name3"))

      ms.addData(WalRecord(4, 3, "DELETE", null))
      q.processAllAvailable()
      assert(state() == Map(1L -> "updated-name", 2L -> "name2"),
        "the reference golden final state")
    } finally q.stop()
  }

  test("merge is idempotent: re-applying a batch changes nothing") {
    val s = spark
    import s.implicits._
    val batch = Seq(
      WalRecord(0, 1, "ADD", "a"), WalRecord(1, 1, "UPDATE", "b"),
      WalRecord(2, 2, "ADD", "c")).toDS()
    val once = SnapshotTable.merge(
      Seq.empty[(Long, String, Long)].toDF("entityId", "payload", "lastId"), batch)
    val twice = SnapshotTable.merge(once, batch)
    assert(once.collect().toSet == twice.collect().toSet)
    assert(once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "b", 2L -> "c"))
  }
}
