package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** Property test for the snapshot operator — exactly the reference's test
  * oracle (`WalConsumerTest.java:112-127`): the materialized snapshot must
  * equal a sequential replay of the log (last op per key wins; a key whose
  * last op is the DELETE-analog is absent), for ANY op sequence. */
class SnapshotPropertySpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  private val opGen = Gen.oneOf("view", "click", "purchase", "signup", "error")
  private val logGen: Gen[List[(Long, String)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 5L), opGen))

  test("snapshotOf == sequential replay for 30 random op sequences") {
    (1 to 30).foreach { i =>
      val log = logGen(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Nil)
      val rows = log.zipWithIndex.map { case ((key, op), j) =>
        Row(j.toLong, key, op, j.toDouble)
      }
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
      val got = Changelog.snapshotOf(df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

      var last = Map.empty[Long, (Long, String)]
      log.zipWithIndex.foreach { case ((key, op), j) => last += key -> (j.toLong, op) }
      val expected = last.filter(_._2._2 != "error")

      assert(got == expected, s"seed=$i log=$log")
    }
  }
}
