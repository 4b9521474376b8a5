package graft

import graft.SparkTestBase

/** The engine is fully usable from spark.sql once tables are registered. */
class SqlSurfaceSpec extends SparkTestBase {
  test("registerTables exposes all tables and graft functions to SQL") {
    SparkEntry.registerTables(spark, sf0001)
    val agg = spark.sql(
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect()
    assert(agg.length == 3 && agg.map(_.getLong(1)).sum == 6000L)

    val knn = spark.sql(
      """SELECT a.vec_id, dot_arr(a.embedding, b.embedding) AS dot
        |FROM embeddings a JOIN embeddings b ON b.vec_id = 0 AND a.vec_id <> 0
        |ORDER BY dot DESC LIMIT 3""".stripMargin).collect()
    assert(knn.length == 3)

    val ev = spark.sql("SELECT count(*) FROM events WHERE ts IS NOT NULL").collect()
    assert(ev(0).getLong(0) == 1000L)
  }
}
