package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Per-operator sanity specs on sf0.001 (the DuckDB hash-compare at sf0.01
  * is the full correctness gate; these check structural invariants and
  * plan shape fast). */
class OpsSpec extends SparkTestBase {

  test("c1: snapshot has one row per surviving key, no DELETE-analog rows") {
    val df = Changelog.c1Snapshot(spark, sf0001).cache()
    assert(df.count() > 0)
    assert(df.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    assert(df.filter(col("last_event_type") === "error").count() == 0)
  }

  test("c3: head is the global min event_id") {
    val head = Changelog.c3Head(spark, sf0001).collect()(0).getLong(0)
    val mn = graft.model.Tables.events(spark, sf0001).agg(min("event_id")).collect()(0).getLong(0)
    assert(head == mn)
  }

  test("q6: top-k is sorted descending and bounded") {
    val rows = Relational.q6SortLimit(spark, sf0001).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q9b: HLL estimate within 15% of exact") {
    val exact = Analytics.q9Distinct(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Analytics.q9bApproxDistinct(spark, sf0001).collect().foreach { r =>
      val (flag, approx) = (r.getString(0), r.getLong(1))
      assert(math.abs(approx - exact(flag)).toDouble / exact(flag) < 0.15,
        s"flag=$flag approx=$approx exact=${exact(flag)}")
    }
  }

  test("x1: dedup keeps one row per distinct text") {
    val docs = graft.model.Tables.documents(spark, sf0001)
    val kept = TextOps.x1DedupExact(spark, sf0001)
    assert(kept.count() == docs.select("text").distinct().count())
  }

  test("x3: kNN self-similarity excluded, scores bounded") {
    val rows = VectorOps.x3KnnCosine(spark, sf0001).collect()
    assert(rows.length == 10)
    assert(rows.forall(r => r.getLong(0) != 0L))
    assert(rows.forall(r => math.abs(r.getLong(1)) <= 10000L))
  }

  test("x15: media pipeline byte stats are consistent") {
    val rows = Multimodal.x15MediaPipeline(spark, sf0001).limit(50).collect()
    rows.foreach { r =>
      assert(r.getLong(1) > 0) // n_bytes
      assert(r.getLong(2) >= 0 && r.getLong(2) < 256) // first_byte
      assert(r.getLong(3) >= r.getLong(1)) // byte_sum >= n_bytes (ASCII >= 1/byte)
    }
  }

  test("plans: q1 pushes filters and prunes columns at the parquet scan") {
    val plan = Relational.q1ScanFilter(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in:\n$plan")
    assert(plan.contains("l_quantity"), "filter column must reach the scan")
    assert(!plan.contains("l_tax"), "unused columns must be pruned from ReadSchema")
  }

  test("plans: q3 dimension joins are broadcast") {
    val plan = Relational.q3JoinBcast(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("plans: q6 top-k is TakeOrderedAndProject (no global sort)") {
    val plan = Relational.q6SortLimit(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }
}
