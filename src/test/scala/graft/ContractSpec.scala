package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: every oracle entry must have a query, and
  * every query without an oracle must be a documented exception. */
class ContractSpec extends AnyFunSuite {
  test("oracleSql keys are a subset of queries keys") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle entries without a query: $dangling")
  }

  test("every query has an oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"rows-only-checked queries appeared: $noOracle — add an oracle")
  }

  test("entry runs on sf0.001 with rows") {
    val spark = SparkTestBase.session
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q27's total side reuses the count exchange, not a second corpus scan") {
    val spark = SparkTestBase.session
    val df = graft.ops.Analytics.q27FreqItems(spark, "/root/testdata/sf0.001")
    df.collect() // AQE applies exchange reuse at stage materialization
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      "expected the n_total aggregate to read the bigram-count shuffle " +
        s"as ReusedExchange; got:\n$plan")
  }

  test("no query plans a CartesianProduct") {
    val spark = SparkTestBase.session
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded cartesian plans (broadcast the small side instead): $offenders")
  }
}
