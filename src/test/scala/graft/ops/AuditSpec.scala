package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** x48 constraint audit: injected violations must be counted exactly,
  * the clean corpus must pass everything, and the row-level pass must
  * stay one scan per table. */
class AuditSpec extends SparkTestBase {
  import spark.implicits._

  test("x48: injected violations are counted exactly") {
    val df = Seq(
      (1L, Some(2.0), "ok"),
      (1L, None, "ok"),        // dup id + null value
      (2L, Some(-1.0), "bad"), // domain violation
      (3L, None, "ok")         // null value
    ).toDF("id", "value", "kind")
    val got = Audit.rowChecks(df, Seq(
        "value_complete" -> col("value").isNull,
        "kind_domain" -> !col("kind").isin("ok")),
        uniqueKey = Some("id_unique" -> col("id")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("value_complete") === ((4L, 2L)))
    assert(got("kind_domain") === ((4L, 1L)))
    assert(got("id_unique") === ((4L, 1L)))
  }

  test("x48: fk orphans come from one left-join pass, never a lookup") {
    val child = Seq((1L, "a"), (2L, "b"), (9L, "c"), (9L, "d")).toDF("k", "x")
    val parent = Seq((1L, "p"), (2L, "q"), (3L, "r")).toDF("pk", "y")
    val v = Audit.fkCheck("fk", child, "k", parent, "pk")
    val row = v.collect().head
    assert((row.getLong(1), row.getLong(2)) === ((4L, 2L)))
    val plan = v.queryExecution.executedPlan.toString
    assert(plan.contains("LeftOuter") && !plan.contains("CartesianProduct"), plan)
  }

  test("x48: the driver corpus passes every constraint") {
    val rows = Audit.x48ConstraintAudit(spark, sf001).collect()
    assert(rows.length === 9)
    assert(rows.forall(_.getLong(3) == 1L),
      rows.filter(_.getLong(3) == 0L).mkString(", "))
  }

  test("x48: row-level checks share one scan per table") {
    // events contributes 4 constraints (3 row checks + uniqueness) but
    // must scan once; the whole audit reads its 3 tables + the fk parent
    val plan = Audit.x48ConstraintAudit(spark, sf001).queryExecution.optimizedPlan
    val scans = plan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.LeafNode => r
    }
    // events ×1, lineitem ×2 (row checks + fk child), orders ×1, docs ×1
    // — relation reuse may dedupe further, never multiply
    assert(scans.length <= 5, s"${scans.length} leaf scans:\n$plan")
  }
}
