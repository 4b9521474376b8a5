package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** asofJoin correctness vs a brute-force formulation (join + argmax). */
class AsofJoinSpec extends SparkTestBase {

  test("asofJoin == brute-force latest-right-row-at-or-before") {
    val s = spark
    import s.implicits._
    // left: orders per user at time t; right: price quotes per user
    val left = Seq(
      (1L, 10L, "o1"), (1L, 20L, "o2"), (2L, 15L, "o3"), (3L, 5L, "o4"))
      .toDF("uid", "t", "order_id")
    val right = Seq(
      (1L, 5L, 100.0), (1L, 10L, 110.0), (1L, 18L, 120.0),
      (2L, 14L, 200.0), (2L, 16L, 210.0))
      .toDF("uid", "t", "price")

    val got = Windows.asofJoin(left, right, "uid", "t", Seq("price"))
      .select("uid", "t", "order_id", "asof_price")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet

    val expected = Set(
      (1L, 10L, "o1", Some(110.0)), // quote AT t=10 visible (right wins tie)
      (1L, 20L, "o2", Some(120.0)),
      (2L, 15L, "o3", Some(200.0)),
      (3L, 5L, "o4", None)) // no quote for uid=3
    assert(got == expected)
  }

  test("asofJoin keeps a latest right row whose value is NULL (no stale carry-forward)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, "o1")).toDF("uid", "t", "order_id")
    val right = Seq((1L, 5L, Some(100.0)), (1L, 8L, Option.empty[Double]))
      .toDF("uid", "t", "price")
    val row = Windows.asofJoin(left, right, "uid", "t", Seq("price"))
      .select("uid", "asof_price").collect()(0)
    // the latest right row (t=8) has price NULL — it must NOT be skipped in
    // favor of the older t=5 row
    assert(row.isNullAt(1), s"expected NULL from the t=8 row, got ${row.get(1)}")
  }

  test("asofJoin on driver data matches brute force") {
    val s = spark
    val ev = graft.model.Tables.events(s, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("t"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("t"), col("event_id").as("view_id"))

    val got = Windows.asofJoin(purchases, views, "user_id", "t", Seq("view_id"))
      .select(col("user_id"), col("t"), coalesce(col("asof_view_id"), lit(-1L)).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val brute = purchases.as("p")
      .join(views.as("v"), col("p.user_id") === col("v.user_id") && col("v.t") <= col("p.t"), "left")
      .groupBy(col("p.user_id").as("user_id"), col("p.t").as("t"))
      .agg(coalesce(max(col("v.view_id")), lit(-1L)).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(got == brute)
  }
}
