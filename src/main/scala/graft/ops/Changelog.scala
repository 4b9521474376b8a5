package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** C1–C6 (SURVEY.md §2.3): the reference's CDC semantics re-expressed as
  * Spark batch operators over the `events` changelog table.
  *
  * Reference semantic roots:
  *  - ordered head consumption: `/root/reference/src/main/java/ir/sahab/walconsumer/WalConsumer.java:240-257`
  *  - keyed ADD/UPDATE/DELETE apply: `/root/reference/src/main/java/ir/sahab/walconsumer/Operation.java:6-10`,
  *    `/root/reference/src/test/java/ir/sahab/walconsumer/WalConsumerTest.java:112-127`
  *  - idempotent replay ("already done"): `WalConsumer.java:271-278`
  *  - backlog count gauge: `WalConsumer.java:322-333`
  *  - not-empty-seconds lag gauge: `WalConsumer.java:89-96`
  *
  * The `event_type` value `"error"` plays the role of the reference's
  * DELETE operation in the snapshot materialization (c1): a key whose
  * LAST op is a delete is absent from the current state.
  *
  * Scale notes (100 TB posture): c1 is an aggregation (`max_by`), NOT a
  * window — a window over partitionBy(user_id) sorts every partition, while
  * max_by gets map-side partial aggregation and a single shuffle of the
  * combined partials. No collect() anywhere; the c5 cutoff is a broadcast
  * scalar, not a driver-side constant.
  */
object Changelog {
  import Tables._

  /** Changelog → current state over any DataFrame with the events schema
    * (user_id, event_id, event_type, value). Shared by the batch query (c1)
    * and tests.
    *
    * Plan shape (verified via explain): partial_max_by runs map-side, so
    * each input partition collapses to ≤1 row per key BEFORE the exchange —
    * at 100 TB the shuffle carries |keys|·|partitions| partial rows, not
    * the log. The struct aggregation buffer forces SortAggregate (local
    * Tungsten sort, spillable) instead of HashAggregate; the alternative
    * argmax-join formulation (hash-agg max(event_id) + join back) would
    * re-shuffle the full log when the key side is too big to broadcast, so
    * max_by is the right plan at scale. */
  def snapshotOf(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"))
      .agg(max_by(struct(col("event_id"), col("event_type"), col("value")), col("event_id")).as("last"))
      .select(
        col("user_id"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_event_type"),
        col("last.value").as("last_value"))
      .filter(col("last_event_type") =!= "error")
      .orderBy("user_id")

  /** c1: changelog → current state. Per key, last op wins; dropped if the
    * last op is the DELETE-analog. */
  def c1Snapshot(spark: SparkSession, dir: String): DataFrame =
    snapshotOf(events(spark, dir))

  /** c2: WAL backlog count (`WalConsumer.java:326`). */
  def c2Backlog(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).agg(count(lit(1)).as("backlog"))

  /** c3: head record — min id (`WalConsumer.java:246` + point lookup :216). */
  def c3Head(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
      .limit(1)

  /** c4: per-key ordered op sequence (validates the ordering invariant the
    * reference gets from serialized head consumption). */
  def c4ApplyOrder(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_ops"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          ",").as("op_seq"))
      .orderBy("user_id")

  /** c5: idempotent-replay detection — which records are still pending vs a
    * per-key applied watermark (records with id ≤ global-max/2 are "applied",
    * simulating a mid-stream checkpoint; `WalConsumer.java:271-278`). */
  def c5Idempotency(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val cutoff = ev.agg(floor(max(col("event_id")) / 2).cast("long").as("c"))
    // One scan + one shuffle: per key, applied_thru = max(id ≤ c), and
    // since nothing lies in (applied_thru, c], pending ≡ id > c and
    // already ≡ id ≤ c. (The oracle keeps the join formulation — an
    // independent derivation that must agree.)
    ev.crossJoin(broadcast(cutoff))
      .groupBy(col("user_id"))
      .agg(
        coalesce(max(when(col("event_id") <= col("c"), col("event_id"))), lit(-1L)).as("applied_thru"),
        sum(when(col("event_id") > col("c"), 1L).otherwise(0L)).as("n_pending"),
        sum(when(col("event_id") <= col("c"), 1L).otherwise(0L)).as("n_already"))
      .orderBy("user_id")
  }

  /** c6: backlog-age / lag metric per operation type
    * (`wal_not_empty_seconds`, `WalConsumer.java:89-96`). */
  def c6Lag(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        (max(unix_millis(col("ts"))) - min(unix_millis(col("ts")))).as("lag_ms"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** x17: funnel analysis over the event log — users progressing through
    * view → click → purchase in log order. Each stage is an aggregation
    * joined back on the key (three shuffles on user_id, re-usable
    * exchange), never a per-user driver loop. */
  def x17Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("user_id"), col("event_id"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("event_id")).as("first_view"))
    val c = ev.join(v, "user_id")
      .filter(col("event_type") === "click" && col("event_id") > col("first_view"))
      .groupBy(col("user_id")).agg(min(col("event_id")).as("first_click"))
    val p = ev.join(c, "user_id")
      .filter(col("event_type") === "purchase" && col("event_id") > col("first_click"))
      .groupBy(col("user_id")).agg(min(col("event_id")).as("first_purchase"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_snapshot" -> c1Snapshot,
    "x17_funnel" -> x17Funnel,
    "c2_backlog" -> c2Backlog,
    "c3_head" -> c3Head,
    "c4_apply_order" -> c4ApplyOrder,
    "c5_idempotency" -> c5Idempotency,
    "c6_lag" -> c6Lag)

  val oracle: Map[String, String] = Map(
    "x17_funnel" ->
      """WITH v AS (SELECT user_id, min(event_id) AS first_view FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.event_id) AS first_click
        |      FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.event_id > v.first_view
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.event_id) AS first_purchase
        |      FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.event_id > c.first_click
        |      GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_view_click,
        |       (SELECT count(*) FROM p) AS n_view_click_purchase""".stripMargin,
    "c1_snapshot" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type, value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,
    "c2_backlog" -> "SELECT count(*) AS backlog FROM events",
    "c3_head" ->
      "SELECT event_id, user_id, event_type, value FROM events ORDER BY event_id LIMIT 1",
    "c4_apply_order" ->
      """SELECT user_id, count(*) AS n_ops, string_agg(event_type, ',' ORDER BY event_id) AS op_seq
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "c5_idempotency" ->
      """WITH cutoff AS (SELECT max(event_id) // 2 AS c FROM events),
        |applied AS (
        |  SELECT user_id, max(event_id) AS applied_thru FROM events, cutoff
        |  WHERE event_id <= c GROUP BY user_id)
        |SELECT e.user_id,
        |       coalesce(a.applied_thru, -1) AS applied_thru,
        |       CAST(sum(CASE WHEN e.event_id > coalesce(a.applied_thru, -1) THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
        |       CAST(sum(CASE WHEN e.event_id <= coalesce(a.applied_thru, -1) THEN 1 ELSE 0 END) AS BIGINT) AS n_already
        |FROM events e LEFT JOIN applied a USING (user_id)
        |GROUP BY e.user_id, coalesce(a.applied_thru, -1)
        |ORDER BY user_id""".stripMargin,
    "c6_lag" ->
      """SELECT event_type, max(epoch_ms(ts)) - min(epoch_ms(ts)) AS lag_ms, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
