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

  /** SCD2 version intervals over any DataFrame with the events schema —
    * shared by c7 (the interval table), c8 (as-of reconstruction) and
    * tests. Every log record opens a version valid from its own
    * `event_id` until the key's next record (`-1` = still open); a
    * DELETE-analog record closes its predecessor but contributes no
    * visible version itself (filtered by the CALLER so c8 can still see
    * tombstone boundaries through interval arithmetic alone).
    *
    * Plan shape: ONE keyed window (partitionBy user_id, orderBy event_id)
    * — a single shuffle on the key plus a per-key sort, the same cost
    * class as the snapshot aggregate. At 100 TB the window never sees a
    * global sort; each key's history sorts locally within its shuffle
    * partition. */
  def scd2Of(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("valid_from_id"))
    ev.select(
        col("user_id"),
        col("event_id").as("valid_from_id"),
        unix_millis(col("ts")).as("valid_from_ms"),
        col("event_type").as("op"),
        col("value"))
      .withColumn("valid_to_id", coalesce(lead(col("valid_from_id"), 1).over(w), lit(-1L)))
      .withColumn("is_current", when(col("valid_to_id") === -1L, 1L).otherwise(0L))
  }

  /** c7: changelog → SCD2 dimension (type-2 slowly-changing history).
    * The reference materializes only the CURRENT state (c1); the interval
    * table is the warehouse form that answers "state as of ANY time T"
    * without rescanning the log — c8 reads it with pure interval
    * arithmetic. Delete-op rows close their predecessor's interval and
    * are absent from the output, so a key whose last op is the
    * DELETE-analog has no current version (c1 parity, pinned in OpsSpec). */
  def c7Scd2(spark: SparkSession, dir: String): DataFrame =
    scd2Of(events(spark, dir))
      .filter(col("op") =!= "error")
      .select(col("user_id"), col("valid_from_id"), col("valid_to_id"),
        col("valid_from_ms"), col("op"), col("value"), col("is_current"))
      .orderBy("user_id", "valid_from_id")

  /** c8: state as of a fixed log position, answered FROM the SCD2
    * intervals — the version covering T is `valid_from ≤ T < valid_to`
    * (open intervals cover everything after their start). T = global
    * max(event_id)/2, the same mid-log checkpoint c5 uses; the result
    * must equal c1's snapshot over the truncated log (pinned in OpsSpec).
    * The cutoff is a broadcast scalar, not a driver constant. */
  def c8AsofTime(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val cutoff = ev.agg(floor(max(col("event_id")) / 2).cast("long").as("c"))
    scd2Of(ev)
      .crossJoin(broadcast(cutoff))
      .filter(col("valid_from_id") <= col("c") &&
        (col("valid_to_id") === -1L || col("valid_to_id") > col("c")) &&
        col("op") =!= "error")
      .select(col("user_id"), col("valid_from_id").as("asof_event_id"),
        col("op").as("asof_op"), col("value").as("asof_value"))
      .orderBy("user_id")
  }

  /** c9: WAL log compaction — the retention pass that keeps a changelog
    * replayable while bounding it to O(keys): per entity only the LATEST
    * record survives, INCLUDING the delete-analog as a tombstone (unlike
    * the c1 snapshot, which APPLIES deletes and drops the key — a
    * compacted log must still tell a late-joining consumer the key was
    * deleted; Kafka's compacted topics are the canonical form of this
    * contract). Emits the surviving record plus `n_superseded`, the rows
    * compaction reclaimed — the number a retention job reports.
    *
    * Plan shape (100 TB posture): ONE map-side-combinable aggregate —
    * struct-max with the unique event_id leading the struct, so max ==
    * argmax deterministically, and the count rides the same pass. Same
    * single-exchange cost class as c1's max_by: the shuffle carries one
    * partial row per (key × input partition), never the log; no window,
    * no join-back. */
  def c9Compact(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(struct(col("event_id"), col("event_type"), col("value"))).as("last"),
        count(lit(1)).as("n_rows"))
      .select(col("user_id"),
        col("last.event_id").as("event_id"),
        col("last.event_type").as("op"),
        col("last.value").as("value"),
        (col("n_rows") - 1).as("n_superseded"))
      .orderBy("user_id")

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
    "c6_lag" -> c6Lag,
    "c7_scd2" -> c7Scd2,
    "c8_asof_time" -> c8AsofTime,
    "c9_compact" -> c9Compact)

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
    "c9_compact" ->
      """SELECT user_id, event_id, event_type AS op, value,
        |  CAST(n_rows - 1 AS BIGINT) AS n_superseded
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn,
        |             count(*) OVER (PARTITION BY user_id) AS n_rows FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
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
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "c7_scd2" ->
      """SELECT user_id, event_id AS valid_from_id,
        |       coalesce(lead(event_id) OVER w, -1) AS valid_to_id,
        |       epoch_ms(ts) AS valid_from_ms,
        |       event_type AS op, value,
        |       CAST(CASE WHEN lead(event_id) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |QUALIFY event_type <> 'error'
        |ORDER BY user_id, valid_from_id""".stripMargin,
    "c8_asof_time" ->
      """WITH cutoff AS (SELECT max(event_id) // 2 AS c FROM events),
        |v AS (SELECT user_id, event_id AS valid_from_id,
        |             coalesce(lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id), -1) AS valid_to_id,
        |             event_type, value
        |      FROM events)
        |SELECT v.user_id, v.valid_from_id AS asof_event_id,
        |       v.event_type AS asof_op, v.value AS asof_value
        |FROM v, cutoff
        |WHERE v.valid_from_id <= c AND (v.valid_to_id = -1 OR v.valid_to_id > c)
        |  AND v.event_type <> 'error'
        |ORDER BY user_id""".stripMargin)
}
