package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.model.Tables

/** Q12–Q14 (SURVEY.md §2.3): scalar function surface — string/date
  * functions, JSON payload parsing (the Spark analog of the reference's
  * `entity_bytes` payload decode, `WalConsumerTest.java:106`), and
  * array/map higher-order functions over the embeddings table.
  *
  * Scale notes: everything here is a codegen'd built-in (`functions._`) —
  * no UDFs, so the whole stage stays inside WholeStageCodegen and the
  * scans keep column pruning (q14 reads only vec_id + embedding).
  */
object Scalars {
  import Tables._

  /** q12: string + date scalar functions over orders. */
  def q12ScalarStrDate(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .filter(col("o_orderpriority").like("%URGENT%"))
      .select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 1, 1)).as("prio_code"),
        lower(col("o_orderstatus")).as("status_lc"),
        concat(col("o_orderstatus"), lit("-"), substring(col("o_orderpriority"), 1, 1)).as("tag"),
        length(col("o_orderpriority")).cast(LongType).as("prio_len"),
        year(col("o_orderdate")).cast(LongType).as("y"),
        month(col("o_orderdate")).cast(LongType).as("m"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("d"))
      .orderBy("o_orderkey")

  /** q13: JSON payload parse — the `props` column is the changelog payload
    * (reference: opaque `entity_bytes` decoded in the sink callback). */
  def q13JsonPayload(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast(LongType).as("k"), col("value"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
      .orderBy("k_mod")

  /** q14: array higher-order functions over `embeddings.embedding`
    * (`transform` + `aggregate` compute the squared L2 norm without any
    * UDF; elements cast to double BEFORE arithmetic to match the oracle). */
  def q14ArrayOps(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).cast(LongType).as("dim"),
        scaled4(aggregate(
          transform(col("embedding"), x => x.cast("double")),
          lit(0.0),
          (acc, x) => acc + x * x)).as("norm_sq_s4"),
        scaled4(element_at(col("embedding"), 1).cast("double")).as("first_s4"),
        col("label").cast(LongType).as("label"))
      .orderBy("vec_id")

  /** q13b: payload as a MAP — `from_json` to MapType + map higher-order
    * surface (map_keys / element access), the dynamic-payload path when
    * the JSON schema isn't fixed. */
  def q13bMapOps(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)).as("m"))
      .select(col("event_id"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys"),
        size(map_keys(col("m"))).cast(LongType).as("n_keys"),
        // try_element_at: missing key → NULL (matches the oracle's
        // json_extract_string) instead of ANSI NoSuchElementException
        try_element_at(col("m"), lit("k")).cast(LongType).as("k_val"))
      .orderBy("event_id")

  /** q12b: wider string-function surface (regexp_replace, pads, trim,
    * split_part, repeat/reverse/replace, prefix tests) — all codegen'd
    * built-ins with identical semantics in the DuckDB oracle. */
  def q12bStrings(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(
        col("o_orderkey"),
        regexp_replace(col("o_orderpriority"), "[0-9]+", "#").as("prio_masked"),
        lpad(col("o_orderkey").cast("string"), 10, "0").as("key_padded"),
        rpad(col("o_orderstatus"), 3, ".").as("status_padded"),
        trim(concat(lit("  "), col("o_orderstatus"), lit("  "))).as("status_trimmed"),
        expr("split_part(o_orderpriority, '-', 2)").as("prio_word"),
        reverse(col("o_orderstatus")).as("status_rev"),
        repeat(col("o_orderstatus"), 2).as("status_x2"),
        regexp_replace(col("o_orderpriority"), "-", "_").as("prio_underscored"),
        col("o_orderpriority").startsWith("1").cast("int").cast(LongType).as("is_top"),
        col("o_orderpriority").contains("URGENT").cast("int").cast(LongType).as("is_urgent"))
      .orderBy("o_orderkey")

  /** q12c: wider date/time surface over event time. */
  def q12cDates(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(
        col("event_id"),
        quarter(col("ts")).cast(LongType).as("q"),
        weekofyear(col("ts")).cast(LongType).as("woy"),
        hour(col("ts")).cast(LongType).as("h"),
        minute(col("ts")).cast(LongType).as("mi"),
        unix_millis(date_trunc("day", col("ts"))).as("day_ms"),
        unix_millis(last_day(col("ts")).cast("timestamp")).as("month_end_ms"))
      .orderBy("event_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q12_scalar_str_date" -> q12ScalarStrDate,
    "q12b_strings" -> q12bStrings,
    "q12c_dates" -> q12cDates,
    "q13b_map_ops" -> q13bMapOps,
    "q13_json_payload" -> q13JsonPayload,
    "q14_array_ops" -> q14ArrayOps)

  val oracle: Map[String, String] = Map(
    "q12b_strings" ->
      """SELECT o_orderkey,
        |  regexp_replace(o_orderpriority, '[0-9]+', '#', 'g') AS prio_masked,
        |  lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_padded,
        |  rpad(o_orderstatus, 3, '.') AS status_padded,
        |  trim('  ' || o_orderstatus || '  ') AS status_trimmed,
        |  split_part(o_orderpriority, '-', 2) AS prio_word,
        |  reverse(o_orderstatus) AS status_rev,
        |  repeat(o_orderstatus, 2) AS status_x2,
        |  regexp_replace(o_orderpriority, '-', '_', 'g') AS prio_underscored,
        |  CAST(CASE WHEN starts_with(o_orderpriority, '1') THEN 1 ELSE 0 END AS BIGINT) AS is_top,
        |  CAST(CASE WHEN contains(o_orderpriority, 'URGENT') THEN 1 ELSE 0 END AS BIGINT) AS is_urgent
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q12c_dates" ->
      """SELECT event_id,
        |  CAST(quarter(ts) AS BIGINT) AS q,
        |  CAST(weekofyear(ts) AS BIGINT) AS woy,
        |  CAST(hour(ts) AS BIGINT) AS h,
        |  CAST(minute(ts) AS BIGINT) AS mi,
        |  epoch_ms(date_trunc('day', ts)) AS day_ms,
        |  epoch_ms(CAST(last_day(ts) AS TIMESTAMP)) AS month_end_ms
        |FROM events ORDER BY event_id""".stripMargin,
    "q13b_map_ops" ->
      """SELECT event_id,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys,
        |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "q12_scalar_str_date" ->
      """SELECT o_orderkey,
        |  upper(substring(o_orderpriority, 1, 1)) AS prio_code,
        |  lower(o_orderstatus) AS status_lc,
        |  o_orderstatus || '-' || substring(o_orderpriority, 1, 1) AS tag,
        |  CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d
        |FROM orders WHERE o_orderpriority LIKE '%URGENT%'
        |ORDER BY o_orderkey""".stripMargin,
    "q13_json_payload" ->
      s"""SELECT k % 10 AS k_mod, count(*) AS n, CAST(sum(${centsSql("value")}) AS BIGINT) AS value_c
         |FROM (SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k, value FROM events)
         |GROUP BY k % 10 ORDER BY k_mod""".stripMargin,
    "q14_array_ops" ->
      s"""SELECT vec_id,
         |  CAST(len(embedding) AS BIGINT) AS dim,
         |  ${scaled4Sql("list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")} AS norm_sq_s4,
         |  ${scaled4Sql("CAST(embedding[1] AS DOUBLE)")} AS first_s4,
         |  CAST(label AS BIGINT) AS label
         |FROM embeddings ORDER BY vec_id""".stripMargin)
}
