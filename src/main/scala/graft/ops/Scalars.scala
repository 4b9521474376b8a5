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
        element_at(col("m"), "k").cast(LongType).as("k_val"))
      .orderBy("event_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q12_scalar_str_date" -> q12ScalarStrDate,
    "q13b_map_ops" -> q13bMapOps,
    "q13_json_payload" -> q13JsonPayload,
    "q14_array_ops" -> q14ArrayOps)

  val oracle: Map[String, String] = Map(
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
