package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All loads are plain `spark.read.parquet` scans so Catalyst keeps
  * predicate pushdown and column pruning intact — operators downstream
  * filter/select on these DataFrames and the parquet reader sees the
  * pushed filters (`PushedFilters` in `.explain("formatted")`).
  */
object Tables {
  /** The driver table inventory (TESTDATA.md) minus `events`, which needs
    * the timestamp normalization in [[events]]. Single source of truth for
    * accessors and SQL view registration. */
  val plainNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The WAL/changelog stand-in (SURVEY.md §1.3). Column mapping to the
    * reference's WAL schema (`/root/reference/src/main/java/ir/sahab/walconsumer/WalEntity.java:27-46`):
    * `event_id` ↔ `id` (IDENTITY log sequence number — total order is
    * materialized in the data, never generated engine-side),
    * `user_id` ↔ `entity_id`, `event_type` ↔ `operation`,
    * `props` ↔ `entity_bytes` (JSON payload instead of opaque bytes).
    *
    * The parquet stores `ts` as timestamp[ns]; Spark's parquet reader only
    * exposes INT64(TIMESTAMP(NANOS)) via the nanosAsLong legacy conf, so we
    * normalize to TimestampType (truncating ns → µs, which matches what the
    * DuckDB oracle's ms/µs-level functions observe).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Money/measure columns are doubles in the source parquet. Summing raw
    * doubles is addition-order dependent, which breaks hash-equality against
    * the DuckDB oracle. Scale each VALUE to integer cents BEFORE the sum so
    * every aggregate is exact integer math — deterministic under any
    * partitioning/combine order (the 100 TB posture: results must not depend
    * on the shuffle schedule).
    */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 100).cast("long")

  /** SQL-side twin of [[cents]] for oracle queries. */
  def centsSql(e: String): String = s"CAST(ROUND(($e) * 100) AS BIGINT)"

  /** Scale to 1e-4 precision integer (for similarity scores etc.). */
  def scaled4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 10000).cast("long")
  def scaled4Sql(e: String): String = s"CAST(ROUND(($e) * 10000) AS BIGINT)"

  /** Exact floor division on longs, identical in Spark and DuckDB: `%` is
    * C-style truncated remainder in both engines, and removing the
    * positive remainder first makes the quotient exact under any integer
    * division convention (Spark's `/`+cast truncates, DuckDB's `//`
    * truncates — both land on the same already-exact quotient). */
  def fdiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // `div` is Spark's IntegralDivide — the math stays in 64-bit integers
    // end to end. The `/`+cast form it replaces went through double
    // division, exact only while the numerator stayed below 2^53.
    val adjusted = a - (((a % b) + b) % b)
    call_function("div", adjusted, b).cast(LongType)
  }

  /** SQL-side twin of [[fdiv]] for oracle queries. */
  def fdivSql(a: String, b: String): String =
    s"CAST((($a) - (((($a) % ($b)) + ($b)) % ($b))) // ($b) AS BIGINT)"
}
