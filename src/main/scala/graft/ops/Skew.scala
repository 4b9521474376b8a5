package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Skew mitigation utilities (100 TB posture). AQE's skew-join splitting
  * handles join-side skew at runtime; these helpers cover AGGREGATION
  * skew, where one hot key (the null user, the default tenant, the bot
  * account) funnels a whole partition through one task.
  *
  * The two-phase salted aggregate is exact for any commutative+associative
  * aggregate: phase 1 groups by (key, salt) so the hot key's rows spread
  * over `buckets` tasks; phase 2 merges the per-salt partials. Spark
  * already does map-side partial aggregation INSIDE a partition — salting
  * additionally spreads a hot key across the SHUFFLE, which partials
  * cannot do. */
object Skew {

  /** Exact salted sum+count per key, emitted as (k, total, n).
    *
    * The salt MUST be deterministic per row: a nondeterministic salt
    * (rand, monotonically_increasing_id) re-routes rows differently when
    * a shuffle map task is retried after executor loss, silently
    * duplicating/losing partials (the SPARK-23207 failure class). Pass a
    * stable discriminator column (an id, a timestamp) as `saltFrom`; by
    * default the salt hashes the value column, which is retry-safe but
    * collapses to one bucket if the hot key's values are all identical —
    * prefer an explicit unique `saltFrom` when one exists. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      buckets: Int = 32, saltFrom: Option[Column] = None): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltFrom.getOrElse(value)), lit(buckets.toLong)))
    salted
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(value).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))
  }

  /** q23: the salted aggregate wired into the query surface — quantity
    * totals per l_returnflag, a 3-distinct-value key where EVERY key is
    * hot (each funnels ~1/3 of the fact table through one reducer in
    * the naive plan). The two-phase plan spreads each key over 32 salt
    * buckets in phase 1; phase 2 merges 3·32 partial rows. Exactness:
    * sum/count are commutative+associative over the scaled-int values,
    * so the result is identical to the direct aggregate the oracle
    * runs — the DETERMINISTIC per-row salt (l_orderkey, see
    * [[saltedSumCount]]'s retry-safety note) just re-routes partials. */
  def q23SkewAgg(spark: SparkSession, dir: String): DataFrame =
    saltedSumCount(
      Tables.lineitem(spark, dir),
      key = col("l_returnflag"),
      value = Tables.cents(col("l_quantity")),
      saltFrom = Some(col("l_orderkey")))
      .orderBy("k")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_skew_agg" -> q23SkewAgg)

  val oracle: Map[String, String] = Map(
    "q23_skew_agg" ->
      s"""SELECT l_returnflag AS k,
         |  CAST(sum(${Tables.centsSql("l_quantity")}) AS BIGINT) AS total,
         |  count(*) AS n
         |FROM lineitem GROUP BY 1 ORDER BY k""".stripMargin)
}
