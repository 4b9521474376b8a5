package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Exact salted sum/count per key. `aggs` are (inputColumn → alias)
    * sum-aggregates; extend with min/max/etc. the same way. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      buckets: Int = 32): DataFrame = {
    // monotonically_increasing_id already encodes (partitionId << 33 | offset),
    // so pmod over it alone spreads a hot key across buckets
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(buckets)))
    salted
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(value).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))
  }
}
