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
}
