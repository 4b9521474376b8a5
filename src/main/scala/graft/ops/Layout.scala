package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.model.Tables
import graft.model.Tables._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * x47 is the Z-order (Morton, 1966) layout member: interleave the bits
  * of two normalized dimensions so that a range box in EITHER dimension
  * maps to a bounded set of curve ranges — the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, re-expressed as a first-class
  * relational operator. A single-column sort prunes only its leading
  * dimension; the interleaved curve gives every dimension ~half the bit
  * positions, so per-file min/max footers stay tight on BOTH dims and a
  * 2-D box skips most files.
  *
  * The registered query reports the quadtree cells the curve induces —
  * per-cell extents ARE the per-file footer stats a lakehouse metadata
  * layer would consult — plus whether the canonical probe box intersects
  * each cell (`box_hit`): Σ(1−box_hit)/cells is exactly the skippable
  * fraction. The file-level claim (write z-ordered files, count files
  * whose [min,max]² footer overlaps the box, vs a linear time-sorted
  * layout) is measured in LayoutSpec via [[zorderWrite]].
  *
  * Scale notes (100 TB posture): z-value computation is a per-row
  * codegen'd projection (shifts and masks, no UDF); normalization bounds
  * come from one min/max aggregate broadcast back as a 1-row frame; the
  * cell rollup is a map-side-combinable 64-group aggregate. The write
  * path is `repartitionByRange` on the z-value — the same single range
  * shuffle any sorted write pays, so z-order costs nothing extra over a
  * linear sort at any scale. */
object Layout {
  /** Per-dimension normalized resolution (bits). */
  val x47Bits = 16
  /** Quadtree cell resolution: top 3 bits per dim → 8×8 = 64 cells. */
  val x47CellBits = 3

  private val maxN = (1L << x47Bits) - 1 // 65535

  /** Canonical probe box in normalized coords: users in the low quarter,
    * time in the middle half — 12.5% of the plane. */
  val boxULo = 0L
  val boxUHi = (1L << x47Bits) / 4 - 1
  val boxTLo = (1L << x47Bits) / 4
  val boxTHi = 3 * (1L << x47Bits) / 4 - 1

  private val spreadSteps = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Spread a 16-bit value onto the even bit positions of a 32-bit value
    * (the classic magic-mask Morton dilation) — pure shifts and masks,
    * whole-stage codegen'd. */
  def spread16(c: Column): Column =
    spreadSteps.foldLeft(c.bitwiseAND(lit(maxN))) { case (x, (sh, m)) =>
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(m))
    }

  /** SQL twin of [[spread16]] for the DuckDB oracle. */
  def spread16Sql(e0: String): String =
    spreadSteps.foldLeft(s"(($e0) & $maxN)") { case (e, (sh, m)) =>
      s"((($e) | (($e) << $sh)) & $m)"
    }

  /** 32-bit Morton z-value of two 16-bit normalized dims. */
  def zValue(uN: Column, tN: Column): Column =
    spread16(uN).bitwiseOR(shiftleft(spread16(tN), 1))

  def zValueSql(uN: String, tN: String): String =
    s"(${spread16Sql(uN)} | (${spread16Sql(tN)} << 1))"

  /** Normalize `c` from [lo, hi] to [0, 2^16−1] in exact integer math. */
  private def norm(c: Column, lo: Column, hi: Column): Column =
    fdiv((c - lo) * maxN, greatest(hi - lo, lit(1L)))

  private def normSql(c: String, lo: String, hi: String): String =
    fdivSql(s"(($c) - ($lo)) * $maxN", s"greatest(($hi) - ($lo), 1)")

  private val cellShift = 2 * x47Bits - 2 * x47CellBits

  /** x47: Z-order layout report over `events` on (user_id, ts) — the
    * 64 quadtree cells the curve induces, each with its row count, its
    * normalized min/max extents on both dims (the per-file footer stats
    * of the layout), and whether the canonical probe box touches it.
    * Cells with box_hit=0 are exactly the files a metadata layer skips. */
  def x47Zorder(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("user_id").cast(LongType).as("u"), unix_millis(col("ts")).as("t"))
    val ext = e.agg(min("u").as("ulo"), max("u").as("uhi"),
      min("t").as("tlo"), max("t").as("thi"))
    e.crossJoin(broadcast(ext))
      .select(norm(col("u"), col("ulo"), col("uhi")).as("un"),
        norm(col("t"), col("tlo"), col("thi")).as("tn"))
      .withColumn("cell", shiftright(zValue(col("un"), col("tn")), cellShift))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_events"),
        min("un").as("u_min"), max("un").as("u_max"),
        min("tn").as("t_min"), max("tn").as("t_max"))
      .withColumn("box_hit",
        when(col("u_min") <= boxUHi && col("u_max") >= boxULo &&
          col("t_min") <= boxTHi && col("t_max") >= boxTLo, 1L).otherwise(0L))
      .select(col("cell"), col("n_events"), col("u_min"), col("u_max"),
        col("t_min"), col("t_max"), col("box_hit"))
      .orderBy("cell")
  }

  /** Write `df` clustered by the z-order of (`c1`, `c2`) into `files`
    * range partitions: ONE range shuffle on the z-value, files sorted
    * within — per-file min/max footers tight on both dims. Bounds for
    * normalization come from one min/max aggregate (collected — four
    * scalars, not rows). */
  def zorderWrite(df: DataFrame, c1: String, c2: String, files: Int, path: String): Unit = {
    val r = df.agg(min(col(c1).cast(LongType)).as("alo"), max(col(c1).cast(LongType)).as("ahi"),
      min(col(c2).cast(LongType)).as("blo"), max(col(c2).cast(LongType)).as("bhi")).head()
    val (alo, ahi, blo, bhi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val z = zValue(
      norm(col(c1).cast(LongType), lit(alo), lit(ahi)),
      norm(col(c2).cast(LongType), lit(blo), lit(bhi)))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x47_zorder" -> x47Zorder)

  val oracle: Map[String, String] = Map(
    "x47_zorder" -> {
      val un = normSql("u", "ulo", "uhi")
      val tn = normSql("t", "tlo", "thi")
      s"""WITH e AS (SELECT CAST(user_id AS BIGINT) AS u, epoch_ms(ts) AS t FROM events),
         |ext AS (SELECT min(u) AS ulo, max(u) AS uhi, min(t) AS tlo, max(t) AS thi FROM e),
         |n AS (SELECT $un AS un, $tn AS tn FROM e, ext),
         |c AS (SELECT (${zValueSql("un", "tn")} >> $cellShift) AS cell, un, tn FROM n)
         |SELECT cell, CAST(count(*) AS BIGINT) AS n_events,
         |  min(un) AS u_min, max(un) AS u_max, min(tn) AS t_min, max(tn) AS t_max,
         |  CAST(CASE WHEN min(un) <= $boxUHi AND max(un) >= $boxULo
         |    AND min(tn) <= $boxTHi AND max(tn) >= $boxTLo THEN 1 ELSE 0 END AS BIGINT) AS box_hit
         |FROM c GROUP BY cell ORDER BY cell""".stripMargin
    })
}
