package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.model.Tables

/** Q7, Q8, Q16 (SURVEY.md §2.3): window functions — ranking, analytic
  * frames, and the as-of join (a generalization of the reference's
  * last-op-wins snapshot, `WalConsumerTest.java:112-127`).
  *
  * Scale notes: every Window here has a real partitionBy key (never empty
  * — an empty partitionBy funnels 100 TB through one task). As-of (q16) is
  * the running-max-over-frame formulation: one shuffle on the key, no
  * self-join, no per-row point lookups.
  */
object Windows {
  import Tables._

  /** q7: ranking window functions — top 3 orders per customer by price.
    * Ties broken by o_orderkey so ranks are deterministic. */
  def q7WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** q7b: distribution + navigation window functions (ntile,
    * percent_rank, cume_dist, first/last/nth value, lead) per customer.
    * percent_rank/cume_dist are single divisions of integers — bit-equal
    * across engines; emitted 1e-4-scaled. */
  def q7bWindowMore(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        scaled4(percent_rank().over(w)).as("pr_s4"),
        scaled4(cume_dist().over(w)).as("cd_s4"),
        first(col("o_orderkey")).over(wf).as("best_order"),
        last(col("o_orderkey")).over(wf).as("worst_order"),
        coalesce(nth_value(col("o_orderkey"), 2).over(wf), lit(-1L)).as("second_order"),
        coalesce(lead(col("o_orderkey"), 1).over(w), lit(-1L)).as("next_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q8: analytic frame — per-user running sum + lag over the event log. */
  def q8WindowFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("event_id"),
        sum(cents(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("running_c"),
        coalesce(lag(col("event_id"), 1).over(w), lit(-1L)).as("prev_event_id"))
      .orderBy("user_id", "event_id")
  }

  /** q16: as-of join — for each purchase, the latest prior 'view' event of
    * the same user. Expressed as a running conditional max over an ordered
    * frame: no self-join, single shuffle on user_id. */
  def q16Asof(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .withColumn("prior_view_id",
        coalesce(max(when(col("event_type") === "view", col("event_id"))).over(w), lit(-1L)))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("prior_view_id"))
      .orderBy("event_id")
  }

  /** Generic two-table as-of join: for every left row, attach the latest
    * right row with the same key and right.time ≤ left.time (ties: right
    * wins, i.e. a right row AT the left timestamp is visible).
    *
    * Composition, not a custom operator (the preference order in the build
    * brief): tag sides → union → one window over (key, time, side) → keep
    * left rows. One shuffle on the key, no per-row lookups, no self-join —
    * the plan a 100 TB as-of needs. `rightValues` are the right-side
    * columns to carry (emitted as `asof_<name>`, null when no right row
    * precedes). Null contract (same as the native operator): a null key
    * or time on either side never matches; left rows always come out. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightValues: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val rstructType = org.apache.spark.sql.types.StructType(
      rightValues.map(c => right.schema(c)))
    // the right row travels as ONE struct: last(ignoreNulls) then skips
    // left-row placeholders but keeps right rows whose individual VALUES
    // are null, and can never mix columns from different right rows
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rstructType))
      .select(Seq(col(key), col(time), col("__side"), col("__r")) ++
        leftCols.filterNot(c => c == key || c == time).map(col): _*)
    // null key/time on the right never matches (SQL join-key semantics) —
    // the same contract the native operator (graft.plans.AsofJoinExec)
    // pins; without this filter a null-keyed right row would pool with
    // null-keyed left rows in one window partition and "match" them
    val r = right
      .filter(col(key).isNotNull && col(time).isNotNull)
      .withColumn("__side", lit(0))
      .withColumn("__r", struct(rightValues.map(col): _*))
      .select(Seq(col(key), col(time), col("__side"), col("__r")) ++
        leftCols.filterNot(c => c == key || c == time)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // __r in the sort key totalizes the order among right rows that tie on
    // (time): the greatest payload wins deterministically run-to-run
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key), col(time)) ++
        leftCols.filterNot(c => c == key || c == time).map(col) ++
        rightValues.map(c => col(s"__last.$c").as(s"asof_$c")): _*)
  }

  /** Native-operator twin of [[asofJoin]]: same output contract
    * (left columns + `asof_<name>` payload columns, null when no right row
    * qualifies), executed by the custom Catalyst operator
    * [[graft.plans.AsofJoinPlan]] instead of union+window. One clustered
    * shuffle per side, partition-local forward-merge, no row expansion —
    * see the scale notes on the plan node. Falls back to nothing: the
    * strategy is installed idempotently on the session. Composite keys:
    * pass ONE struct column (`struct(col("a"), col("b"))` on both sides) —
    * structs hash-partition and order end to end (pinned in
    * AsofPlanSpec). */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String, time: String,
      rightValues: Seq[String]): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = left.sparkSession
    graft.plans.AsofJoin.install(spark)
    val lPlan = GraftBridge.analyzed(left)
    val rPlan0 = GraftBridge.analyzed(right)
    // Self-joins (the common as-of case: one changelog against itself)
    // surface the same AttributeReferences on both sides; re-alias the
    // right side so every reference in the node is unambiguous.
    val (rPlan, rOut: Seq[Attribute]) =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) (rPlan0, rPlan0.output)
      else {
        val aliases = rPlan0.output.map(a => Alias(a, a.name)())
        (Project(aliases, rPlan0), aliases.map(_.toAttribute))
      }
    def lAttr(n: String) = lPlan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"left side has no column '$n'"))
    def rAttr(n: String) = rOut.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"right side has no column '$n'"))
    val payload = rightValues.map(rAttr)
    val asofOut = payload.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    GraftBridge.ofRows(spark, graft.plans.AsofJoinPlan(
      lPlan, rPlan, lAttr(key), lAttr(time), rAttr(key), rAttr(time), payload, asofOut))
  }

  /** q16b: q16's as-of semantics through the NATIVE operator
    * ([[graft.plans.AsofJoinExec]]) — purchases as-of joined to the latest
    * prior view per user, ordered by the event log sequence. Same oracle
    * as q16; AsofPlanSpec additionally pins q16b == q16 row-for-row. */
  def q16bAsofNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"))
    asofJoinNative(purchases, views, "user_id", "event_id", Seq("event_id"))
      .select(col("event_id"), col("user_id"),
        coalesce(col("asof_event_id"), lit(-1L)).as("prior_view_id"))
      .orderBy("event_id")
  }

  /** q31: time-series densify + gap fill — the metrics-warehouse staple
    * missing from plain SQL: give every user a DENSE daily series over
    * their own active span (calendar days with no events appear as
    * rows), carrying the last observed daily total forward across the
    * gaps (LOCF). Forward-fill is `last(day_c) IGNORE NULLS` over the running
    * frame — ONE Window node under one user exchange. The ORACLE keeps
    * the fill-group formulation (grp = running count of OBSERVED days,
    * then max per (user, grp)) — the portable twin for engines whose
    * window functions lack IGNORE NULLS; the two are identity-equal
    * because each fill group holds exactly one observed day. The span
    * starts at the user's first observed day, so the first row is
    * always observed and the output has no nulls.
    *
    * Plan shape at 100 TB: the only corpus-sized shuffle is the
    * (user, day) daily rollup — map-side combinable. The span aggregate,
    * grid explode (≤ span days per user), join-back, and the single
    * window are all user-keyed, and no window ever sees an empty
    * partitionBy. Grid rows are bounded by users × days — a
    * metadata-sized frame next to the event corpus. */
  def q31Gapfill(spark: SparkSession, dir: String): DataFrame = {
    // null-valued events don't count as observed days (the q29/s13
    // defensive filter): without it, a regenerated corpus where a
    // user's FIRST day is all-null would put a null into filled_c
    val daily = events(spark, dir)
      .filter(col("value").isNotNull)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).cast("date").as("d"))
      .agg(sum(cents(col("value"))).as("day_c"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
    val joined = grid.join(daily, Seq("user_id", "d"), "left")
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .select(col("user_id"), col("d").cast("string").as("day"),
        last(col("day_c"), ignoreNulls = true).over(wRun).as("filled_c"),
        when(col("day_c").isNull, 1L).otherwise(0L).as("is_gap"))
      .orderBy("user_id", "day")
  }

  /** Minimum prior-day baseline before q32 will flag anything: with
    * fewer observations the variance estimate is noise (m = 1 would
    * flag ANY change). Mirrored in the oracle. */
  val q32MinBaseline = 3L

  /** q32: trailing-window anomaly detection over the per-type daily
    * event count series — the operational-monitoring staple ("did
    * clicks spike 3σ above their trailing week?"). The z² test runs in
    * EXACT integer arithmetic so the flag is hash-gateable: with m
    * PRIOR observations of sum S and sum-of-squares Q, population
    * z² > 9  ⟺  (m·x − S)² > 9·(m·Q − S²), no doubles anywhere.
    *
    * The baseline frame is the 7 PRIOR days (rowsBetween(-7, -1)), not
    * the trailing week including today: with the current row inside its
    * own baseline, a lone outlier among m points caps at
    * z = √(m−1) ≈ 2.45 and a 3σ test can never fire — the textbook
    * self-masking mistake. A σ = 0 baseline flags any deviation
    * (dev² > 0), which is the right call for a constant series.
    *
    * Scale notes (100 TB posture): the daily rollup is one map-side-
    * combinable count whose output is |types|×|days| — tiny however big
    * the event log; the window then runs on that tiny frame (one
    * exchange on event_type). Nothing downstream of the first aggregate
    * ever sees raw events. */
  def q32Anomaly(spark: SparkSession, dir: String): DataFrame =
    q32AnomalyOn(events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").cast("string").as("day"))
      .agg(count(lit(1)).as("n")))

  /** [[q32Anomaly]]'s verdict over any (event_type, day ISO-string, n)
    * daily frame — shared with the streaming twin s15, whose state-store
    * fold produces exactly this table (ISO day strings order
    * chronologically, so the string orderBy is the date orderBy). */
  private[graft] def q32AnomalyOn(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    // The z² products run in decimal(38,0), not int64: long arithmetic
    // wraps silently (non-ANSI) once per-type daily counts pass ~4e8
    // (m·Q ≈ 49n²), exactly the 100 TB regime — decimal keeps the test
    // exact to n ≈ 1.4e18/day/type, past any physical event rate.
    // Output columns stay long so the gate schema is unchanged.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val nD = col("n").cast(dec)
    daily
      .select(col("event_type"), col("day"), col("n"),
        count(lit(1)).over(w).as("m"),
        coalesce(sum(col("n")).over(w), lit(0L)).as("s_prior"),
        coalesce(sum(nD * nD).over(w), lit(0L).cast(dec)).as("q_dec"))
      .withColumn("s_dec", col("s_prior").cast(dec))
      .withColumn("dev", col("m").cast(dec) * nD - col("s_dec"))
      .select(col("event_type"), col("day"), col("n"), col("m"), col("s_prior"),
        when(col("m") >= q32MinBaseline &&
          col("dev") * col("dev") > lit(9L) * (col("m").cast(dec) * col("q_dec") - col("s_dec") * col("s_dec")),
          1L).otherwise(0L).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** q33 bar width: 6-hour bars over the event log (ms). */
  val q33BarMs = 21600000L

  /** q33: OHLC resampling — the time-series downsample every metrics
    * store runs: per (event_type, 6-hour bar) the opening/closing value
    * (first/last by the (ts, event_id) total order), the high/low, and
    * the count/volume. Open/close come from two row_number orderings
    * over ONE (type, bar) exchange (both windows share the partition
    * spec, so Spark plans one shuffle, two sorts); values are cents
    * scaled-ints throughout so every cell hash-gates.
    *
    * Scale notes (100 TB posture): the exchange is keyed (type, bar) —
    * the same partitioning a bar-store write wants, so the sort is the
    * only cost over a plain rollup; high/low/count/volume are map-side
    * combinable and ride the same aggregate. At extreme bar
    * cardinality, open/close can switch to a single min/max-of-struct
    * aggregate (no sort at all) — kept as windows here so the oracle
    * tiebreak (ts, then event_id) is mirrored literally. */
  def q33Resample(spark: SparkSession, dir: String): DataFrame = {
    val base = events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), unix_millis(col("ts")).as("ms"), col("event_id"),
        cents(col("value")).as("v"))
      .withColumn("bkt", floor(col("ms") / q33BarMs).cast("long"))
    val wAsc = Window.partitionBy(col("event_type"), col("bkt"))
      .orderBy(col("ms"), col("event_id"))
    val wDesc = Window.partitionBy(col("event_type"), col("bkt"))
      .orderBy(col("ms").desc, col("event_id").desc)
    base
      .withColumn("rn1", row_number().over(wAsc))
      .withColumn("rn2", row_number().over(wDesc))
      .groupBy(col("event_type"), col("bkt"))
      .agg(max(when(col("rn1") === 1, col("v"))).as("open"),
        max(col("v")).as("high"), min(col("v")).as("low"),
        max(when(col("rn2") === 1, col("v"))).as("close"),
        count(lit(1)).as("n"), sum(col("v")).as("vol"))
      .select(col("event_type"), (col("bkt") * q33BarMs).as("bar_start_ms"),
        col("open"), col("high"), col("low"), col("close"), col("n"), col("vol"))
      .orderBy("event_type", "bar_start_ms")
  }

  /** x59 segment count for the Cauchy–Schwarz lower bound. */
  private val x59Segs = 6

  /** Segment-sum of days [j·L+1, j·L+L] of a series column (slice clamps
    * at the end; an empty tail segment sums to the init 0). */
  private def x59SegSum(a: Column, j: Int, bL: Column): Column =
    aggregate(slice(a, (lit(j.toLong) * bL + 1L).cast("int"), bL.cast("int")),
      lit(0L), (acc, x) => acc + x)

  /** x59: time-series similarity search (the EDBT'19 streaming-series
    * family; lower-bound pruning per Keogh's PAA bounds) — find every
    * user whose daily-activity series lies within squared-L2 radius τ of
    * the query user's series, EXACTLY, with a sound integer lower bound
    * doing the pruning: by Cauchy–Schwarz, Σ_j(ΔS_j)² ≤ L·d2 for the
    * 6 segment-sum differences ΔS_j (segment length L = ⌈days/6⌉), so
    * `lb ≤ L·τ` admits every true match — the brute-force oracle PROVES
    * the pruning lossless, the x49 contract applied to time series.
    * Series are per-user daily cents sums on the dense day grid (missing
    * days 0, exact longs end to end); τ = the query series' own energy
    * Σq² (data-derived, scale-free); the query user is min(user_id).
    *
    * Honesty note, measured at bench SFs: at radius τ=Σq² on this
    * corpus the bound admits ~99% of users (near-random level-matched
    * series — the bound bites at small radii / long dims, e.g. a year
    * of days where segment sums cut the verify 60×); the emitted lb
    * column keeps the bound auditable per match.
    *
    * Plan shape at 100 TB: one (user, day) map-side-combinable rollup +
    * one user-keyed series build (the grid join is a broadcast of ≤
    * #days rows), then a single scan of the |users| series rows against
    * the broadcast query — candidate filter and verify are per-row
    * codegen'd HOFs, no pair shuffle anywhere; output ∝ matches. */
  /** Per-user daily-cents series on the dense day grid (x59/x60/x61):
    * one (user, day) map-side rollup, a ≤#days-row grid broadcast, a
    * sorted collect_list per user. Consumers read it via
    * [[Stages.seriesDaily]] — the frame is |users| rows × #days longs
    * (bounded), every series query references it 2–4 times inside one
    * plan, and the three consumers share one build per session (the
    * unstaged x61 leg measured 24.7 s at 64× — four rollups of the
    * same 64M-event table). */
  private[graft] def dailySeriesUnstaged(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).filter(col("value").isNotNull)
      .select(col("user_id"), col("ts").cast("date").as("d"), cents(col("value")).as("v"))
    val grid = e.groupBy().agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
    val daily = e.groupBy(col("user_id"), col("d")).agg(sum(col("v")).as("s"))
    e.select(col("user_id")).distinct()
      .crossJoin(broadcast(grid))
      .join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"), coalesce(col("s"), lit(0L)).as("s"))
      .groupBy(col("user_id"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("s")))),
        x => x.getField("s")).as("sv"))
  }

  /** (qid, qv): the min-user query series, broadcastable. */
  private def seriesQuery(series: DataFrame): DataFrame =
    series
      .join(broadcast(series.groupBy().agg(min(col("user_id")).as("qid"))),
        col("user_id") === col("qid"))
      .select(col("qid"), col("sv").as("qv"))

  def x59SeriesSearch(spark: SparkSession, dir: String): DataFrame = {
    val series = Stages.seriesDaily(spark, dir)
    val q = seriesQuery(series)
      .withColumn("bL", fdiv(size(col("qv")).cast(LongType) + (x59Segs - 1),
        lit(x59Segs.toLong)))
      .withColumn("tau", aggregate(col("qv"), lit(0L), (a, x) => a + x * x))
      // loud bit-budget guard: bL·tau must stay exact int64 for the lb
      // pruning comparison; evaluated once on the broadcast 1-row query.
      .withColumn("tau", when(col("tau") <= fdiv(lit(1L << 62), col("bL")), col("tau"))
        .otherwise(raise_error(format_string(
          "x59: tau %d exceeds the int64 bit budget 2^62/bL (bL=%d)",
          col("tau"), col("bL")))))
    // Bit budget (Spark wraps int64 silently where DuckDB raises, so the
    // gate only catches overflow at an SF actually run — the headroom must
    // hold by construction): |segsum| ≤ the series' cents L1-norm T, so
    // each ds² ≤ (2T)² and lb ≤ Segs·4T² — exact while T < 2^29.6
    // (≈ $8M total activity per user per window; the generated corpora
    // sit near 2^20, ~9 bits of headroom even at 256× replication). The
    // rhs bL·tau is guarded LOUDLY below on the 1-row query frame
    // (raise_error, not a wrap) since tau = Σq² is the largest single
    // term either side of the comparison.
    val lbExpr = (0 until x59Segs).map { j =>
      val ds = x59SegSum(col("sv"), j, col("bL")) - x59SegSum(col("qv"), j, col("bL"))
      ds * ds
    }.reduce(_ + _)
    series.crossJoin(broadcast(q))
      .filter(col("user_id") =!= col("qid"))
      .withColumn("lb", lbExpr)
      .filter(col("lb") <= col("bL") * col("tau")) // sound: lb ≤ L·d2 ≤ L·τ for any match
      .withColumn("d2", aggregate(zip_with(col("sv"), col("qv"),
        (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x))
      .filter(col("d2") <= col("tau"))
      .select(col("user_id"), col("lb"), col("d2"))
      .orderBy("user_id")
  }

  /** x60 Sakoe–Chiba band width (days). */
  private[graft] val x60Band = 5

  /** x60: DTW series search — the top-5 users nearest the query user's
    * daily-activity series under banded Dynamic Time Warping, the
    * beyond-L2 series distance (x59 finds level-matched series; DTW
    * finds series matching up to ±band-day TIME SHIFTS — the metric the
    * trajectory/series-similarity literature in PAPERS.md actually
    * uses). The DP runs as the native codegen'd
    * [[graft.functions.DtwDistance]] expression (also exposed to SQL as
    * `dtw_arr`), O(days·band) per pair on exact int64 cents — no
    * doubles anywhere, so ranks hash-gate bit-identically.
    *
    * Oracle: DuckDB unrolls the SAME recurrence as anti-diagonal CTEs
    * (lvl2..lvl90 — diagonal d holds cells i+j=d, so each level reads
    * only the previous one and the carried cm column is the d−2 term);
    * the final pick is length-dynamic (d = 2·len) up to 45 days — a
    * regenerated corpus past that fails the gate loudly, not silently.
    *
    * Plan shape at 100 TB: identical to x59 — series build + ONE scan of
    * |users| series rows against the broadcast query, the DP per row
    * inside WholeStageCodegen; TakeOrderedAndProject keeps top-5 per
    * partition. A query-batch form would broadcast N queries and amortize
    * the scan exactly like x3b. */
  def x60DtwSearch(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.DtwFunctions.dtwArr
    val series = Stages.seriesDaily(spark, dir)
    series.crossJoin(broadcast(seriesQuery(series)))
      .filter(col("user_id") =!= col("qid"))
      .select(col("user_id"), dtwArr(col("sv"), col("qv"), x60Band).as("dtw"))
      .orderBy(col("dtw").asc, col("user_id").asc)
      .limit(5)
  }

  /** x61 knobs: SAX alphabet size and the match threshold (segments
    * shared with the query for candidacy). */
  private val x61Bins = 4L
  private val x61MinShared = 4L

  /** x61: SAX-indexed series search (Lin et al.'s symbolic aggregate
    * approximation / the iSAX index family) — the SCALE PATH of the
    * series trio: x59 is the exact radius scan, x60 the DTW re-ranker,
    * x61 the bucketed candidate retrieval that avoids scanning every
    * series at all. Each series becomes a 6-symbol SAX word (segment
    * means quantized into 4 equi-width integer bins over the corpus'
    * global mean range — the breakpoints are one 2-long broadcast);
    * candidates share the query's symbol in ≥ 4 of 6 segments, and only
    * candidates pay the exact distance — emitted as the top-10 by
    * (d2, user). Like x14, the operator is DEFINED over its blocking
    * (the oracle mirrors the same word construction), so correctness is
    * exact for the operator's own semantics while recall-vs-exhaustive
    * is the knob the alphabet/threshold trade.
    *
    * All-integer determinism: segment means are exact floor divisions,
    * symbols are exact integer bin arithmetic ((m−lo)·bins ÷ (hi−lo+1) —
    * the +1 pins sym < bins at m = hi and guards the degenerate
    * lo = hi corpus), d2 is the exact long squared-L2.
    *
    * Plan shape at 100 TB: the symbol table is 6 rows/user from the
    * series scan; candidacy is one equi-join on (segment, symbol)
    * against the 6-row broadcast query word + a map-side-combinable
    * count — the classic inverted-index retrieval; only |candidates|
    * rows join back to raw series for the verify. No pair shuffle, no
    * corpus² anywhere. */
  def x61SaxSearch(spark: SparkSession, dir: String): DataFrame = {
    val series = Stages.seriesDaily(spark, dir)
    val withL = series.withColumn("bL",
      fdiv(size(col("sv")).cast(LongType) + (x59Segs - 1), lit(x59Segs.toLong)))
    val means = withL.select(col("user_id") +: (0 until x59Segs).map(j =>
        fdiv(x59SegSum(col("sv"), j, col("bL")), col("bL")).as(s"m$j")): _*)
    val bounds = means
      .select(least((0 until x59Segs).map(j => col(s"m$j")): _*).as("mn"),
        greatest((0 until x59Segs).map(j => col(s"m$j")): _*).as("mx"))
      .groupBy().agg(min(col("mn")).as("lo"), max(col("mx")).as("hi"))
    val syms = means.crossJoin(broadcast(bounds))
      .select(col("user_id"), explode(array((0 until x59Segs).map(j =>
        struct(lit(j.toLong).as("seg"),
          fdiv((col(s"m$j") - col("lo")) * x61Bins,
            col("hi") - col("lo") + 1L).as("sym"))): _*)).as("s"))
      .select(col("user_id"), col("s.seg").as("seg"), col("s.sym").as("sym"))
    val qid = series.groupBy().agg(min(col("user_id")).as("qid"))
    val qsyms = syms.join(broadcast(qid), col("user_id") === col("qid"))
      .select(col("qid"), col("seg"), col("sym"))
    val cand = syms.join(broadcast(qsyms), Seq("seg", "sym"))
      .filter(col("user_id") =!= col("qid"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= x61MinShared)
    val q = seriesQuery(series)
    cand.join(series, "user_id")
      .crossJoin(broadcast(q))
      .select(col("user_id"), col("n_shared"),
        aggregate(zip_with(col("sv"), col("qv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d2"))
      .orderBy(col("d2").asc, col("user_id").asc)
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x59_series_search" -> x59SeriesSearch,
    "x60_dtw_search" -> x60DtwSearch,
    "x61_sax_search" -> x61SaxSearch,
    "q7_window_rank" -> q7WindowRank,
    "q7b_window_more" -> q7bWindowMore,
    "q8_window_frame" -> q8WindowFrame,
    "q16_asof" -> q16Asof,
    "q16b_asof_native" -> q16bAsofNative,
    "q31_gapfill" -> q31Gapfill,
    "q32_anomaly" -> q32Anomaly,
    "q33_resample" -> q33Resample)

  /** One x59 segment-sum difference term in DuckDB (list_sum of an empty
    * tail slice is NULL → coalesce 0, matching Spark's aggregate init). */
  private def x59SegSql(j: Int): String = {
    def seg(v: String) =
      s"coalesce(CAST(list_sum(list_slice($v, $j*q.bL+1, ${j + 1}*q.bL)) AS BIGINT), 0)"
    s"(${seg("s.sv")} - ${seg("q.qv")})"
  }

  /** Shared CTE prefix deriving the per-user daily series — mirrors
    * [[dailySeries]]; ends at the `series` CTE. */
  private def seriesCtesSql: String =
    s"""e AS (SELECT user_id, CAST(ts AS DATE) AS d, ${centsSql("value")} AS v
       |  FROM events WHERE value IS NOT NULL),
       |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM e),
       |grid AS (SELECT CAST(unnest(generate_series((SELECT d0 FROM span), (SELECT d1 FROM span), INTERVAL 1 DAY)) AS DATE) AS d),
       |users AS (SELECT DISTINCT user_id FROM e),
       |daily AS (SELECT user_id, d, CAST(sum(v) AS BIGINT) AS s FROM e GROUP BY 1, 2),
       |series AS MATERIALIZED (SELECT u.user_id, list(coalesce(dy.s, 0) ORDER BY g.d) AS sv
       |  FROM users u CROSS JOIN grid g
       |  LEFT JOIN daily dy ON dy.user_id = u.user_id AND dy.d = g.d
       |  GROUP BY u.user_id)""".stripMargin

  /** x60 oracle INF sentinel (dead DP paths only). */
  private val x60InfSql = "1152921504606846976"

  /** One x60 anti-diagonal CTE: level d holds the DP cells with
    * i + j = d; `c` = D(i, j), `cm` carries D(i−1, j) (= the previous
    * level's `c` at the same j) so level d+1 can reach its diag-(d−2)
    * predecessor without a second recursive reference. The row set is
    * WIDENED one cell past the band (|i−j| = band+1 rows exist as pure
    * carriers with c = INF): at a band edge the in-band predecessor
    * (i−1, j−1) travels through the out-of-band cell (i, j−1)'s cm —
    * without the carrier row that value would be lost and edge cells
    * would miss their cheapest path (caught by the sf0.01 gate). */
  private def x60LvlSql(d: Int): String =
    if (d == 2)
      s"""lvl2 AS MATERIALIZED (SELECT s.user_id, 1 AS j,
         |    CAST(abs(s.sv[1] - q.qv[1]) AS BIGINT) AS c, CAST($x60InfSql AS BIGINT) AS cm
         |  FROM series s CROSS JOIN q WHERE s.user_id <> q.qid)""".stripMargin
    else
      s"""lvl$d AS MATERIALIZED (SELECT s.user_id, t.j,
         |    CASE WHEN abs(($d - t.j) - t.j) <= $x60Band
         |      THEN CAST(abs(s.sv[$d - t.j] - q.qv[t.j]) AS BIGINT)
         |        + least(coalesce(x.c, $x60InfSql), coalesce(y.c, $x60InfSql), coalesce(y.cm, $x60InfSql))
         |      ELSE CAST($x60InfSql AS BIGINT) END AS c,
         |    coalesce(x.c, $x60InfSql) AS cm
         |  FROM series s CROSS JOIN q CROSS JOIN range(1, 46) t(j)
         |  LEFT JOIN lvl${d - 1} x ON x.user_id = s.user_id AND x.j = t.j
         |  LEFT JOIN lvl${d - 1} y ON y.user_id = s.user_id AND y.j = t.j - 1
         |  WHERE s.user_id <> q.qid
         |    AND t.j <= len(q.qv) AND $d - t.j >= 1 AND $d - t.j <= len(s.sv)
         |    AND abs(($d - t.j) - t.j) <= ${x60Band + 1})""".stripMargin

  val oracle: Map[String, String] = Map(
    // x60's oracle replays the SAME banded-DTW recurrence as 89
    // anti-diagonal CTE levels (n ≤ 45 days; the final pick is
    // length-dynamic, so a longer regenerated corpus fails loudly)
    "x60_dtw_search" ->
      s"""WITH $seriesCtesSql,
         |q AS MATERIALIZED (SELECT user_id AS qid, sv AS qv FROM series
         |  WHERE user_id = (SELECT min(user_id) FROM e)),
         |${(2 to 90).map(x60LvlSql).mkString(",\n")},
         |fin AS (SELECT u.user_id, u.c FROM (
         |${(2 to 90).map(d => s"  SELECT $d AS d, user_id, j, c FROM lvl$d").mkString("\n  UNION ALL\n")}
         |) u CROSS JOIN q WHERE u.d = 2 * len(q.qv) AND u.j = len(q.qv))
         |SELECT user_id, CAST(c AS BIGINT) AS dtw FROM fin
         |ORDER BY dtw ASC, user_id ASC LIMIT 5""".stripMargin,
    // x61 is DEFINED over its SAX blocking (the x14 contract): the
    // oracle mirrors the word construction literally, so symbols,
    // candidacy, and distances all hash-gate
    "x61_sax_search" ->
      s"""WITH $seriesCtesSql,
         |sl AS (SELECT user_id, sv,
         |    ${fdivSql("CAST(len(sv) AS BIGINT) + 5", "6")} AS bL FROM series),
         |m AS (SELECT user_id, t.j,
         |    ${fdivSql(
               "coalesce(CAST(list_sum(list_slice(sv, t.j*bL+1, (t.j+1)*bL)) AS BIGINT), 0)",
               "bL")} AS mj
         |  FROM sl CROSS JOIN range(0, 6) t(j)),
         |b AS (SELECT min(mj) AS lo, max(mj) AS hi FROM m),
         |syms AS (SELECT user_id, m.j AS seg,
         |    ${fdivSql("(mj - lo) * 4", "hi - lo + 1")} AS sym
         |  FROM m CROSS JOIN b),
         |qid AS (SELECT min(user_id) AS qid FROM e),
         |qs AS (SELECT seg, sym FROM syms, qid WHERE user_id = qid),
         |cand AS (SELECT s.user_id, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM syms s JOIN qs ON s.seg = qs.seg AND s.sym = qs.sym, qid
         |  WHERE s.user_id <> qid GROUP BY s.user_id HAVING count(*) >= 4),
         |q AS (SELECT sv AS qv FROM series, qid WHERE user_id = qid)
         |SELECT c.user_id, c.n_shared,
         |  CAST(list_sum(list_transform(list_zip(s.sv, q.qv),
         |    x -> (x[1] - x[2]) * (x[1] - x[2]))) AS BIGINT) AS d2
         |FROM cand c JOIN series s ON s.user_id = c.user_id CROSS JOIN q
         |ORDER BY d2 ASC, c.user_id ASC LIMIT 10""".stripMargin,
    // x59's oracle is the BRUTE-FORCE radius search (no lower-bound
    // filter): a row Spark's pruning wrongly dropped would appear here
    // and break the hash gate — the gate itself proves the bound sound
    "x59_series_search" ->
      s"""WITH $seriesCtesSql,
         |q AS (SELECT user_id AS qid, sv AS qv,
         |    ${fdivSql("CAST(len(sv) AS BIGINT) + 5", "6")} AS bL,
         |    CAST(list_sum(list_transform(sv, x -> x * x)) AS BIGINT) AS tau
         |  FROM series WHERE user_id = (SELECT min(user_id) FROM e)),
         |scored AS (SELECT s.user_id,
         |    ${(0 until 6).map(j => s"${x59SegSql(j)} * ${x59SegSql(j)}").mkString(" + ")} AS lb,
         |    CAST(list_sum(list_transform(list_zip(s.sv, q.qv),
         |      x -> (x[1] - x[2]) * (x[1] - x[2]))) AS BIGINT) AS d2,
         |    q.tau AS tau
         |  FROM series s CROSS JOIN q WHERE s.user_id <> q.qid)
         |SELECT user_id, CAST(lb AS BIGINT) AS lb, d2
         |FROM scored WHERE d2 <= tau ORDER BY user_id""".stripMargin,
    "q31_gapfill" ->
      s"""WITH daily AS (
         |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
         |         CAST(sum(${centsSql("value")}) AS BIGINT) AS day_c
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |span AS (SELECT user_id, min(d) AS lo, max(d) AS hi FROM daily GROUP BY 1),
         |grid AS (SELECT user_id, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
         |         FROM span),
         |j AS (SELECT g.user_id, g.d, daily.day_c
         |      FROM grid g LEFT JOIN daily ON daily.user_id = g.user_id AND daily.d = g.d),
         |f AS (SELECT user_id, d, day_c,
         |        count(day_c) OVER (PARTITION BY user_id ORDER BY d
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |      FROM j)
         |SELECT user_id, CAST(d AS VARCHAR) AS day,
         |  CAST(max(day_c) OVER (PARTITION BY user_id, grp) AS BIGINT) AS filled_c,
         |  CAST(CASE WHEN day_c IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
         |FROM f ORDER BY user_id, day""".stripMargin,
    "q32_anomaly" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         |         count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |w AS (
         |  SELECT event_type, d, n,
         |    count(*) OVER tw AS m,
         |    coalesce(sum(n) OVER tw, 0) AS s_prior,
         |    coalesce(sum(n * n) OVER tw, 0) AS q_prior
         |  FROM daily
         |  WINDOW tw AS (PARTITION BY event_type ORDER BY d
         |                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
         |SELECT event_type, CAST(d AS VARCHAR) AS day,
         |  CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
         |  CAST(s_prior AS BIGINT) AS s_prior,
         |  CAST(CASE WHEN m >= $q32MinBaseline
         |      AND (m*n - s_prior)*(m*n - s_prior) > 9*(m*q_prior - s_prior*s_prior)
         |    THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         |FROM w ORDER BY event_type, day""".stripMargin,
    "q33_resample" ->
      s"""WITH b AS (
         |  SELECT event_type, epoch_ms(ts) AS ms, event_id,
         |         ${centsSql("value")} AS v
         |  FROM events WHERE value IS NOT NULL),
         |w AS (
         |  SELECT event_type, ms // $q33BarMs AS bkt, v,
         |    row_number() OVER (PARTITION BY event_type, ms // $q33BarMs
         |                       ORDER BY ms, event_id) AS rn1,
         |    row_number() OVER (PARTITION BY event_type, ms // $q33BarMs
         |                       ORDER BY ms DESC, event_id DESC) AS rn2
         |  FROM b)
         |SELECT event_type, CAST(bkt * $q33BarMs AS BIGINT) AS bar_start_ms,
         |  CAST(max(CASE WHEN rn1 = 1 THEN v END) AS BIGINT) AS open,
         |  CAST(max(v) AS BIGINT) AS high, CAST(min(v) AS BIGINT) AS low,
         |  CAST(max(CASE WHEN rn2 = 1 THEN v END) AS BIGINT) AS close,
         |  count(*) AS n, CAST(sum(v) AS BIGINT) AS vol
         |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q7_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC))
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q7b_window_more" ->
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         |  ${scaled4Sql("percent_rank() OVER w")} AS pr_s4,
         |  ${scaled4Sql("cume_dist() OVER w")} AS cd_s4,
         |  first_value(o_orderkey) OVER wf AS best_order,
         |  last_value(o_orderkey) OVER wf AS worst_order,
         |  coalesce(nth_value(o_orderkey, 2) OVER wf, -1) AS second_order,
         |  coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_order
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC),
         |  wf AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q8_window_frame" ->
      s"""SELECT user_id, event_id,
         |  CAST(sum(${centsSql("value")}) OVER (PARTITION BY user_id ORDER BY event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c,
         |  coalesce(lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id), -1) AS prev_event_id
         |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q16_asof" ->
      """SELECT event_id, user_id, prior_view_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    coalesce(max(CASE WHEN event_type = 'view' THEN event_id END)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS prior_view_id
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q16b_asof_native" ->
      """SELECT event_id, user_id, prior_view_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    coalesce(max(CASE WHEN event_type = 'view' THEN event_id END)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS prior_view_id
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)
}
