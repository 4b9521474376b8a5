package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ops.Windows

/** The native as-of join operator (AsofJoinPlan/Strategy/Exec) against its
  * composed union+window twin, plus plan-shape and null-semantics pins. */
class AsofPlanSpec extends SparkTestBase {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("q16b native == q16 composed, row for row, at sf0.001") {
    val native = Windows.q16bAsofNative(spark, sf0001).collect().map(_.toString)
    val composed = Windows.q16Asof(spark, sf0001).collect().map(_.toString)
    assert(native.length > 0)
    assert(native.toSeq == composed.toSeq)
  }

  test("native == composed on a randomized frame with duplicate keys and times") {
    val rng = new scala.util.Random(7)
    val left = (1 to 400).map { i =>
      (rng.nextInt(12).toLong, rng.nextInt(50).toLong, s"L$i")
    }.toDF("k", "t", "tag")
    val right = (1 to 300).map { i =>
      (rng.nextInt(12).toLong, rng.nextInt(50).toLong, rng.nextInt(9).toLong, s"R${rng.nextInt(40)}")
    }.toDF("k", "t", "score", "label")
    val native = Windows.asofJoinNative(left, right, "k", "t", Seq("score", "label"))
    val composed = Windows.asofJoin(left, right, "k", "t", Seq("score", "label"))
    assert(native.columns.toSeq == composed.columns.toSeq)
    assert(sortedRows(native) == sortedRows(composed))
  }

  test("ties at one (key, time): greatest payload wins, deterministically") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 5L), (1L, 10L, 9L), (1L, 10L, 2L)).toDF("k", "t", "v")
    val native = Windows.asofJoinNative(left, right, "k", "t", Seq("v")).collect()
    assert(native.length == 1 && native(0).getAs[Long]("asof_v") == 9L)
    val composed = Windows.asofJoin(left, right, "k", "t", Seq("v")).collect()
    assert(composed(0).getAs[Long]("asof_v") == 9L)
  }

  test("null key or time never matches; left rows are preserved with null asof cols") {
    val left = Seq(
      (Some(1L), Some(10L), "match"),
      (None: Option[Long], Some(10L), "nullkey"),
      (Some(1L), None: Option[Long], "nulltime"),
      (Some(3L), Some(10L), "nomatch")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), Some(5L), 100L),
      (None: Option[Long], Some(1L), 200L), // null right key: invisible
      (Some(3L), None: Option[Long], 300L)  // null right time: invisible
    ).toDF("k", "t", "v")
    val out = Windows.asofJoinNative(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Long]("asof_v"))).toMap
    assert(out("match").contains(100L))
    assert(out("nullkey").isEmpty)
    assert(out("nulltime").isEmpty)
    assert(out("nomatch").isEmpty)
  }

  test("as-of rows with right row AT the left time are visible (<=, not <)") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 7L)).toDF("k", "t", "v")
    val out = Windows.asofJoinNative(left, right, "k", "t", Seq("v")).collect()
    assert(out(0).getAs[Long]("asof_v") == 7L)
  }

  test("plan shape: AsofJoinExec merge, no window or union, one shuffle per side") {
    val df = Windows.q16bAsofNative(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix; the un-flagged name also
    // proves producedAttributes covers the minted asof columns (a missing
    // produced set prints the node as "!AsofJoin")
    assert(plan.contains("AsofJoin") && !plan.contains("!AsofJoin"), plan)
    assert(!plan.contains("Window"), "native asof must not fall back to window")
    assert(!plan.contains("Union"), "native asof must not union the sides")
    // exchanges: one per side for the key clustering; the final orderBy of
    // q16b adds a range exchange — anything beyond 3 means a lost co-partition
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges:\n$plan")
  }

  test("left-only filters written above the as-of join sink through it") {
    val ev = graft.model.Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"))
    val joinedThenFiltered =
      Windows.asofJoinNative(purchases, views, "user_id", "event_id", Seq("event_id"))
        .filter(col("user_id") % 2 === 0)
    val optimized = joinedThenFiltered.queryExecution.optimizedPlan
    // the filter must live BELOW the asof node (pushed into the left child),
    // not above it
    val asof = optimized.collectFirst { case a: AsofJoinPlan => a }
    assert(asof.isDefined, optimized.toString)
    assert(optimized match {
      case _: org.apache.spark.sql.catalyst.plans.logical.Filter => false
      case _ => true
    }, s"filter stayed above the asof join:\n$optimized")
    assert(asof.get.left.toString.contains("Filter"),
      s"filter not pushed into left child:\n$optimized")
    // and the results agree with filtering before the join
    val filteredThenJoined = Windows.asofJoinNative(
      purchases.filter(col("user_id") % 2 === 0), views,
      "user_id", "event_id", Seq("event_id"))
    assert(sortedRows(joinedThenFiltered) == sortedRows(filteredThenJoined))
  }

  test("property sweep: native == composed over seeds × partitions × skew shapes") {
    val s = spark
    val original = s.conf.get("spark.sql.shuffle.partitions")
    try {
      for (seed <- 1 to 6; parts <- Seq("1", "3", "7")) {
        s.conf.set("spark.sql.shuffle.partitions", parts)
        val rng = new scala.util.Random(seed)
        // seed-dependent shape: uniform keys, one hot key, or near-unique keys
        val nKeys = seed % 3 match { case 0 => 1; case 1 => 8; case 2 => 120 }
        val left = (1 to 150).map { i =>
          (rng.nextInt(nKeys).toLong, rng.nextInt(40).toLong, i.toLong)
        }.toDF("k", "t", "lid")
        val right = (1 to 130).map { _ =>
          (rng.nextInt(nKeys).toLong, rng.nextInt(40).toLong, rng.nextInt(1000).toLong)
        }.toDF("k", "t", "v")
        val native = sortedRows(Windows.asofJoinNative(left, right, "k", "t", Seq("v")))
        val composed = sortedRows(Windows.asofJoin(left, right, "k", "t", Seq("v")))
        assert(native == composed,
          s"seed=$seed parts=$parts nKeys=$nKeys: first diff " +
            native.zipAll(composed, "<missing>", "<missing>").find(t => t._1 != t._2))
      }
    } finally s.conf.set("spark.sql.shuffle.partitions", original)
  }

  test("mismatched key/time types are rejected at construction, not silently wrong") {
    val left = Seq((1, 10L, "a")).toDF("k", "t", "tag") // k: Int
    val right = Seq((1L, 5L, 7L)).toDF("k", "t", "v")   // k: Long
    val e = intercept[IllegalArgumentException] {
      Windows.asofJoinNative(left, right, "k", "t", Seq("v"))
    }
    assert(e.getMessage.contains("key types differ"))
    val e2 = intercept[IllegalArgumentException] {
      Windows.asofJoinNative(
        Seq((1L, 10, "a")).toDF("k", "t", "tag"), right, "k", "t", Seq("v"))
    }
    assert(e2.getMessage.contains("time types differ"))
  }

  test("null semantics: composed and native forms agree on null-bearing data") {
    val left = Seq(
      (Some(1L), Some(10L), "m"),
      (None: Option[Long], Some(10L), "nullkey"),
      (Some(1L), None: Option[Long], "nulltime")).toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), Some(5L), 100L),
      (None: Option[Long], Some(1L), 200L),
      (Some(1L), None: Option[Long], 300L)).toDF("k", "t", "v")
    val native = sortedRows(Windows.asofJoinNative(left, right, "k", "t", Seq("v")))
    val composed = sortedRows(Windows.asofJoin(left, right, "k", "t", Seq("v")))
    assert(native == composed, s"native $native\ncomposed $composed")
  }

  test("key-equality filters are mirrored into the right side") {
    val ev = graft.model.Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"))
    val probed =
      Windows.asofJoinNative(purchases, views, "user_id", "event_id", Seq("event_id"))
        .filter(col("user_id") === 7)
    val optimized = probed.queryExecution.optimizedPlan
    val aj = optimized.collectFirst { case a: AsofJoinPlan => a }
    assert(aj.isDefined, optimized.toString)
    // both children must carry the key predicate down to their scans
    assert(aj.get.left.toString.contains("= 7"), s"left unmirrored:\n$optimized")
    assert(aj.get.right.toString.contains("= 7"), s"right unmirrored:\n$optimized")
    // and the result equals filtering both inputs up front
    val expected = Windows.asofJoinNative(
      purchases.filter(col("user_id") === 7), views, "user_id", "event_id", Seq("event_id"))
    assert(sortedRows(probed) == sortedRows(expected))
  }

  /** Builds an as-of join over the parquet-backed event log (a
    * LocalRelation would let the optimizer fold pushed filters into the
    * relation itself, hiding the Filter node these tests assert on) with
    * an int-typed key column on one side, cast back to long inside the
    * plan node. */
  private def castKeyAsof(castSide: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression}
    import org.apache.spark.sql.types.LongType
    graft.plans.AsofJoin.install(spark)
    val ev = graft.model.Tables.events(spark, sf0001)
    // both sides come from the same table: alias every column to fresh
    // names (fresh exprIds) so the node's references are unambiguous —
    // the same re-aliasing asofJoinNative applies internally
    val left =
      if (castSide == "left")
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id").cast("int").as("ui"), col("event_id").as("pt"))
      else
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("event_id").as("pt"))
    val right =
      if (castSide == "right")
        ev.filter(col("event_type") === "view")
          .select(col("user_id").cast("int").as("vui"), col("event_id").as("vt"))
      else
        ev.filter(col("event_type") === "view")
          .select(col("user_id").as("vu"), col("event_id").as("vt"))
    val lPlan = GraftBridge.analyzed(left)
    val rPlan = GraftBridge.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    val lKey: Expression =
      if (castSide == "left") Cast(attr(lPlan, "ui"), LongType) else attr(lPlan, "pu")
    val rKey: Expression =
      if (castSide == "right") Cast(attr(rPlan, "vui"), LongType) else attr(rPlan, "vu")
    val payload = Seq(attr(rPlan, "vt"))
    val out = payload.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    GraftBridge.ofRows(spark, AsofJoinPlan(
      lPlan, rPlan, lKey, attr(lPlan, "pt"), rKey, attr(rPlan, "vt"), payload, out))
  }

  /** q16's (event_id, prior_view_id) pairs for one user — the cast
    * round-trip is lossless for the sf user ids, so the cast-key joins
    * must reproduce these exactly. */
  private def q16PairsForUser(u: Long): Seq[(Long, Long)] =
    Windows.q16Asof(spark, sf0001).filter(col("user_id") === u).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq

  test("key filters mirror through a CAST right key (bare left key)") {
    val probed = castKeyAsof(castSide = "right").filter(col("pu") === 7)
    val aj = probed.queryExecution.optimizedPlan
      .collectFirst { case a: AsofJoinPlan => a }.get
    assert(aj.left.toString.contains("= 7"), s"left unpushed:\n${aj.left}")
    assert(aj.right.toString.contains("= 7"),
      s"cast right key lost the mirrored prune:\n${aj.right}")
    val got = probed.collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
    assert(got == q16PairsForUser(7L) && got.nonEmpty, s"got $got")
  }

  test("range and IN key predicates mirror too, not just equality") {
    val base = castKeyAsof(castSide = "right")
    // (predicate, a plan-string fragment ONLY the pushed predicate can
    // produce — the event_type filters already in both children must not
    // satisfy the assert)
    Seq(
      (col("pu") > 5 && col("pu") <= 9, "> 5"),
      (col("pu").isin(3, 7, 11), "IN (")
    ).foreach { case (pred, marker) =>
      val probed = base.filter(pred)
      val aj = probed.queryExecution.optimizedPlan
        .collectFirst { case a: AsofJoinPlan => a }.get
      assert(aj.left.toString.contains(marker),
        s"left unpushed for $pred:\n${aj.left}")
      assert(aj.right.toString.contains(marker),
        s"right unmirrored for $pred:\n${aj.right}")
      // full value parity against the unpushed composed twin — an unsound
      // mirror that over-prunes view rows would null out matches without
      // changing row counts, so counts alone prove nothing
      val ev = graft.model.Tables.events(spark, sf0001)
      val reference = Windows.asofJoin(
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("event_id").as("pt")).filter(pred),
        ev.filter(col("event_type") === "view")
          .select(col("user_id").as("pu"), col("event_id").as("pt"), col("event_id").as("vt")),
        "pu", "pt", Seq("vt"))
      val got = sortedRows(probed)
      assert(got.nonEmpty && got == sortedRows(reference), s"value drift for $pred")
    }
  }

  test("computed LEFT key: right mirror must NOT fire (unsound through a lossy map)") {
    val probed = castKeyAsof(castSide = "left").filter(col("ui") === 7)
    val aj = probed.queryExecution.optimizedPlan
      .collectFirst { case a: AsofJoinPlan => a }.get
    // the predicate is on the PRE-cast column, not the key value: it pushes
    // into the left side but is pinned to never mirror right
    assert(aj.left.toString.contains("= 7"), s"left unpushed:\n${aj.left}")
    assert(!aj.right.toString.contains("= 7"),
      s"unsound mirror through a computed left key:\n${aj.right}")
    val got = probed.collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
    assert(got == q16PairsForUser(7L) && got.nonEmpty, s"got $got")
  }

  test("exec metrics: numOutputRows == left rows; numMatched == non-null matches") {
    val left = Seq((1L, 10L), (1L, 2L), (2L, 5L), (3L, 1L)).toDF("k", "t")
    val right = Seq((1L, 3L, 30L), (2L, 4L, 40L)).toDF("k", "t", "v")
    val df = Windows.asofJoinNative(left, right, "k", "t", Seq("v"))
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findAsof(p: SparkPlan): Option[SparkPlan] =
      if (p.nodeName == "AsofJoin") Some(p)
      else (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }).view.flatMap(findAsof).headOption
    val exec = findAsof(df.queryExecution.executedPlan)
    assert(exec.isDefined, df.queryExecution.executedPlan.toString)
    assert(exec.get.metrics("numOutputRows").value == 4L)
    assert(exec.get.metrics("numMatched").value == 2L) // (1,10)->3 and (2,5)->4
  }

  test("downstream rewrites survive the unknown node: prune, aggregate, join, stack") {
    val left = (1 to 100).map(i => (i.toLong % 7, i.toLong, s"L$i", i * 2.0))
      .toDF("k", "t", "tag", "w")
    val right = (1 to 80).map(i => (i.toLong % 7, i.toLong, i.toLong * 10))
      .toDF("k", "t", "v")
    val j = Windows.asofJoinNative(left, right, "k", "t", Seq("v"))
    // column pruning above the node must not orphan the pass-through attrs
    assert(j.select(col("k"), col("asof_v")).count() == 100)
    // aggregation over minted + pass-through columns
    val agg = j.groupBy("k").agg(sum(coalesce(col("asof_v"), lit(0L))).as("s"))
    assert(agg.count() == 7)
    // a join above the node
    val dim = Seq((0L, "zero"), (1L, "one")).toDF("k", "name")
    assert(j.join(dim, "k").count() == 29)
    // an as-of stacked on an as-of output
    assert(Windows.asofJoinNative(j, right, "k", "t", Seq("v")).count() == 100)
  }

  test("composite keys via a struct column (documented pattern)") {
    // the API takes ONE key column; composite keys travel as a struct,
    // which is hash-partitionable and orderable end to end
    val left = Seq((1L, 1L, 10L, "a"), (1L, 2L, 10L, "b"), (2L, 1L, 10L, "c"))
      .toDF("tenant", "user", "t", "tag")
      .withColumn("key", struct(col("tenant"), col("user")))
    val right = Seq((1L, 1L, 5L, 100L), (1L, 2L, 5L, 200L), (2L, 2L, 5L, 300L))
      .toDF("tenant", "user", "t", "v")
      .withColumn("key", struct(col("tenant"), col("user")))
    val out = Windows.asofJoinNative(left, right, "key", "t", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Long]("asof_v"))).toMap
    assert(out("a").contains(100L))
    assert(out("b").contains(200L))
    assert(out("c").isEmpty, "(2,1) must not match (2,2) on a prefix")
  }

  test("empty right side: every left row survives with null asof columns") {
    val left = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "t", "tag")
    val right = Seq.empty[(Long, Long, Long)].toDF("k", "t", "v")
    val out = Windows.asofJoinNative(left, right, "k", "t", Seq("v"))
    assert(out.count() == 2)
    assert(out.filter(col("asof_v").isNotNull).count() == 0)
  }
}
