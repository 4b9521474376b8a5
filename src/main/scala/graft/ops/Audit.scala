package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables._

/** Data-quality constraint audit (the Deequ/Great-Expectations shape,
  * public AWS/OSS practice): declarative constraints over the warehouse
  * tables, evaluated into one verdict row each — (check_name, checked,
  * violations, pass). The gate a training-data pipeline runs BEFORE
  * admitting a crawl/CDC batch into the corpus.
  *
  * Scale notes (100 TB posture): every row-level constraint on a table
  * folds into ONE shared aggregate pass over that table (a `sum(when)`
  * per constraint — one scan however many constraints), uniqueness adds
  * the key-distinct term to the same aggregate (Spark plans single
  * count-distinct alongside plain sums without an Expand), and
  * referential integrity is one LEFT join against the distinct parent
  * keys with a null-side count — never a row-by-row lookup. Verdict
  * frames are 1-row; the union is free. */
object Audit {
  /** One-pass row-level checks: each (name, violation-predicate) becomes
    * a verdict row; adding a check adds a `sum(when)` to ONE aggregate,
    * not a scan — the 1-row aggregate then explodes into verdict rows,
    * so the table appears exactly once in the plan (a union of selects
    * over the agg would copy the whole aggregate subtree per row). */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)],
      uniqueKey: Option[(String, Column)] = None): DataFrame = {
    val sums = checks.zipWithIndex.map { case ((_, bad), ix) =>
      coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(s"v_$ix") } ++
      uniqueKey.map { case (_, k) => count_distinct(k).as("d_u") }.toSeq
    val entries = checks.zipWithIndex.map { case ((n, _), ix) =>
      struct(lit(n).as("check_name"), col(s"v_$ix").as("violations")) } ++
      uniqueKey.map { case (n, _) =>
        struct(lit(n).as("check_name"),
          (col("checked") - col("d_u")).as("violations")) }.toSeq
    df.agg(count(lit(1)).as("checked"), sums: _*)
      .select(col("checked"), explode(array(entries: _*)).as("e"))
      .select(col("e.check_name").as("check_name"), col("checked"),
        col("e.violations").as("violations"))
  }

  /** Referential integrity in one pass: LEFT join the distinct parent
    * keys and count the null side — checked and violations from the
    * same scan (the anti-join twin would split them into two). */
  def fkCheck(name: String, child: DataFrame, key: String,
      parent: DataFrame, pkey: String): DataFrame =
    child.select(col(key))
      .join(parent.select(col(pkey).as(key)).distinct()
        .withColumn("__present", lit(1)), Seq(key), "left")
      .agg(count(lit(1)).as("checked"),
        sum(when(col("__present").isNull, 1L).otherwise(0L)).as("violations"))
      .select(lit(name).as("check_name"), col("checked"), col("violations"))

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** x48: the warehouse constraint audit — completeness, domain,
    * uniqueness, ranges, derived-column consistency, and the
    * lineitem→orders foreign key, one verdict row per constraint. */
  def x48ConstraintAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val li = lineitem(spark, dir)
    val docs = documents(spark, dir)
    val verdicts = Seq(
      rowChecks(e, Seq(
        "events.value_complete" -> col("value").isNull,
        "events.ts_complete" -> col("ts").isNull,
        "events.type_domain" -> !col("event_type").isin(eventTypes: _*)),
        uniqueKey = Some("events.event_id_unique" -> col("event_id"))),
      rowChecks(li, Seq(
        "lineitem.quantity_positive" -> (col("l_quantity") <= 0),
        "lineitem.discount_range" -> (col("l_discount") < 0 || col("l_discount") > 1))),
      fkCheck("lineitem.orderkey_fk", li, "l_orderkey",
        orders(spark, dir), "o_orderkey"),
      rowChecks(docs, Seq(
        "documents.nchars_consistent" -> (col("n_chars") =!= length(col("text")))),
        uniqueKey = Some("documents.doc_id_unique" -> col("doc_id"))))
    verdicts.reduce(_ unionByName _)
      .select(col("check_name"), col("checked"), col("violations"),
        when(col("violations") === 0, 1L).otherwise(0L).as("pass"))
      .orderBy("check_name")
  }

  /** x50: row-level constraint routing — the quarantine file x48's
    * batch verdicts summarize. Every document gets a violation BITMASK
    * (hard constraints: empty text, n_chars drift, missing lang/source,
    * oversize, duplicated doc_id) plus an advisory warn mask (short doc,
    * long doc) that varies on a clean corpus, so the gate exercises the
    * mask arithmetic, not just zeros. A real pipeline splits on
    * `quarantined` and ships the 0-side to the corpus; emitting the
    * verdict for every row (not just violators) is what makes the
    * operator a deterministic, hash-gateable map.
    *
    * Scale notes (100 TB posture): all bits but dup_id are per-row
    * codegen'd expressions on the scan — no shuffle; dup_id rides one
    * doc_id window (the exchange an ingest pipeline already pays to
    * bucket by key). Output ordering is unique because doc_id uniqueness
    * is itself audited (x48); under an actual dup flood the dup bit
    * fires on every copy, so routing stays well-defined even where the
    * sort key ties. */
  def x50Quarantine(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val hard: Seq[Column] = Seq(
      col("text").isNull || col("text") === "",
      col("n_chars").isNull || col("n_chars") =!= length(col("text")),
      col("lang").isNull || col("lang") === "",
      col("source").isNull || col("source") === "",
      col("n_chars") > 100000L,
      count(lit(1)).over(w) > 1)
    val warn: Seq[Column] = Seq(
      // isNotNull guard pins NULL-text to the oracle's NULL-propagating
      // len(string_split(NULL)) -> bit unset, independent of sizeOfNull config.
      col("text").isNotNull && size(split(col("text"), " ")) < 20,
      col("n_chars") >= 400L)
    def maskOf(bits: Seq[Column]): Column = bits.zipWithIndex
      .map { case (c, i) => when(c, lit(1L << i)).otherwise(0L) }.reduce(_ + _)
    documents(spark, dir)
      .select(col("doc_id"), maskOf(hard).as("mask"), maskOf(warn).as("warn_mask"))
      .select(col("doc_id"), col("mask"),
        bit_count(col("mask")).cast(org.apache.spark.sql.types.LongType).as("n_viol"),
        when(col("mask") > 0, 1L).otherwise(0L).as("quarantined"),
        col("warn_mask"))
      // mask/warn_mask tiebreakers: duplicate doc_ids with DIFFERENT
      // payloads both carry the dup bit but can differ on other bits, so
      // doc_id alone would leave tied rows with distinct values unordered
      // under the hash gate. Mirrored in the oracle's ORDER BY.
      .orderBy("doc_id", "mask", "warn_mask")
  }

  /** x74: artifact-freshness audit — the consumer the stamp layer's
    * freeze props ([[Artifacts.readStampFacts]]) were written for. The
    * stamp certifies IDENTITY and INTEGRITY (readStamped's job); it
    * deliberately does not stop a store from outliving corpus growth —
    * that is what freezing means — so corpus-vs-stamp staleness was
    * "the deployment's contract" with no measuring operator. x74
    * measures it (the x33/x66 posture): one row per stamped artifact
    * comparing the FROZEN boundary (the `thr`/`max_id` prop persisted
    * with the store) and row count against what a fresh persist on the
    * CURRENT corpus would stamp, with a fresh 0/1 verdict. Artifacts
    * whose store path is unconfigured audit the would-be-fresh values
    * (frozen = current by construction) — the audit arithmetic itself
    * is what the oracle checks; the configured path is exercised by the
    * doctored-stale negative test.
    *
    * Expected row counts are ARITHMETIC, never a re-derivation: sticky
    * = one row per history doc, labels = one per doc, the IVFADC index
    * = M per vector, s20 stats = one per distinct (query, term) pair
    * (the shared [[TextOps.bm25QueryTerms]] builder — ONE query-set
    * definition across derivation and audit), and the merge table's
    * "rows" are its configured training rounds
    * ([[TextOps.bpeRounds]] — row-count freshness is meaningless for a
    * fixed-k table; the boundary is its signal). The two band indexes
    * ([[Artifacts.versions]] s18_index/s21_index) audit BOUNDARY-ONLY:
    * their row counts are lattice-shaped (capped (band, h) bucket
    * counts — recomputing one means re-running the corpus banding the
    * audit exists to avoid), so like the merges table the freeze
    * boundary is their freshness signal and expected = stamped by
    * convention (0 when unconfigured: no store, no rows to audit). So
    * the audit costs a few 1-row aggregates over id/text projections,
    * no fixpoint, no trainer, no banding, no index build. At 100 TB it
    * reads stamps + corpus stats, exactly what a governance review can
    * afford to run per ingest.
    *
    * The audit matrix is REGISTRY-DRIVEN: one row per
    * [[Artifacts.versions]] key, each with its spec below — a store
    * registered without an audit spec fails the whole audit loudly
    * (a new store cannot ship unaudited). Staleness MAGNITUDE rides two
    * derived columns: `arrivals_past_freeze` (current − frozen
    * boundary — how far the corpus grew past the freeze) and
    * `row_drift` (expected − stamped rows — how many rows a fresh
    * persist would add), so a verdict quantifies re-persist urgency
    * instead of a bare 0/1. */
  private[graft] final case class StoreAudit(
      boundaryKey: String, currentBoundary: Long,
      expectedRows: Option[Long], stampedRowsProp: Option[String])

  def x74ArtifactFreshness(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"), col("text"))
    val head = d.agg(max(col("doc_id")).as("mx"), count(lit(1)).as("n")).collect()(0)
    val (mx, nDocs) = (head.getLong(0), head.getLong(1))
    val thr = Math.floorDiv(9L * mx, 10L) // the shared 9/10 freeze rule
    val nHist = d.filter(col("doc_id") <= thr).count()
    // s20's index is one row per distinct (q_id, term) of the history
    // eval docs (every such term has df ≥ 1 — drawn from history text);
    // the query-set rule is the ONE shared builder, never re-stated
    val nQt = TextOps.bm25QueryTerms(
      d.filter(col("doc_id") <= thr)
        .select(col("doc_id"), split(col("text"), " ").as("w"))).count()
    val eh = table(spark, dir, "embeddings")
      .agg(max(col("vec_id")).as("mxv"), count(lit(1)).as("ne")).collect()(0)
    val (mxV, nEmb) = (eh.getLong(0), eh.getLong(1))
    // the events-axis head: the sketch warehouse freezes at the log's
    // max day and holds one row per active day
    val ev = events(spark, dir).agg(
      max(date_format(to_date(col("ts")), "yyyyMMdd").cast("long")).as("mxd"),
      countDistinct(to_date(col("ts"))).as("nd")).collect()(0)
    val (mxDay, nDays) = (ev.getLong(0), ev.getLong(1))
    x74RowsFor(spark, Map(
      "sketch_daily" -> StoreAudit("max_day", mxDay, Some(nDays), None),
      "s20_stats" -> StoreAudit("thr", thr, Some(nQt), None),
      "x24_labels" -> StoreAudit("max_id", mx, Some(nDocs), None),
      "x57_index" -> StoreAudit("max_id", mxV, Some(VectorOps.pqM.toLong * nEmb), None),
      "x62b_merges" -> StoreAudit("thr", thr, Some(TextOps.bpeRounds.toLong), Some("rounds")),
      "x68_sticky" -> StoreAudit("thr", thr, Some(nHist), None),
      "s18_index" -> StoreAudit("thr", thr, None, None),
      "s21_index" -> StoreAudit("thr", thr, None, None),
      // the store-set manifest: generation boundary only (its rows are
      // however many stores the deployment chose to ship)
      "store_manifest" -> StoreAudit("thr", thr, None, None)))
  }

  /** x74's row builder over an explicit spec registry — split out so a
    * negative test can drive it with a registry that misses (or
    * invents) an artifact and assert the loud failure. The registry
    * must cover [[Artifacts.versions]] exactly: a new stamped store
    * ships with its audit row or x74 refuses to run at all. */
  private[graft] def x74RowsFor(spark: SparkSession,
      specs: Map[String, StoreAudit]): DataFrame = {
    import spark.implicits._
    require(specs.keySet == Artifacts.versions.keySet,
      s"x74 audit specs drifted from the artifact registry — " +
        s"unaudited stores: ${(Artifacts.versions.keySet -- specs.keySet).toSeq.sorted}; " +
        s"specs without a registered store: ${(specs.keySet -- Artifacts.versions.keySet).toSeq.sorted}")
    specs.toSeq.map { case (artifact, sa) =>
      Artifacts.configuredPath(spark, artifact) match {
        case Some(p) =>
          val (nRows, props) = Artifacts.readStampFacts(spark, p, artifact)
          require(props.contains(sa.boundaryKey),
            s"x74: $artifact stamp at $p lacks the '${sa.boundaryKey}' freeze prop — " +
              "re-persist with the current producer")
          val frozen = props(sa.boundaryKey).toLong
          val stamped = sa.stampedRowsProp.map { rp =>
            require(props.contains(rp),
              s"x74: $artifact stamp at $p lacks the '$rp' freeze prop")
            props(rp).toLong
          }.getOrElse(nRows)
          // boundary-only artifacts (expectedRows = None): expected
          // mirrors stamped, so row_drift is 0 by construction and the
          // boundary carries the verdict
          val expected = sa.expectedRows.getOrElse(stamped)
          (artifact, frozen, sa.currentBoundary, sa.currentBoundary - frozen,
            stamped, expected, expected - stamped,
            if (frozen == sa.currentBoundary && stamped == expected) 1L else 0L)
        case None =>
          val e = sa.expectedRows.getOrElse(0L)
          (artifact, sa.currentBoundary, sa.currentBoundary, 0L, e, e, 0L, 1L)
      }
    }
      .toDF("artifact", "frozen_boundary", "current_boundary",
        "arrivals_past_freeze", "stamped_rows", "expected_rows",
        "row_drift", "fresh")
      .orderBy("artifact")
  }

  /** x77: cross-store COHERENCE audit — the constraint family x74
    * cannot see: x74 audits each store against the CORPUS (is this
    * store stale?); x77 audits the stores against EACH OTHER (are they
    * the same freeze generation?). Seven artifacts now serve one
    * lattice, and the defects that slip past per-store freshness are
    * exactly cross-store: a route index banded over a DIFFERENT sticky
    * generation serves splits the sticky table never assigned; a
    * tokenizer or retrieval index frozen at another boundary monitors a
    * model the splits never saw; a label store that doesn't cover the
    * history slice strands the label index's seed. One row per
    * cross-store constraint with both boundary values and a 0/1 pass —
    * the page a deployment reads BEFORE flipping a session to a store
    * set. Unconfigured artifacts audit at their would-be in-session
    * boundaries (thr / max_id — every constraint then passes by the
    * shared 9/10 rule, which is what the oracle checks; mixed
    * generations are exercised by the negative test).
    *
    * Cost shape: stamps only ([[Artifacts.readStampFacts]] per
    * configured store — a meta collect each) plus ONE 1-row max over
    * the doc-id projection; no store data is read, no derivation runs.
    * At 100 TB this is free, which is the point: coherence must be
    * checkable on every session flip, not once per audit cycle. */
  /** x77's per-artifact coherence decision — registry-driven like x74
    * (`x77RowsFor` pins its spec keys to [[Artifacts.versions]]): every
    * stamped store ships with EITHER a named cross-store constraint or
    * an explicit [[X77Anchor]] declaration (the deliberate, reviewable
    * choice that this artifact IS the generation anchor others compare
    * against) — a store #N+1 can no longer ship outside the coherence
    * matrix unnoticed, which is exactly how `x57_index` stayed
    * row-less through r18. */
  private[graft] sealed trait X77Spec
  private[graft] case object X77Anchor extends X77Spec
  private[graft] final case class X77Check(checkName: String,
      rightKey: String, op: (Long, Long) => Boolean) extends X77Spec

  def x77StoreCoherence(spark: SparkSession, dir: String): DataFrame = {
    val mx = documents(spark, dir).agg(max(col("doc_id")))
      .collect()(0).getLong(0) // 1 row — the corpus head
    val thr = Math.floorDiv(9L * mx, 10L)
    val mxV = table(spark, dir, "embeddings").agg(max(col("vec_id")))
      .collect()(0).getLong(0) // 1 row — the vector-lattice head
    val mxDay = events(spark, dir)
      .agg(max(date_format(to_date(col("ts")), "yyyyMMdd").cast("long")))
      .collect()(0).getLong(0) // 1 row — the events-axis head
    x77RowsFor(spark,
      specs = Map(
        // the generation anchor: every doc-lattice row compares to it
        "x68_sticky" -> X77Anchor,
        // the router's index must be banded over the EXACT sticky
        // generation it serves (persistRouteIndex's production order)
        "s18_index" -> X77Check("route_index_matches_sticky", "x68_sticky", _ == _),
        // the label index's seed slice must be covered by the label
        // store x75 maintains from
        "s21_index" -> X77Check("label_index_inside_labels", "x24_labels", _ <= _),
        // drift monitor + retrieval screen must freeze WITH the splits —
        // a different generation monitors a corpus the splits never saw
        "x62b_merges" -> X77Check("merges_match_sticky", "x68_sticky", _ == _),
        "s20_stats" -> X77Check("retrieval_stats_match_sticky", "x68_sticky", _ == _),
        // the full labeling must cover the frozen history slice (sticky
        // seeding and x63's inheritance both join through it)
        "x24_labels" -> X77Check("labels_cover_history", "x68_sticky", _ >= _),
        // the vector lattice's one store lives on a DIFFERENT corpus
        // axis (embeddings, not documents) — its generation check is
        // against that axis's head, stamped vs current
        "x57_index" -> X77Check("ivf_index_matches_embeddings", "embeddings_head", _ == _),
        // the sketch warehouse lives on the EVENTS axis — generation
        // check against that axis's head (the x57 posture)
        "sketch_daily" -> X77Check("sketches_match_events", "events_head", _ == _),
        // the manifest names ONE generation — its stamped boundary must
        // be the sticky generation it points the session at
        "store_manifest" -> X77Check("manifest_matches_sticky", "x68_sticky", _ == _)),
      bounds = Map(
        "x68_sticky" -> (("thr", thr)),
        "s18_index" -> (("thr", thr)),
        "s21_index" -> (("thr", thr)),
        "x62b_merges" -> (("thr", thr)),
        "s20_stats" -> (("thr", thr)),
        "x24_labels" -> (("max_id", mx)),
        "x57_index" -> (("max_id", mxV)),
        "sketch_daily" -> (("max_day", mxDay)),
        "store_manifest" -> (("thr", thr))),
      pseudo = Map("embeddings_head" -> mxV, "events_head" -> mxDay))
  }

  /** x77's row builder over explicit registries — split out (the
    * x74RowsFor idiom) so a negative test can drive it with a spec map
    * that misses or invents an artifact and assert the loud refusal.
    * `specs` decides each artifact's constraint (or anchor role);
    * `bounds` maps every artifact to its (freeze prop, would-be
    * in-session value); `pseudo` carries non-artifact right sides
    * (corpus heads on other axes). Both artifact-keyed maps must cover
    * [[Artifacts.versions]] exactly. */
  private[graft] def x77RowsFor(spark: SparkSession,
      specs: Map[String, X77Spec],
      bounds: Map[String, (String, Long)],
      pseudo: Map[String, Long]): DataFrame = {
    import spark.implicits._
    def pinned(name: String, keys: scala.collection.Set[String]): Unit =
      require(keys == Artifacts.versions.keySet,
        s"x77 $name drifted from the artifact registry — " +
          s"undecided stores: ${(Artifacts.versions.keySet -- keys).toSeq.sorted}; " +
          s"entries without a registered store: ${(keys -- Artifacts.versions.keySet).toSeq.sorted}")
    pinned("coherence specs", specs.keySet)
    pinned("boundary specs", bounds.keySet)
    // one boundary resolution per artifact (the anchor is the right side
    // of several rows — never re-read its stamp per row)
    val boundary: Map[String, Long] = bounds.map { case (artifact, (key, wouldBe)) =>
      artifact -> (Artifacts.configuredPath(spark, artifact) match {
        case Some(p) =>
          val (_, props) = Artifacts.readStampFacts(spark, p, artifact)
          require(props.contains(key),
            s"x77: $artifact stamp at $p lacks the '$key' freeze prop — " +
              "re-persist with the current producer")
          props(key).toLong
        case None => wouldBe
      })
    }
    specs.toSeq.collect { case (artifact, X77Check(name, rightKey, op)) =>
      val rb = pseudo.getOrElse(rightKey, {
        require(boundary.contains(rightKey),
          s"x77: check '$name' references unknown right side '$rightKey'")
        boundary(rightKey)
      })
      val lb = boundary(artifact)
      (name, artifact, rightKey, lb, rb, if (op(lb, rb)) 1L else 0L)
    }
      .toDF("check_name", "left_artifact", "right_artifact",
        "left_boundary", "right_boundary", "pass")
      .orderBy("check_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x48_constraint_audit" -> x48ConstraintAudit,
    "x50_quarantine" -> x50Quarantine,
    "x74_artifact_freshness" -> x74ArtifactFreshness,
    "x77_store_coherence" -> x77StoreCoherence)

  private val typeList = eventTypes.map(t => s"'$t'").mkString(", ")

  /** x74's oracle: the unconfigured (would-be-fresh) audit — every
    * expected quantity recomputed from the tables with the same
    * arithmetic (9/10 floor boundary, history count, distinct
    * (q_id, term) pairs, M·vectors, the shared round constant; the two
    * band indexes are boundary-only with 0 rows unconfigured), and the
    * two magnitude columns 0 by construction (frozen = current,
    * stamped = expected). */
  private val x74Sql: String =
    s"""WITH t AS MATERIALIZED (
       |  SELECT ${fdivSql("9 * max(doc_id)", "10")} AS thr,
       |         CAST(max(doc_id) AS BIGINT) AS mx,
       |         CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents),
       |h AS (SELECT CAST(count(*) AS BIGINT) AS n_hist
       |      FROM documents, t WHERE doc_id <= t.thr),
       |q AS (SELECT CAST(count(*) AS BIGINT) AS n_qt FROM (
       |  SELECT DISTINCT doc_id, unnest((string_split(text, ' '))[1:3]) AS term
       |  FROM documents, t WHERE doc_id < 5 AND doc_id <= t.thr)),
       |e AS (SELECT CAST(max(vec_id) AS BIGINT) AS mxv,
       |             CAST(count(*) AS BIGINT) AS n_emb FROM embeddings),
       |ev AS (SELECT CAST(strftime(max(CAST(ts AS DATE)), '%Y%m%d') AS BIGINT) AS mxd,
       |              CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS nd FROM events)
       |SELECT artifact, frozen_boundary, current_boundary,
       |       CAST(0 AS BIGINT) AS arrivals_past_freeze,
       |       stamped_rows, expected_rows,
       |       CAST(0 AS BIGINT) AS row_drift, fresh FROM (
       |  SELECT 's20_stats' AS artifact, t.thr AS frozen_boundary,
       |         t.thr AS current_boundary, q.n_qt AS stamped_rows,
       |         q.n_qt AS expected_rows, CAST(1 AS BIGINT) AS fresh FROM t, q
       |  UNION ALL
       |  SELECT 's18_index', t.thr, t.thr, 0, 0, 1 FROM t
       |  UNION ALL
       |  SELECT 's21_index', t.thr, t.thr, 0, 0, 1 FROM t
       |  UNION ALL
       |  SELECT 'sketch_daily', ev.mxd, ev.mxd, ev.nd, ev.nd, 1 FROM ev
       |  UNION ALL
       |  SELECT 'store_manifest', t.thr, t.thr, 0, 0, 1 FROM t
       |  UNION ALL
       |  SELECT 'x24_labels', t.mx, t.mx, t.n_docs, t.n_docs, 1 FROM t
       |  UNION ALL
       |  SELECT 'x57_index', e.mxv, e.mxv,
       |         CAST(${VectorOps.pqM} * e.n_emb AS BIGINT),
       |         CAST(${VectorOps.pqM} * e.n_emb AS BIGINT), 1 FROM e
       |  UNION ALL
       |  SELECT 'x62b_merges', t.thr, t.thr, ${TextOps.bpeRounds},
       |         ${TextOps.bpeRounds}, 1 FROM t
       |  UNION ALL
       |  SELECT 'x68_sticky', t.thr, t.thr, h.n_hist, h.n_hist, 1 FROM t, h
       |) ORDER BY artifact""".stripMargin

  /** x77's oracle: the unconfigured (single-generation) coherence audit
    * — every boundary recomputed with the shared 9/10 arithmetic, every
    * constraint passing by construction. */
  private val x77Sql: String =
    s"""WITH t AS MATERIALIZED (
       |  SELECT ${fdivSql("9 * max(doc_id)", "10")} AS thr,
       |         CAST(max(doc_id) AS BIGINT) AS mx
       |  FROM documents),
       |e AS MATERIALIZED (SELECT CAST(max(vec_id) AS BIGINT) AS mxv FROM embeddings),
       |ev AS MATERIALIZED (
       |  SELECT CAST(strftime(max(CAST(ts AS DATE)), '%Y%m%d') AS BIGINT) AS mxd FROM events)
       |SELECT check_name, left_artifact, right_artifact,
       |       left_boundary, right_boundary, pass FROM (
       |  SELECT 'route_index_matches_sticky' AS check_name,
       |         's18_index' AS left_artifact, 'x68_sticky' AS right_artifact,
       |         t.thr AS left_boundary, t.thr AS right_boundary,
       |         CAST(1 AS BIGINT) AS pass FROM t
       |  UNION ALL
       |  SELECT 'ivf_index_matches_embeddings', 'x57_index', 'embeddings_head',
       |         e.mxv, e.mxv, 1 FROM e
       |  UNION ALL
       |  SELECT 'label_index_inside_labels', 's21_index', 'x24_labels',
       |         t.thr, t.mx, 1 FROM t
       |  UNION ALL
       |  SELECT 'merges_match_sticky', 'x62b_merges', 'x68_sticky',
       |         t.thr, t.thr, 1 FROM t
       |  UNION ALL
       |  SELECT 'retrieval_stats_match_sticky', 's20_stats', 'x68_sticky',
       |         t.thr, t.thr, 1 FROM t
       |  UNION ALL
       |  SELECT 'sketches_match_events', 'sketch_daily', 'events_head',
       |         ev.mxd, ev.mxd, 1 FROM ev
       |  UNION ALL
       |  SELECT 'labels_cover_history', 'x24_labels', 'x68_sticky',
       |         t.mx, t.thr, 1 FROM t
       |  UNION ALL
       |  SELECT 'manifest_matches_sticky', 'store_manifest', 'x68_sticky',
       |         t.thr, t.thr, 1 FROM t
       |) ORDER BY check_name""".stripMargin

  val oracle: Map[String, String] = Map(
    "x74_artifact_freshness" -> x74Sql,
    "x77_store_coherence" -> x77Sql,
    "x48_constraint_audit" ->
      s"""WITH v AS (
         |  SELECT 'events.value_complete' AS check_name, count(*) AS checked,
         |    count(*) - count(value) AS violations FROM events
         |  UNION ALL SELECT 'events.ts_complete', count(*),
         |    count(*) - count(ts) FROM events
         |  UNION ALL SELECT 'events.type_domain', count(*),
         |    sum(CASE WHEN event_type NOT IN ($typeList) THEN 1 ELSE 0 END) FROM events
         |  UNION ALL SELECT 'events.event_id_unique', count(*),
         |    count(*) - count(DISTINCT event_id) FROM events
         |  UNION ALL SELECT 'lineitem.quantity_positive', count(*),
         |    sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) FROM lineitem
         |  UNION ALL SELECT 'lineitem.discount_range', count(*),
         |    sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) FROM lineitem
         |  UNION ALL SELECT 'lineitem.orderkey_fk', (SELECT count(*) FROM lineitem),
         |    (SELECT count(*) FROM lineitem l
         |      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
         |  UNION ALL SELECT 'documents.nchars_consistent', count(*),
         |    sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) FROM documents
         |  UNION ALL SELECT 'documents.doc_id_unique', count(*),
         |    count(*) - count(DISTINCT doc_id) FROM documents)
         |SELECT check_name, CAST(checked AS BIGINT) AS checked,
         |  CAST(violations AS BIGINT) AS violations,
         |  CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
         |FROM v ORDER BY check_name""".stripMargin,
    "x50_quarantine" ->
      """WITH m AS (
        |  SELECT doc_id,
        |      (CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
        |    + (CASE WHEN n_chars IS NULL OR n_chars <> length(text) THEN 2 ELSE 0 END)
        |    + (CASE WHEN lang IS NULL OR lang = '' THEN 4 ELSE 0 END)
        |    + (CASE WHEN source IS NULL OR source = '' THEN 8 ELSE 0 END)
        |    + (CASE WHEN n_chars > 100000 THEN 16 ELSE 0 END)
        |    + (CASE WHEN count(*) OVER (PARTITION BY doc_id) > 1 THEN 32 ELSE 0 END) AS mask,
        |      (CASE WHEN len(string_split(text, ' ')) < 20 THEN 1 ELSE 0 END)
        |    + (CASE WHEN n_chars >= 400 THEN 2 ELSE 0 END) AS warn_mask
        |  FROM documents)
        |SELECT doc_id, CAST(mask AS BIGINT) AS mask,
        |  CAST(bit_count(CAST(mask AS BIGINT)) AS BIGINT) AS n_viol,
        |  CAST(CASE WHEN mask > 0 THEN 1 ELSE 0 END AS BIGINT) AS quarantined,
        |  CAST(warn_mask AS BIGINT) AS warn_mask
        |FROM m ORDER BY doc_id, mask, warn_mask""".stripMargin)
}
