package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stamped persisted artifacts — the stored-governance contracts.
  *
  * Seven tables cross session boundaries as parquet a deployment writes
  * once and serves many times: x68's sticky splits (`stickyPath`), the
  * IVFADC index (`ivfIndexPath`), x24's cluster labels (`labelsPath`),
  * s20's frozen retrieval stats (`retrievalStatsPath`), the trained
  * BPE tokenizer (`mergesPath` — THE ship-once artifact of a
  * training-data pipeline), and the two serving band indexes — s18's
  * split-bits router index (`routeIndexPath`) and s21's min-label
  * assignment index (`labelIndexPath`). An
  * unstamped read would serve ANY parquet at the
  * configured path — a wrong-corpus table, a different artifact, a
  * torn write, or a table produced by an older operator version — and
  * every one of those fails silently downstream (splits migrate, codes
  * route to dead lists) instead of at the read. So every persist writes
  * a one-row `_graft_meta` parquet beside the data (underscore prefix:
  * invisible to the outer scan, the `_SUCCESS` convention) recording
  * the artifact key, producing-operator version, schema DDL, and row
  * count; every configured-path read validates all four and throws with
  * the mismatch named. Consistent with the loud-failure posture the
  * sticky/IVF paths established for MISSING paths — this extends it to
  * wrong and stale ones.
  *
  * The stamp is provenance + integrity, not freshness: a stored
  * artifact legitimately outlives corpus growth (that is the point of
  * freezing it), so corpus-consistency stays the deployment's contract;
  * the `props` map carries the freeze parameters (e.g. the sticky
  * threshold) for auditors.
  */
object Artifacts {
  /** Producing-operator versions, bumped when an artifact's SEMANTICS
    * change (schema drift alone is caught by the DDL check): a consumer
    * from a newer engine refuses a table stamped by an incompatible
    * producer instead of silently misreading it. */
  val versions: Map[String, Int] = Map(
    "x68_sticky" -> 1,
    "x57_index" -> 1,
    "x24_labels" -> 1,
    "s20_stats" -> 1,
    "x62b_merges" -> 1,
    // v2 (r19): the stored band indexes carry per-bucket occupancy `df`
    // and tombstoned payloads past the cap — the MERGEABLE form the
    // incremental re-freeze needs; v1 stores (bits/lab only, under-cap
    // rows only) cannot be merged into and must re-persist
    "s18_index" -> 2,
    "s21_index" -> 2,
    // the daily sketch warehouse (r19, store #9 — the first on the
    // EVENTS axis): per-day HLL/KLL sketches q28/q29 roll up from
    "sketch_daily" -> 1,
    // the store-SET manifest: one stamped table naming a freeze
    // generation's store paths (artifact → path), so a deployment flips
    // every serving knob with ONE conf — see [[writeManifest]]
    "store_manifest" -> 1)

  /** Where each artifact's store is configured — (runtime conf key,
    * env var): the stickyPath convention, one entry per stamped
    * artifact. Conf first (testable per session; an EMPTY conf value
    * forces re-derivation even when the env var is exported), env var
    * as the deployment default. */
  val pathKnobs: Map[String, (String, String)] = Map(
    "x68_sticky" -> (("spark.graft.stickyPath", "SPARK_GRAFT_STICKY_PATH")),
    "x57_index" -> (("spark.graft.ivfIndexPath", "SPARK_GRAFT_IVF_INDEX_PATH")),
    "x24_labels" -> (("spark.graft.labelsPath", "SPARK_GRAFT_LABELS_PATH")),
    "s20_stats" -> (("spark.graft.retrievalStatsPath", "SPARK_GRAFT_RETRIEVAL_STATS_PATH")),
    "x62b_merges" -> (("spark.graft.mergesPath", "SPARK_GRAFT_MERGES_PATH")),
    "s18_index" -> (("spark.graft.routeIndexPath", "SPARK_GRAFT_ROUTE_INDEX_PATH")),
    "s21_index" -> (("spark.graft.labelIndexPath", "SPARK_GRAFT_LABEL_INDEX_PATH")),
    "sketch_daily" -> (("spark.graft.sketchPath", "SPARK_GRAFT_SKETCH_PATH")),
    "store_manifest" -> (("spark.graft.storeManifest", "SPARK_GRAFT_STORE_MANIFEST")))

  /** The configured store location for `artifact`, if any — the ONE
    * resolution every configured-path branch (and x74's freshness
    * audit) shares. Three layers, most specific wins:
    * (1) the artifact's own runtime conf — an EMPTY value forces
    * re-derivation, overriding everything below (the stageDir
    * convention); (2) the artifact's env var (same empty rule);
    * (3) the store-set MANIFEST (`spark.graft.storeManifest` /
    * SPARK_GRAFT_STORE_MANIFEST — see [[writeManifest]]): one stamped
    * table naming a whole freeze generation's paths, so a deployment
    * flips every serving knob atomically with ONE conf instead of
    * seven — the partial-flip (mixed-generation) window the per-knob
    * form leaves open is exactly what x77 audits. An artifact absent
    * from the manifest derives in-session as if unconfigured. */
  def configuredPath(spark: SparkSession, artifact: String): Option[String] = {
    val (confKey, envKey) = pathKnobs(artifact)
    val explicit: Option[Option[String]] = spark.conf.getOption(confKey) match {
      case Some(v) => Some(Some(v).filter(_.nonEmpty))
      case None    => sys.env.get(envKey).map(v => Some(v).filter(_.nonEmpty))
    }
    explicit match {
      case Some(resolved) => resolved
      case None if artifact != "store_manifest" =>
        // the manifest knob itself resolves through the base layers
        // only (no self-reference)
        configuredPath(spark, "store_manifest")
          .flatMap(mp => manifestEntries(spark, mp).get(artifact))
      case None => None
    }
  }

  // the manifest's (artifact → path) rows, collected once per
  // (session, path): configuredPath runs on every query construction,
  // and a 7-row parquet collect per call would be a driver job per
  // query — memoized here, evicted when writeStamped overwrites the
  // path; stopped-context entries are purged on the build path. Keys
  // are NORMALIZED paths ([[normPath]]) so insertion and eviction agree
  // across spellings.
  private val manifestCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Map[String, String]]

  /** One canonical spelling for store-path cache keys: qualified against
    * the path's filesystem (file:/ URI vs bare path, relative vs
    * absolute all collapse to one form), trailing slash stripped —
    * insertion and eviction must agree on the key or an overwrite under
    * a differently-spelled knob leaves a stale memo served for the rest
    * of the session (the r18 ADVICE defect). Best-effort: an
    * unresolvable path falls back to its raw spelling — the two
    * spellings then miss each other, which is exactly the
    * pre-normalization behavior, never a crash. */
  private[graft] def normPath(spark: SparkSession, path: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .makeQualified(p).toString.stripSuffix("/")
    } catch { case scala.util.control.NonFatal(_) => path.stripSuffix("/") }

  private def manifestEntries(spark: SparkSession, mpath: String): Map[String, String] = {
    val key = (spark, normPath(spark, mpath))
    manifestCache.getOrElse(key, {
      manifestCache.keys.filter(_._1.sparkContext.isStopped).foreach(manifestCache.remove)
      manifestCache.getOrElseUpdate(key,
        readStamped(spark, mpath, "store_manifest").collect()
          .map(r => (r.getString(0), r.getString(1))).toMap)
    })
  }

  /** Drop every memoized manifest map (all sessions) — [[Stages.clear]]
    * calls this so the global reset covers ALL read memos symmetrically
    * (a per-factor scaling reset that cleared stages but kept manifest
    * maps would serve a previous factor's store set). */
  private[graft] def clearManifestCache(): Unit = manifestCache.clear()

  /** Persist a store-set manifest — the atomic-flip form of the seven
    * path knobs: one stamped table of (artifact, path) rows naming a
    * freeze GENERATION's stores, written after the per-store persists
    * and pointed at via `spark.graft.storeManifest`. Every
    * [[configuredPath]] resolution without an explicit per-artifact
    * knob then serves the manifest's path, so a session is either on
    * the whole generation or none of it — the mixed-generation window
    * a seven-knob flip leaves open (and x77 measures) closes to the
    * one conf set. `thr` is the generation's freeze boundary, stamped
    * for x74's audit (boundary-only, like the band indexes). Keys must
    * be registered artifacts; the manifest cannot name itself. */
  def writeManifest(spark: SparkSession, path: String,
      paths: Map[String, String], thr: Long): Unit = {
    require(paths.nonEmpty, "store manifest: no entries")
    val unknown = paths.keySet -- versions.keySet
    require(unknown.isEmpty,
      s"store manifest: unknown artifact keys ${unknown.toSeq.sorted}")
    require(!paths.contains("store_manifest"),
      "store manifest: a manifest cannot name itself")
    import spark.implicits._
    writeStamped(spark, paths.toSeq.sortBy(_._1).toDF("artifact", "path"),
      path, "store_manifest", Map("thr" -> thr.toString))
  }

  private def metaPath(path: String): String = s"${path.stripSuffix("/")}/_graft_meta"

  /** Persist `df` as parquet at `path` with the `_graft_meta` stamp.
    * The stamp records the READ-BACK schema and count, so it certifies
    * the bytes on disk, not the plan that produced them. */
  def writeStamped(spark: SparkSession, df: DataFrame, path: String,
      artifact: String, props: Map[String, String] = Map.empty): Unit = {
    require(versions.contains(artifact), s"unknown graft artifact key: $artifact")
    df.write.mode("overwrite").parquet(path)
    val written = spark.read.parquet(path)
    import spark.implicits._
    Seq((artifact, versions(artifact), written.schema.toDDL, written.count(), props))
      .toDF("artifact", "version", "schema_ddl", "n_rows", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(metaPath(path))
    // a persist-then-read flow reusing one path within a session must
    // never serve the PREVIOUS table's memoized plan (a plan over
    // overwritten files) or skip re-validating the new stamp — evict
    // the path's validated-read entries alongside the overwrite, under
    // the same normalized key the readers insert with
    val norm = normPath(spark, path)
    Stages.invalidateStamped(norm)
    manifestCache.keys.filter(_._2 == norm).foreach(manifestCache.remove)
    // ...and the STAGES built from reads of this artifact (r20, ADVICE
    // fix): the memoized x75_labels/x68_assign/s18_index/... frames were
    // derived from the pre-overwrite store generation — without this,
    // an in-session re-persist left them serving stale results while
    // the direct store reads re-validated
    Stages.invalidateStoreDerived(artifact)
  }

  /** Read a stamped artifact, failing loudly (with the mismatch named)
    * on: missing/malformed stamp, wrong artifact key, producer-version
    * mismatch, schema drift, row-count drift, or an empty table. */
  def readStamped(spark: SparkSession, path: String, artifact: String): DataFrame =
    readStampedWithFacts(spark, path, artifact)._1

  /** [[readStamped]] returning the stamp's row count and freeze props
    * alongside the validated frame — ONE meta collect + ONE count()
    * integrity job serve both, so a consumer that needs the frame AND
    * the freeze boundary (x75's seed) doesn't validate twice. */
  def readStampedWithFacts(spark: SparkSession, path: String,
      artifact: String): (DataFrame, Long, Map[String, String]) = {
    val mp = metaPath(path)
    val meta =
      try spark.read.parquet(mp).collect()
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"$artifact: no _graft_meta stamp under $path — not a stamped graft artifact " +
            s"(persist through the stamped writer, e.g. PipelineOps.persistStickySplits / " +
            s"persistLabels / VectorOps.persistPqIndex / TextOps.persistMerges): ${e.getMessage}")
      }
    require(meta.length == 1,
      s"$artifact: malformed _graft_meta at $mp — expected 1 row, found ${meta.length}")
    val m = meta(0)
    val storedArtifact = m.getAs[String]("artifact")
    require(storedArtifact == artifact,
      s"configured path $path holds artifact '$storedArtifact', not '$artifact' — " +
        "refusing to serve a different table")
    val storedVersion = m.getAs[Int]("version")
    require(storedVersion == versions(artifact),
      s"$artifact at $path was produced by version $storedVersion; this engine " +
        s"expects ${versions(artifact)} — re-persist with the current producer")
    val df = spark.read.parquet(path)
    val storedDdl = m.getAs[String]("schema_ddl")
    require(df.schema.toDDL == storedDdl,
      s"$artifact at $path: schema drifted from its stamp — stored '$storedDdl', " +
        s"found '${df.schema.toDDL}'")
    val storedRows = m.getAs[Long]("n_rows")
    val n = df.count()
    require(n == storedRows,
      s"$artifact at $path: row count $n != stamped $storedRows — torn or tampered table")
    require(n > 0L, s"$artifact at $path: stamped table is empty")
    (df, n, m.getAs[scala.collection.Map[String, String]]("props").toMap)
  }

  /** The stamp's props map (freeze parameters), for audits. */
  def readProps(spark: SparkSession, path: String): Map[String, String] =
    spark.read.parquet(metaPath(path)).collect()(0)
      .getAs[scala.collection.Map[String, String]]("props").toMap

  /** The stamp's recorded row count and freeze props, identity-validated
    * (artifact key + producer version) but WITHOUT the data-side count
    * job — x74's freshness audit reads what the producer STAMPED;
    * data-vs-stamp integrity stays [[readStamped]]'s job at serve
    * time. Loud on a missing/malformed/foreign stamp, the readStamped
    * posture. */
  def readStampFacts(spark: SparkSession, path: String,
      artifact: String): (Long, Map[String, String]) = {
    val mp = metaPath(path)
    val meta =
      try spark.read.parquet(mp).collect()
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"$artifact: no _graft_meta stamp under $path — not a stamped graft artifact: " +
            e.getMessage)
      }
    require(meta.length == 1,
      s"$artifact: malformed _graft_meta at $mp — expected 1 row, found ${meta.length}")
    val m = meta(0)
    val storedArtifact = m.getAs[String]("artifact")
    require(storedArtifact == artifact,
      s"configured path $path holds artifact '$storedArtifact', not '$artifact' — " +
        "refusing to audit a different table")
    val storedVersion = m.getAs[Int]("version")
    require(storedVersion == versions(artifact),
      s"$artifact at $path was produced by version $storedVersion; this engine " +
        s"expects ${versions(artifact)} — re-persist with the current producer")
    (m.getAs[Long]("n_rows"),
      m.getAs[scala.collection.Map[String, String]]("props").toMap)
  }
}
