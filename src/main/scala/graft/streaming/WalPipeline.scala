package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

/** Consumer states — mirror of the reference's WalState enum
  * (`/root/reference/src/main/java/ir/sahab/walconsumer/WalConsumer.java:354-359`). */
object WalState extends Enumeration {
  val NONE, EMPTY, NOT_EMPTY, INACCESSIBLE_IO_FAILURE = Value
}

/** Observability — mirror of the reference's metric set
  * (`WalConsumer.java:49-54, 78-98`): `wal_state`, `wal_num_records` (per
  * batch, replacing the 60 s cached COUNT gauge), `wal_not_empty_seconds`
  * (lag-age proxy), `wal_num_synchronized` meter. Fed by a
  * StreamingQueryListener instead of per-record RDBMS queries. */
final class WalMetrics extends StreamingQueryListener with Serializable {
  val numSynchronized = new AtomicLong(0)
  val numIoFailures = new AtomicLong(0)
  val lastBatchRows = new AtomicLong(0)
  /** Records the sink reported as already applied (`syncEntity == false`)
    * — the reference's `wal_num_ignored_already_done` meter
    * (`WalConsumer.java:271-278`). */
  val numIgnoredAlreadyDone = new AtomicLong(0)
  val state = new AtomicReference[WalState.Value](WalState.NONE)
  @volatile private var notEmptySinceMs: Long = -1L
  /** Set by the owning pipeline; events from other queries on the same
    * session are ignored (a session-wide listener would otherwise report
    * a neighbor query's failure as this WAL's state). */
  @volatile private[streaming] var queryId: java.util.UUID = _
  /** Highest batchId already absorbed — progress events race queryId
    * assignment (the listener bus is async), so the pipeline replays
    * query.recentProgress after assignment and this guard deduplicates. */
  private val lastBatchId = new AtomicLong(-1L)

  private def mine(id: java.util.UUID): Boolean = queryId != null && queryId == id

  def notEmptySeconds: Long =
    if (notEmptySinceMs < 0) 0 else (System.currentTimeMillis() - notEmptySinceMs) / 1000

  /** One-call scrape point for an external reporter — the Spark form of
    * the reference's JmxReporter registration (`WalConsumer.java:106-114`).
    * Spark's own JMX path also works out of the box: with
    * `spark.sql.streaming.metricsEnabled=true` the query's
    * inputRate/latency gauges flow into the session's MetricsSystem
    * (metrics.properties → JmxSink); the WAL-specific meters below are
    * what that bridge doesn't carry. */
  def gauges: Map[String, Long] = Map(
    "wal_state" -> state.get().id.toLong,
    "wal_num_records" -> lastBatchRows.get(),
    "wal_num_synchronized" -> numSynchronized.get(),
    "wal_num_ignored_already_done" -> numIgnoredAlreadyDone.get(),
    "wal_num_io_failures" -> numIoFailures.get(),
    "wal_not_empty_seconds" -> notEmptySeconds)

  /** Target outage begins/ends (wired into foreachBatchSync). */
  private[streaming] def ioFailure(): Unit = {
    numIoFailures.incrementAndGet()
    state.set(WalState.INACCESSIBLE_IO_FAILURE)
  }
  private[streaming] def recovered(): Unit = state.set(WalState.NOT_EMPTY)

  /** Called by the pipeline on close(): listener events are async, so the
    * reference's unregister-on-close (`WalConsumer.java:299-317`) is done
    * synchronously here, not in onQueryTerminated. */
  private[streaming] def closed(): Unit = {
    state.set(WalState.NONE)
    notEmptySinceMs = -1L
  }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    if (mine(e.id)) state.set(WalState.NONE)

  /** Last `observe("wal", …)` metric row seen in a progress event —
    * proves the observed-metrics path end-to-end (the exportable,
    * listener-visible form of the gauges; ObservabilitySpec asserts it). */
  val lastObserved = new AtomicReference[Map[String, Long]](Map.empty)

  /** Absorb one progress report exactly once (by batchId). */
  private[streaming] def absorb(p: org.apache.spark.sql.streaming.StreamingQueryProgress): Unit = {
    val prev = lastBatchId.getAndUpdate(b => math.max(b, p.batchId))
    if (p.batchId > prev && state.get() != WalState.INACCESSIBLE_IO_FAILURE) {
      val obs = p.observedMetrics
      var observedRows = -1L
      if (obs != null && obs.containsKey("wal")) {
        val row = obs.get("wal")
        lastObserved.set(row.schema.fieldNames.map(f =>
          f -> row.getAs[Long](f)).toMap)
        observedRows = row.getAs[Long]("wal_num_records")
      }
      // the observed count rides the CONSUMER'S plan (post entity-type
      // filter), so a per-type consumer over a multiplexed WAL counts only
      // its own slice — the reference's per-consumer wal_num_synchronized
      // (`WalConsumer.java:49-54`: metrics are per consumer instance, and
      // each instance reads only its class's records). numInputRows is the
      // SOURCE-level count (pre-filter) and is only the fallback for
      // queries without the observe node.
      val rows = if (observedRows >= 0) observedRows else p.numInputRows
      lastBatchRows.set(rows)
      if (rows > 0) {
        numSynchronized.addAndGet(rows)
        if (notEmptySinceMs < 0) notEmptySinceMs = System.currentTimeMillis()
        state.set(WalState.NOT_EMPTY)
      } else {
        notEmptySinceMs = -1L
        state.set(WalState.EMPTY)
      }
    }
  }

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    if (mine(e.progress.id)) absorb(e.progress)

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    if (mine(e.id)) {
      // IO-caused death → the reference's INACCESSIBLE_IO_FAILURE
      // (`WalConsumer.java:137-142`); clean stop or non-IO bug → NONE.
      // Heuristic: the event only carries the exception as a STRING (no
      // typed cause), so this is a fallback — the foreachBatchSync
      // ioFailure() callback is the authoritative signal. The match is
      // anchored to a cause-chain boundary (the fully-qualified class
      // name opening the trace or a "Caused by:" line), so a failure
      // whose MESSAGE merely mentions "IOException" is not mislabeled.
      val io = e.exception.exists(_.linesIterator.exists { l =>
        val t = l.stripLeading()
        t.startsWith("java.io.IOException") || t.startsWith("Caused by: java.io.IOException")
      })
      state.set(if (io) WalState.INACCESSIBLE_IO_FAILURE else WalState.NONE)
    }
}

/** Per-progress gauge reporter — the reference's JmxReporter analog
  * (`WalConsumer.java:106-114`, which registers every gauge/meter with a
  * JMX reporter at consumer construction): on each progress event of the
  * owning query, snapshots [[WalMetrics.gauges]] and hands the map to
  * `emit` — a log line by default; a Prometheus/StatsD/JMX push in
  * production (the key set is stable, asserted by ObservabilitySpec).
  * Registered and removed by [[WalPipeline]] alongside the metrics
  * listener. The listener bus is async and delivery order between the
  * two listeners is unspecified, so a snapshot may trail the event that
  * triggered it by one batch — gauges are level-valued, so every
  * scrape-style consumer tolerates that by construction. */
final class WalMetricsReporter(
    metrics: WalMetrics,
    emit: Map[String, Long] => Unit) extends StreamingQueryListener {
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    if (metrics.queryId != null && metrics.queryId == e.progress.id)
      emit(metrics.gauges)
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

object WalMetricsReporter {
  /** Default emit target: one log line per progress event. */
  val logEmit: Map[String, Long] => Unit = { g =>
    org.slf4j.LoggerFactory.getLogger(classOf[WalMetricsReporter])
      .info(g.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("wal gauges: ", " ", ""))
  }
}

/** Lifecycle wrapper — the Spark form of the reference's consumer object
  * (`WalConsumer.java:127-181` start / `:299-317` close):
  *
  *   reference                      | here
  *   -------------------------------|----------------------------------
  *   dedicated consumer thread      | StreamingQuery micro-batch loop
  *   poll sleep 1000 ms when empty  | Trigger.ProcessingTime(pollMillis)
  *   row-lock serialization         | checkpointed offsets, single writer
  *   delete head + commit           | checkpoint commit after foreachBatch
  *   close(): stop flag+interrupt   | query.stop()
  *   metric unregister on close     | listener removed on close()
  *
  * `entityType`: registration-model selector — the reference constructs
  * each consumer FOR one entity class and it reads only that class's
  * records (`WalConsumer.java:339-352`); pass `Some(type)` to drain only
  * that type's sub-log from a multiplexed WAL (the filter reaches the
  * source scan, see [[Streams.forEntityType]]). `None` (default) drains
  * everything — the single-type deployment, or a [[MultiplexWalSink]]
  * dispatching per type. */
final class WalPipeline(
    records: Dataset[WalRecord],
    sink: WalSink,
    checkpointDir: String,
    pollMillis: Long = 1000L,
    retrySleepMs: Long = 1000L,
    reporterEmit: Map[String, Long] => Unit = WalMetricsReporter.logEmit,
    entityType: Option[String] = None) {

  val metrics = new WalMetrics
  private val reporter = new WalMetricsReporter(metrics, reporterEmit)
  private var query: StreamingQuery = _

  /** Start draining the WAL into the sink (at-least-once + idempotent
    * sink = exactly-once effect). */
  def start(): StreamingQuery = synchronized {
    require(query == null, "already started")
    records.sparkSession.streams.addListener(metrics)
    records.sparkSession.streams.addListener(reporter)
    // observe() rides the batch plan (no second pass): the record count
    // lands in every StreamingQueryProgress.observedMetrics, the
    // listener-visible/exportable twin of the WalMetrics gauges.
    // A start() that fails must not leak its listeners: the reference's
    // HA story is N competing consumers where the losers fail the lock
    // race gracefully (`WalConsumer.java:185-193,219-228`); here the
    // loser is a second pipeline on the SAME checkpoint, refused by
    // Spark's active-run exclusivity — it must leave the session exactly
    // as it found it (RecoverySpec's two-instance scenario).
    val selected = entityType.fold(records)(t => Streams.forEntityType(records, t))
    try {
      query = selected
        .observe("wal", org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("wal_num_records"))
        .writeStream
        .foreachBatch(Streams.foreachBatchSync(sink, retrySleepMs,
          onIoFailure = () => metrics.ioFailure(),
          onRecovered = () => metrics.recovered(),
          onIgnored = n => metrics.numIgnoredAlreadyDone.addAndGet(n)))
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.ProcessingTime(pollMillis))
        .start()
    } catch {
      case t: Throwable =>
        records.sparkSession.streams.removeListener(metrics)
        records.sparkSession.streams.removeListener(reporter)
        throw t
    }
    metrics.queryId = query.id
    // progress events posted before the assignment above were dropped by
    // the listener's scope filter; replay them (deduplicated by batchId)
    query.recentProgress.foreach(metrics.absorb)
    query
  }

  /** Drain everything currently in the WAL, then return (test/backfill
    * convenience — the reference has no equivalent; its loop never ends). */
  def processAllAvailable(): Unit = {
    val q = synchronized {
      require(query != null, "pipeline not started")
      query
    }
    q.processAllAvailable()
  }

  def close(): Unit = synchronized {
    if (query != null) {
      query.stop()
      records.sparkSession.streams.removeListener(metrics)
      records.sparkSession.streams.removeListener(reporter)
      metrics.closed()
      query = null
    }
  }
}
