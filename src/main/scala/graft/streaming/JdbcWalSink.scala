package graft.streaming

import java.sql.Connection

import scala.collection.concurrent.TrieMap

/** JDBC target for the WAL consumer — the reference's motivating fan-out
  * scenario (`/root/reference/README.md:15-17`: transfer the changes to
  * "another relational database, a NoSQL database, ... a queue"): each
  * WAL record is applied to a relational table with last-applied-id
  * idempotency, so at-least-once delivery yields exactly-once row state
  * (the same contract the reference's callback keeps via its own
  * bookkeeping, `WalEntityConsumerCallback.java:10-17`).
  *
  * Target table shape: `(entity_id BIGINT PRIMARY KEY, payload VARCHAR,
  * last_id BIGINT, deleted INT)`. DELETE keeps a TOMBSTONE row (deleted
  * = 1) rather than removing it: the idempotency watermark must survive
  * the delete, or a replayed earlier record would resurrect the entity.
  * Readers filter `deleted = 0` (see the RecoverySpec fan-out e2e, which
  * reads back through [[graft.sources.Sources.jdbc]]).
  *
  * `syncEntity` contract: returns false (already applied) when the
  * stored watermark is ≥ the record id — on a lastId TIE the stored row
  * wins, mirroring SnapshotTable.merge and the reference's redo
  * detection (`WalHeadHandle.java:29-42`).
  *
  * Connections are pooled per URL, JVM-wide, and serialized per
  * statement: [[Streams.foreachBatchSync]] applies records from executor
  * threads (per-partition), and JDBC connections are not safe for
  * concurrent use. Per-entity ordering is the batch's repartition+sort
  * contract; cross-entity interleaving is fine because rows are
  * independent. A driver for the URL must be on the executor classpath
  * (DriverManager's ServiceLoader finds it — Derby/Postgres/MySQL all
  * register themselves). */
final class JdbcWalSink(url: String, table: String) extends WalSink {
  require(table.matches("[A-Za-z_][A-Za-z0-9_]*"), s"unsafe table name: $table")

  /** SQL failures are rethrown as IOException: the consume loop's
    * retry-forever contract ([[Streams.foreachBatchSync]], mirroring the
    * reference's sleepMillisOnIoFailure) is keyed on IO — without this
    * translation a transient JDBC outage (connection refused, table
    * briefly absent mid-migration, failover) would KILL the query
    * instead of parking it in INACCESSIBLE_IO_FAILURE until the target
    * returns. The sink stays idempotent across retries by construction,
    * so at-least-once redelivery after an outage is safe. */
  override def syncEntity(r: WalRecord): Boolean =
    try syncOnce(r)
    catch { case e: java.sql.SQLException =>
      throw new java.io.IOException(s"jdbc target unavailable: ${e.getMessage}", e)
    }

  private def syncOnce(r: WalRecord): Boolean =
    JdbcWalSink.withConnection(url) { c =>
      val sel = c.prepareStatement(s"SELECT last_id FROM $table WHERE entity_id = ?")
      val prev =
        try {
          sel.setLong(1, r.entityId)
          val rs = sel.executeQuery()
          try { if (rs.next()) Some(rs.getLong(1)) else None } finally rs.close()
        } finally sel.close()
      if (prev.exists(_ >= r.id)) false // already applied (replay) — ignore
      else {
        val deleted = if (r.operation == "DELETE") 1 else 0
        val payload = if (deleted == 1) null else r.payload
        val st =
          if (prev.isEmpty)
            c.prepareStatement(
              s"INSERT INTO $table (entity_id, payload, last_id, deleted) VALUES (?, ?, ?, ?)")
          else
            c.prepareStatement(
              s"UPDATE $table SET payload = ?, last_id = ?, deleted = ? WHERE entity_id = ?")
        try {
          if (prev.isEmpty) {
            st.setLong(1, r.entityId); st.setString(2, payload)
            st.setLong(3, r.id); st.setInt(4, deleted)
          } else {
            st.setString(1, payload); st.setLong(2, r.id)
            st.setInt(3, deleted); st.setLong(4, r.entityId)
          }
          st.executeUpdate()
        } finally st.close()
        true
      }
    }
}

object JdbcWalSink {
  /** One connection per URL for the whole JVM (local mode: driver and
    * executors share it). Never closed explicitly — embedded engines
    * (Derby) tear down with the JVM, and server connections die with the
    * process; a closed/broken entry is replaced on next use. */
  private val pool = TrieMap.empty[String, Connection]

  private def connection(url: String): Connection = {
    val c = pool.getOrElseUpdate(url, java.sql.DriverManager.getConnection(url))
    if (c.isClosed) { pool.remove(url, c); connection(url) } else c
  }

  private[streaming] def withConnection[A](url: String)(f: Connection => A): A = {
    val c = connection(url)
    c.synchronized(f(c))
  }

  /** Create the target table if absent (idempotent — the DDL a real
    * deployment runs once, a test calls before starting the pipeline). */
  def ensureTable(url: String, table: String): Unit = withConnection(url) { c =>
    val meta = c.getMetaData.getTables(null, null, table.toUpperCase, null)
    val exists = try meta.next() finally meta.close()
    if (!exists) {
      val st = c.createStatement()
      try st.executeUpdate(
        s"""CREATE TABLE $table (
           |  entity_id BIGINT PRIMARY KEY,
           |  payload VARCHAR(32672),
           |  last_id BIGINT NOT NULL,
           |  deleted INT NOT NULL)""".stripMargin)
      finally st.close()
    }
  }
}
