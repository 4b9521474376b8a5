package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** RDD-layer release for `localCheckpoint(true)`'d frames.
  *
  * `Dataset.unpersist()` only uncaches CacheManager-registered plans — a
  * localCheckpoint'ed frame's blocks live on the INTERNAL checkpointed
  * RDD, which the cache manager never sees, so calling `unpersist` on
  * the Dataset is a silent no-op and superseded checkpoint block sets
  * stack until the ContextCleaner's GC-driven sweep gets to them (the
  * exact failure [[graft.ops.Stages]] documents for its pinned-RDD
  * handles). Iterative operators that roll checkpoints each round
  * (BPE training, label propagation) must release at the RDD layer.
  *
  * Releasing invalidates the frame by design — localCheckpoint truncates
  * lineage, so a released frame cannot recompute. Release only frames
  * nothing will read again.
  */
object Checkpoints {
  /** The checkpointed RDD handles backing a localCheckpoint'ed frame —
    * the only handles through which its blocks can actually be freed. */
  def rdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }

  /** Free a superseded checkpoint's blocks. Non-blocking by default (the
    * caller is mid-loop; the block manager removes asynchronously) and
    * exception-tolerant (a failed release is a leak, not a correctness
    * error — the ContextCleaner backstop still applies).
    *
    * CONTRACT: pass only a DIRECT localCheckpoint result. This releases
    * EVERY LogicalRDD in the plan, so a frame DERIVED from another live
    * checkpointed frame (a join, a union) would silently free that
    * frame's blocks too — and the victim cannot recompute (truncated
    * lineage). Current call sites (the CC round loop, bpeTrainSeqs'
    * chain truncation) all hold direct checkpoint handles. */
  def release(df: DataFrame, blocking: Boolean = false): Unit =
    rdds(df).foreach { r =>
      try r.unpersist(blocking)
      catch { case scala.util.control.NonFatal(_) => () }
    }
}
