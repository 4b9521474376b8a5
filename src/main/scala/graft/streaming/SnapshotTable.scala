package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** WAL stream → queryable parquet "current state" table.
  *
  * The reference's sink callback pushes each mutation into an external
  * store (`WalEntityConsumerCallback.java:10-17`); this is the built-in
  * store: a versioned parquet table holding the changelog's materialized
  * snapshot, updated by a foreachBatch MERGE (the R4+R5+R7 dataflow as
  * one operator).
  *
  * Each micro-batch writes a complete new version directory
  * `v=<n>` and readers always resolve the highest committed version — a
  * poor-man's snapshot-isolated table (the pattern Delta/Iceberg formalize
  * with a log; with only vanilla parquet available, version directories
  * give the same atomic-swap property because a version becomes visible
  * only when its _SUCCESS marker lands).
  *
  * MERGE semantics per batch (mirrors Streams.snapshotStream):
  * take the batch's last op per key (max id), outer-merge with the
  * previous snapshot, keep the newer side per key, drop DELETEs.
  * Replays (batch id ≤ stored id) lose the merge — idempotent, so
  * at-least-once delivery still yields exactly-once table state.
  *
  * Scale notes: the merge is one shuffle of (previous ∪ batch-partials)
  * on the key; the batch side is first collapsed per key map-side. At
  * 100 TB you'd partition the snapshot by key-hash range so each batch
  * rewrites only touched partitions (Delta-style); the merge plan is
  * unchanged.
  */
object SnapshotTable {

  private def versionDir(base: Path, v: Long) = new Path(base, s"v=$v")

  private def committedVersions(spark: SparkSession, base: String): Seq[Long] = {
    val p = new Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .filter(v => fs.exists(new Path(versionDir(p, v), "_SUCCESS")))
      .sorted
  }

  /** Latest committed snapshot (empty if none). Columns:
    * entityId, payload, lastId. */
  def read(spark: SparkSession, base: String): DataFrame =
    committedVersions(spark, base).lastOption match {
      case Some(v) => spark.read.parquet(versionDir(new Path(base), v).toString)
      case None =>
        import spark.implicits._
        Seq.empty[(Long, String, Long)].toDF("entityId", "payload", "lastId")
    }

  /** One merge step: previous snapshot ⊎ batch → next snapshot. Exposed
    * for tests; foreachBatch wiring below. */
  def merge(prev: DataFrame, batch: Dataset[WalRecord]): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val batchLast = batch
      .groupByKey(_.entityId)
      .reduceGroups((a, b) => if (a.id >= b.id) a else b)
      .map(_._2)
      .toDF("lastId", "entityId", "operation", "payload")
    prev.select(col("entityId"), col("payload"), col("lastId"))
      .withColumn("operation", lit(null).cast("string"))
      .withColumn("__new", lit(0))
      .unionByName(batchLast.withColumn("__new", lit(1)))
      .groupBy(col("entityId"))
      // ordering key (lastId, 1-__new): on a lastId tie the STORED row wins —
      // a replayed record with id == stored lastId is already applied
      .agg(max_by(struct(col("payload"), col("lastId"), col("operation"), col("__new")),
        struct(col("lastId"), lit(1) - col("__new"))).as("m"))
      .select(col("entityId"), col("m.payload").as("payload"),
        col("m.lastId").as("lastId"), col("m.operation").as("operation"))
      .filter(col("operation").isNull || col("operation") =!= "DELETE")
      .drop("operation")
  }

  /** foreachBatch function maintaining the table at `base`. */
  def sink(base: String): (Dataset[WalRecord], Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    val next = merge(read(spark, base), batch)
    val prevVersions = committedVersions(spark, base)
    val v = prevVersions.lastOption.getOrElse(-1L) + 1
    next.write.mode(SaveMode.Overwrite)
      .parquet(versionDir(new Path(base), v).toString)
    // retain only the latest two versions (readers of v-1 may be in flight)
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    prevVersions.dropRight(1).foreach(old =>
      fs.delete(versionDir(new Path(base), old), true))
  }

  /** Attach to a WAL stream: records → materialized snapshot table. */
  def materialize(records: Dataset[WalRecord], base: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    records.writeStream
      .foreachBatch(sink(base))
      .option("checkpointLocation", checkpointDir)
      .start()

  // ---- hash-partitioned variant: rewrite only touched partitions ----
  //
  // The flat sink above rewrites the whole snapshot every batch — fine for
  // tests, wrong at 100 TB. Here the table is laid out as
  // base/p=<hash(entityId) % nParts>/v=<n>/ with an independent version
  // chain per partition: a micro-batch reads and rewrites ONLY the
  // partitions its keys hash into (a batch touching 0.1% of keys rewrites
  // ~0.1% of the table). This is the file-layout half of what Delta/Iceberg
  // MERGE does; their transaction log would replace the _SUCCESS-gated
  // version dirs.

  private def partOf(nParts: Int) = pmod(col("entityId"), lit(nParts.toLong))

  /** Latest committed state of one hash partition. */
  private def readPart(spark: SparkSession, base: String, p: Long): DataFrame =
    read(spark, s"$base/p=$p")

  /** Full snapshot view across partitions. */
  def readPartitioned(spark: SparkSession, base: String, nParts: Int): DataFrame =
    (0L until nParts.toLong).map(p => readPart(spark, base, p)).reduce(_ unionByName _)

  /** foreachBatch function: merge into touched partitions only. */
  def partitionedSink(base: String, nParts: Int): (Dataset[WalRecord], Long) => Unit = {
    (batch, _) =>
      val spark = batch.sparkSession
      val cached = batch.cache()
      try {
        val touched = cached.select(partOf(nParts).as("p"))
          .distinct().collect().map(_.getLong(0)).sorted // ≤ nParts rows — bounded driver work
        touched.foreach { p =>
          import spark.implicits._
          val slice = cached.filter(partOf(nParts) === p).as[WalRecord]
          val next = merge(readPart(spark, base, p), slice)
          val partBase = s"$base/p=$p"
          val prevVersions = committedVersions(spark, partBase)
          val v = prevVersions.lastOption.getOrElse(-1L) + 1
          next.write.mode(SaveMode.Overwrite).parquet(s"$partBase/v=$v")
          val fs = new Path(partBase).getFileSystem(spark.sparkContext.hadoopConfiguration)
          prevVersions.dropRight(1).foreach(old => fs.delete(new Path(s"$partBase/v=$old"), true))
        }
      } finally cached.unpersist()
  }
}
