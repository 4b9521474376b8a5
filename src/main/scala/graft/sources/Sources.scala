package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.WalRecord

/** Source/sink surface. The reference reads its WAL from whatever RDBMS
  * Hibernate points at and writes to arbitrary external targets through the
  * sink callback (`/root/reference/src/test/resources/hibernate.cfg.xml:7-12`,
  * `WalEntityConsumerCallback.java:10-17`). The Spark re-expression keeps
  * both ends pluggable:
  *
  *  - batch sources: parquet / csv / json / jdbc (jdbc = the direct
  *    analog of the reference's RDBMS WAL table);
  *  - streaming sources: file-arrival streams over the same formats with
  *    a fixed schema (required by Structured Streaming), plus rate for
  *    testing;
  *  - sinks: partitioned/bucketed parquet writers (bucketing pre-shuffles
  *    by join key so downstream joins on that key skip their exchange),
  *    and the streaming foreachBatch sink in graft.streaming.Streams.
  *
  * Scale notes: every reader exposes options for partition sizing
  * (`maxFilesPerTrigger` on streams); writers default to partitioning by a
  * low-cardinality column, never by high-cardinality keys (small-files
  * problem). No collect anywhere.
  */
object Sources {

  /** The WAL schema, fixed — streaming sources must declare it up front
    * (mirrors `WalEntity.java:27-46`). */
  val walSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("entityId", LongType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  // ---- batch sources ----

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType = null,
      header: Boolean = true): DataFrame = {
    val r = spark.read.option("header", header.toString)
    (if (schema != null) r.schema(schema) else r.option("inferSchema", "true")).csv(path)
  }

  def json(spark: SparkSession, path: String, schema: StructType = null): DataFrame = {
    val r = spark.read
    (if (schema != null) r.schema(schema) else r).json(path)
  }

  /** JDBC WAL table — the direct analog of the reference's source. Pass
    * predicates/partitioning options for parallel reads (numPartitions +
    * partitionColumn=id bounds the per-task slice of the log). */
  def jdbc(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table)
      .options(options).load()

  // ---- streaming sources ----

  /** File-arrival WAL stream: new files dropped into `path` are consumed
    * in arrival order, `maxFilesPerTrigger` bounds micro-batch size (the
    * Spark analog of the reference's head-poll loop, `WalConsumer.java:130-154`). */
  def walFileStream(spark: SparkSession, path: String, format: String = "parquet",
      maxFilesPerTrigger: Int = 16): Dataset[WalRecord] = {
    import spark.implicits._
    spark.readStream
      .schema(walSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .format(format)
      .load(path)
      .as[WalRecord]
  }

  // ---- sinks ----

  /** Partitioned parquet sink. `partitionBy` should be low-cardinality
    * (date, type); sorting within partitions improves scan locality and
    * min/max pruning on the sort key. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(col): _*) else df
    sorted.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Compact a parquet directory to ~targetBytes files. Streaming sinks
    * and partitioned merges accrete small files; scans then pay per-file
    * open cost and lose row-group locality. Rewrites into
    * ceil(total/target) files via coalesce (no shuffle) and swaps the
    * directory atomically via rename. Returns the new file count. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // refuse Hive-partitioned layouts: a flat rewrite would destroy the
    // partition directories (and their pruning); compact per leaf instead
    val partitioned = fs.listStatus(p).exists(s => s.isDirectory && s.getPath.getName.contains("="))
    require(!partitioned,
      s"$path has partition directories — compact each leaf directory instead")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    require(!fs.exists(old),
      s"$old exists — a previous compact crashed mid-swap; recover it first")
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    spark.read.parquet(path).coalesce(nFiles).write
      .mode("overwrite").parquet(tmp.toString)
    // two renames, checked: a crash between them leaves the data intact at
    // __old (detected and refused by the guard above on the next run)
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compact: failed to move $p aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // roll back
      throw new java.io.IOException(s"compact: failed to install $tmp")
    }
    fs.delete(old, true)
    nFiles
  }

  /** Bucketed table sink: pre-shuffles on the bucket key once at write
    * time, so every later equi-join/agg on that key runs shuffle-free.
    * Requires saveAsTable (bucketing lives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
