package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.util.Json

/** Per-table corpus fingerprint, written alongside every Bench/Verify
  * artifact so bench numbers are attributable across test-data
  * regenerations.
  *
  * Why this exists: the driver regenerates `/root/testdata` between
  * rounds, and a past round's bench inflated 3–5× on untouched
  * events/documents readers with nothing recorded to say whether the
  * regenerated tables were simply bigger. One look at (rows, bytes,
  * key range) per table answers that in seconds; without it the
  * question costs a forensic session. rows comes from a column-less
  * count (parquet answers it from footer metadata), bytes from a
  * filesystem listing, min/max key from a single-column footer-stats
  * scan — the whole dump is metadata-cheap at any corpus size.
  */
object CorpusStats {
  /** One stable key column per table: its min/max pins the key-range
    * shape operators depend on (dense-from-0 orderkeys, doc_id splits). */
  private val keyCols: Map[String, String] = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "documents" -> "doc_id",
    "embeddings" -> "vec_id", "events" -> "event_id")

  /** `{"dir":...,"tables":{name:{"rows":N,"bytes":N,"min_key":N,"max_key":N},...}}`
    * — one line, deterministic table order. */
  def json(spark: SparkSession, dir: String): String = {
    val hconf = spark.sessionState.newHadoopConf()
    val entries = (Tables.plainNames :+ "events").map { name =>
      // events goes through Tables.events: a bare read of its parquet
      // throws or yields NTZ depending on the round's generated format
      val df =
        if (name == "events") Tables.events(spark, dir)
        else Tables.table(spark, dir, name)
      val key = keyCols(name)
      val r = df.agg(
        count(lit(1)),
        min(col(key)).cast("long"),
        max(col(key)).cast("long")).collect()(0)
      val bytes = {
        val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
        val fs = org.apache.hadoop.fs.FileSystem.get(p.toUri, hconf)
        val it = fs.listFiles(p, true)
        var total = 0L
        while (it.hasNext) total += it.next().getLen
        total
      }
      s"${Json.quote(name)}:" +
        s"""{"rows":${r.getLong(0)},"bytes":$bytes,""" +
        s""""min_key":${r.getLong(1)},"max_key":${r.getLong(2)}}"""
    }
    s"""{"dir":${Json.quote(dir)},"tables":{${entries.mkString(",")}}}"""
  }

  /** Write the dump to `path` (best-effort caller decides error policy). */
  def write(spark: SparkSession, dir: String, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      json(spark, dir) + "\n")
}
