package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for every registered query to a
  * directory (one file per key) — the round-19 optimization audit's raw
  * material. Args: [sfDir] [outDir]. SPARK_GRAFT_PLAN_KEYS=a,b,c limits
  * the set (streaming-gate keys execute their gate at construction, so a
  * full dump at a small SF is the cheap way to run this).
  *
  * Plans are captured BEFORE execution, so AQE subtrees print as
  * `AdaptiveSparkPlan isFinalPlan=false` — the shape (Exchange count,
  * join strategy, PushedFilters/ReadSchema) is what the audit reads. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "plans/r19/raw"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val only = sys.env.get("SPARK_GRAFT_PLAN_KEYS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val keys = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    keys.foreach { case (name, fn) =>
      val out = Paths.get(outDir, s"$name.txt")
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(out, txt)
      } catch {
        case e: Throwable =>
          Files.writeString(out, s"ERROR: ${e.getClass.getName}: ${e.getMessage}\n")
      }
    }
    spark.stop()
  }
}
