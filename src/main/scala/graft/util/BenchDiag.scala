package graft.util

/** Shared per-attempt bench diagnostics (the SPARK_GRAFT_BENCH_DIAG
  * hook, r15): cumulative JVM GC ms, used heap, and the
  * spark/RocksDB/feed scratch footprint under java.io.tmpdir, appended
  * as one JSONL line after every timed attempt. Lets a re-read pin an
  * inflated leg to session aging (GC/heap climb) vs state/scratch
  * accumulation vs host band (all flat). Factored out of [[graft.Bench]]
  * so [[graft.BenchScaling]] legs can log the same evidence — the r15
  * verdict's x2@64× question is a SCALING leg, which the Bench-only hook
  * could not instrument. Best-effort and opt-in: the tmpdir walk costs
  * real time on big scratch trees, so it must never run on a driver
  * bench. */
object BenchDiag {
  def log(path: Option[String], name: String, sec: Double,
      extra: Map[String, String] = Map.empty): Unit = path.foreach { p =>
    try {
      import scala.jdk.CollectionConverters._
      val gcMs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).filter(_ > 0).sum
      val heapMb = java.lang.management.ManagementFactory
        .getMemoryMXBean.getHeapMemoryUsage.getUsed >> 20
      def sizeOf(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).getOrElse(Array.empty).map(sizeOf).sum
      val scratchMb = Option(new java.io.File(System.getProperty("java.io.tmpdir"))
          .listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("spark-") ||
          f.getName.contains("StateStore") || f.getName.startsWith("graft_") ||
          f.getName.startsWith("temporary-"))
        .map(sizeOf).sum >> 20
      val extras = extra.map { case (k, v) => s",${Json.quote(k)}:${Json.quote(v)}" }.mkString
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        s"""{"q":${Json.quote(name)},"sec":${f"$sec%.3f"},"gc_ms":$gcMs,""" +
          s""""heap_mb":$heapMb,"scratch_mb":$scratchMb$extras}""" + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Throwable => }
  }
}
