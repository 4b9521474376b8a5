package graft

import graft.SparkTestBase

/** The corpus fingerprint must stay machine-readable (one JSON object)
  * and factually right — it is the artifact that makes bench deltas
  * attributable across driver test-data regenerations. */
class CorpusStatsSpec extends SparkTestBase {

  test("corpus stats json: parseable, complete, and counts match the tables") {
    val out = CorpusStats.json(spark, sf0001)
    // parse with Spark's own JSON reader — no extra deps, and a real
    // parser (not a regex) is the machine-readability claim
    import spark.implicits._
    val parsed = spark.read.json(Seq(out).toDS())
    assert(parsed.count() == 1)
    val tables = parsed.select("tables.*").schema.fieldNames.toSet
    val expected = (graft.model.Tables.plainNames :+ "events").toSet
    assert(tables == expected, s"table set mismatch: $tables vs $expected")
    // spot-check facts against direct reads
    val r = parsed.select("tables.lineitem.rows", "tables.lineitem.min_key",
      "tables.lineitem.max_key", "tables.events.rows").collect()(0)
    assert(r.getLong(0) == graft.model.Tables.lineitem(spark, sf0001).count())
    assert(r.getLong(1) == 0L)
    assert(r.getLong(3) == graft.model.Tables.events(spark, sf0001).count())
    // bytes are real filesystem sizes (non-zero for every table)
    val anyZero = parsed.selectExpr(
      expected.toSeq.sorted.map(t => s"tables.$t.bytes").mkString("stack(" +
        expected.size + ", ", ", ", ") as (b)")).filter("b <= 0").count()
    assert(anyZero == 0, "a table reported zero bytes")
  }
}
