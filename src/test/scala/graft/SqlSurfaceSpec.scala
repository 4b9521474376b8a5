package graft

/** The SQL-view surface: [[SparkEntry.registerQueryViews]] must make
  * EVERY registered operator SELECTable as `graft_<key>` from
  * `spark.sql`, with results identical to the DataFrame form — the
  * composability contract (a user can join/filter any operator's output
  * in plain SQL without touching the Scala API). Runs on sf0.001 so the
  * full registered surface (including the streaming gates, which execute
  * once at registration) stays cheap. */
class SqlSurfaceSpec extends SparkTestBase {

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("every registered key is SELECTable as graft_<key> and matches the DataFrame form") {
    SparkEntry.registerTables(spark, sf0001)
    SparkEntry.registerQueryViews(spark, sf0001)
    val mismatches = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val viaSql = spark.sql(s"SELECT * FROM graft_$name")
      val direct = fn(spark, sf0001)
      if (viaSql.schema != direct.schema)
        Some(s"$name: schema ${viaSql.schema.simpleString} vs ${direct.schema.simpleString}")
      else if (canon(viaSql.collect()) != canon(direct.collect()))
        Some(s"$name: values differ between SQL view and DataFrame form")
      else None
    }
    assert(mismatches.isEmpty, mismatches.mkString("\n"))
  }

  test("views compose in SQL across operators") {
    SparkEntry.registerTables(spark, sf0001)
    SparkEntry.registerQueryViews(spark, sf0001, Seq("x9_quality", "x1_dedup_exact"))
    // a real cross-operator composition: quality stats of the exact-dedup
    // keepers — joins two operator views in plain SQL
    val kept = spark.sql(
      """SELECT count(*) AS n, sum(q.n_tok) AS toks
        |FROM graft_x1_dedup_exact d
        |JOIN graft_x9_quality q ON d.keep_id = q.doc_id""".stripMargin).collect()
    assert(kept.length == 1 && kept(0).getLong(0) > 0, kept.mkString)
  }

  test("unknown keys are rejected at registration, not at SELECT") {
    val e = intercept[IllegalArgumentException] {
      SparkEntry.registerQueryViews(spark, sf0001, Seq("nope_key"))
    }
    assert(e.getMessage.contains("nope_key"))
  }
}
