package graft

class EntrySpec extends SparkSpec {

  test("entry returns non-empty metrics") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // metrics are averages in [0, 1]
    rows.foreach { r =>
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }

  test("every oracleSql key has a queries entry") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }


  // pair-mining queries are legitimately empty when the fixture has no
  // near-duplicates at this sf (sf0.1 plants 8 exact dups)
  private val mayBeEmpty = Set("dedup_minhash_pairs")

  // deliberate bounded cartesian: the exhaustive small-input oracle form
  // (docs gated to 200 rows; the scale path is the LSH variant)
  private val mayCartesian = Set("dedup_jaccard_topk")

  test("all queries run at sf0.001, return rows, and plan no unbroadcast cartesian") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf("0.001"))
      // pre-AQE physical plan: a CartesianProduct here means a corpus-sized
      // shuffle-shuffle cross join at scale (broadcast cross joins plan as
      // BroadcastNestedLoopJoin and are fine)
      val plan = df.queryExecution.sparkPlan.toString
      if (!mayCartesian(name))
        assert(!plan.contains("CartesianProduct"),
          s"query $name plans a CartesianProduct:\n$plan")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"query $name returned 0 rows")
    }
  }

  // the documented rows-only set: operators whose output has no SQL twin
  // (a deflate bitstream — cross-checked instead by InflateCodecSpec's
  // independent RFC-1951 decoder). Anything else missing an oracle is a gap.
  // Declared AFTER the catalog sweep: the trained-artifact oracles are
  // generated once the sweep has populated the artifact caches, exactly
  // as Verify evaluates oracleSql after running the queries.
  private val rowsOnly = Set("text_compress_ratio")

  test("every query is SQL-oracled except the documented rows-only set") {
    val unoracled = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(unoracled === rowsOnly,
      s"queries without an oracle beyond the documented set: ${unoracled.diff(rowsOnly)}")
  }
}
