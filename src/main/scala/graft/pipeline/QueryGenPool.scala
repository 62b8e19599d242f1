package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A8 — query-generation pool backfill (complement_qg10.py:86-120): keep
  * invoking the (opaque) query generator for docs that still have fewer
  * than `minPerDoc` distinct non-empty queries, until every doc is covered
  * or `maxRounds` is exhausted. The loop is driver-side control flow over
  * fully distributed rounds — the reference's own structure, with the
  * per-round dedup expressed as one groupBy.
  */
object QueryGenPool {

  /** @param initial  (doc_id, query) existing pool
    * @param generate (docsNeedingMore(doc_id, have), round) → (doc_id, query)
    * @return (doc_id, queries ARRAY<STRING> distinct sorted, n_queries)
    */
  def backfill(
      initial: DataFrame,
      minPerDoc: Int,
      maxRounds: Int = 5)(
      generate: (DataFrame, Int) => DataFrame): DataFrame = {

    // derived round width (r18, the RoundLayout discipline): each round
    // plans a join + two aggregations over the pool — at the session
    // width a fixture-scale pool runs every round as stacks of
    // near-empty tasks (measured: 26 jobs / 525 tasks / 3.3 task-sec
    // for 1.7 CPU-sec over a 60-doc universe). Width derives from the
    // universe size (one extra count pass over `initial`'s doc ids — a
    // projection of the input), capped at the session width, so
    // production pools keep full parallelism; the universe/pool caches
    // are then BUILT inside the scope so their cached partitioning is
    // the round width, not the session's. PRECONDITION: scopes session
    // conf via RoundLayout — don't plan unrelated queries on this
    // SparkSession concurrently (see RoundLayout's scaladoc).
    val nDocs = initial.select("doc_id").distinct().count()
    val p = graft.core.RoundLayout.roundPartitions(initial, nDocs)
    graft.core.RoundLayout.withShufflePartitions(initial, p) {

    // the doc universe comes from `initial` BEFORE the validity filter:
    // docs whose existing queries are all null/empty need backfill the
    // most and must not vanish from the loop
    val universe = initial.select("doc_id").distinct().persist()
    universe.count()

    var pool = initial
      .where(col("query").isNotNull && length(trim(col("query"))) > 0)
      .select("doc_id", "query").distinct().persist()
    pool.count()

    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      // count(*), not countDistinct: the pool is maintained distinct on
      // (doc_id, query), so a distinct-aggregate expand would be pure waste
      val counts = universe.join(
        pool.groupBy("doc_id").agg(count(col("query")).as("have")),
        Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("have"), lit(0L)).as("have"))
      val need = counts.where(col("have") < minPerDoc)
      if (need.isEmpty) {
        done = true
      } else {
        val fresh = generate(need, round)
          .where(col("query").isNotNull && length(trim(col("query"))) > 0)
          .select("doc_id", "query")
        val next = pool.union(fresh).distinct().persist()
        next.count()
        pool.unpersist()
        pool = next
        round += 1
      }
    }

    // left-join back to the universe: a doc still uncovered after
    // maxRounds appears with an empty list, not silently dropped
    val out = universe.join(
      pool.groupBy("doc_id")
        .agg(sort_array(collect_set(col("query"))).as("queries")),
      Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("queries"), array().cast("array<string>")).as("queries"))
      .select(col("doc_id"), col("queries"), size(col("queries")).as("n_queries"))
      .persist()
    out.count() // materialize before releasing the inputs it derives from
    pool.unpersist()
    universe.unpersist()
    out // caller owns the returned frame's persistence
    } // withShufflePartitions — out is materialized inside the scope
  }
}
