package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe (test scope): isolate coarse_fine_budgeted_qps from the
  * rest of the Bench engine block to localize the r5→r6 drop — same
  * fixtures, same artifacts, nothing else running in the session.
  * `sbt 'Test/runMain graft.BudgetedProbe <sfDir>'`
  */
object BudgetedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.index.{RQTrainer, CodeAssigner, ClusterIndexBuilder}
    import graft.search.CoarseFineRetriever
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    spark.range(1000).select(avg(col("id"))).write.format("noop").mode("overwrite").save()
    val docs = SparkEntry.docVecs(spark, sfDir).cache()
    val nVec = docs.count()
    val queries = SparkEntry.queryVecs(spark, sfDir).cache()
    val nQ = queries.count().toDouble
    val cb = RQTrainer.fit(docs.select("doc_id", "vec"), "vec",
      numLevels = 2, k = 8, seed = 42L)
    val index = ClusterIndexBuilder.build(CodeAssigner.assign(docs, cb)).cache()
    index.count()
    val k = math.min(1000, nVec.toInt)
    for (i <- 1 to 4) {
      val sec = timed {
        CoarseFineRetriever.retrieveBudgeted(
          queries.select("query_id", "qvec"), index,
          docs.select("doc_id", "vec"), cb, beams = 4, k = k,
          budget = math.max(k, 100))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"budgeted iter $i: ${sec}%.3f s  (${nQ / sec}%.1f qps)")
    }
    // the plain retrieve for contrast
    for (i <- 1 to 2) {
      val sec = timed {
        CoarseFineRetriever.retrieve(
          queries.select("query_id", "qvec"), index,
          docs.select("doc_id", "vec"), cb, beams = 4, k = k)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"plain    iter $i: ${sec}%.3f s  (${nQ / sec}%.1f qps)")
    }
    spark.stop()
  }
}
