package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE catalog query and report its Spark job count and
  * wall-clock — the measurement behind action-count claims in query
  * comments (a localCheckpoint or eager count is one job; fixture-scale
  * cost is dominated by per-job fixed overhead, so job count is the
  * thing to minimize for composed pipelines).
  *
  * Usage: runMain graft.JobProbe <sfDir> <queryName>
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    val fn = SparkEntry.queries(name)
    // warm-up on a throwaway session state (parquet footer caches, JIT):
    // probe the SECOND run so the count reflects steady state
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    jobs.set(0)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"query":"$name","jobs":${jobs.get()},"sec":$sec%.3f}""")
    spark.stop()
  }
}
