package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: attribute `curate_chain_build_sec` per stage — runs
  * [[SparkEntry.warmCurateChain]] with `SPARK_GRAFT_CHAIN_TRACE`
  * honored (set it in the environment) and prints total wall-clock.
  * The chain's staged writes (localCheckpoints) materialize at
  * construction, so each `[chain] <stage>` line on stderr is that
  * stage's real cost including everything un-checkpointed folded
  * above it.
  *
  * Usage: SPARK_GRAFT_CHAIN_TRACE=1 runMain graft.ChainProbe <sfDir>
  */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: ChainProbe <sfDir>")
      sys.exit(2)
    }
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    SparkEntry.warmCurateChain(spark, sfDir)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"chain_build_sec":$sec%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
