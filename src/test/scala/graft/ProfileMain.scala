package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling driver (test scope only — not part of the library):
  * `sbt 'Test/runMain graft.ProfileMain <sfDir> <iters> <query...>'`
  * Times each named query (noop sink) and prints the formatted plan when
  * PROFILE_EXPLAIN=1.
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 2
    val names = if (args.length > 2) args.drop(2).toSeq else Seq("q5_region_revenue")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).select(avg(col("id"))).write.format("noop").mode("overwrite").save()
    def timed[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"warm: ${timed(SparkEntry.warmArtifacts(spark, dir))}%.2f s")
    for (n <- names) {
      if (sys.env.get("PROFILE_EXPLAIN").contains("1"))
        SparkEntry.queries(n)(spark, dir).explain("formatted")
      // closure re-invoked inside the timed block, exactly like Bench
      val times = (1 to iters).map(_ => timed(
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()))
      println(f"$n%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
