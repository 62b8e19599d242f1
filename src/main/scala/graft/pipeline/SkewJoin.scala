package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions.
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime, but it cannot help when the skewed key feeds an aggregation or
  * when a map-side join is impossible; the classic remedy is explicit
  * salting — spread the hot key's rows over `salt` sub-keys and replicate
  * the other side across all sub-keys, so one hot key occupies `salt`
  * tasks instead of one.
  *
  * The fact side's salt must only DISTRIBUTE rows (any per-row value is
  * correct); `spark_partition_id`-seeded round-robin keeps it deterministic
  * within a run without a row scan. The dim side replicates `salt`× — use
  * for dims that are small enough to replicate but too big or too
  * hot-keyed to broadcast outright.
  */
object SkewJoin {

  /** Inner join `fact ⨝ dim` on `key`, salted `salt` ways. */
  def salted(fact: DataFrame, dim: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    require(salt > 0)
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt))
        .cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
