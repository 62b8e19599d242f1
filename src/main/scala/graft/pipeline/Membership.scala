package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable membership filtering (P9's 100 TB path).
  *
  * A broadcast `left_semi` join is the right tool while the key set fits
  * executor memory EXACTLY. Past that, Spark falls back to shuffling BOTH
  * sides — at 100 TB that shuffles the whole fact table to probe a key set
  * that is a fraction of it. The bloom path restores the broadcast shape
  * lossily: build a bloom filter over the keys (a fixed-size bitset that
  * fits in memory no matter the key count), filter the fact table map-side
  * with zero shuffle, then run the exact semi join on the survivors only —
  * the shuffle now carries |matches| + |false positives| rows instead of
  * |fact|. Result is EXACTLY the semi join (the confirm join removes the
  * false positives); the bloom only decides how much data moves.
  *
  * Same construction Spark itself uses for runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), exposed as an
  * explicit operator so the pre-filter applies to key sets the optimizer
  * cannot see through (e.g. keys from a separately-built artifact).
  */
object Membership {

  /** Exact semi join of `fact` to the long-typed key set `keys.keyCol`,
    * bloom-pre-filtered. `expectedItems`/`fpp` size the filter
    * (~ n·ln(1/fpp)·1.44 bits; 100M keys at 1% ≈ 171 MB — broadcastable
    * where the exact key set is not).
    */
  def bloomSemiJoin(fact: DataFrame, keys: DataFrame, factKeyCol: String,
      keyCol: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val spark = fact.sparkSession
    val bf = keys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfB.value.mightContainLong(k))
    fact.where(mightContain(col(factKeyCol)))
      .join(keys.select(col(keyCol).as(factKeyCol)).distinct(),
        Seq(factKeyCol), "left_semi")
  }
}
