package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join: attach to each left row the LATEST right row at
  * or before its timestamp, per partition key — the "most recent prior
  * state" lookup (price as of trade time, last click before purchase).
  *
  * Spark has no native ASOF JOIN; the naive theta join
  * (`l.ts >= r.ts` + per-pair max) explodes quadratically per key. This
  * is the scalable union+window formulation: tag both sides, union, sort
  * within each partition key by (time, side), and carry the last-seen
  * right row forward with `last(..., ignoreNulls)` over an unbounded-
  * preceding window. ONE shuffle on the partition key, zero row blowup,
  * any key cardinality.
  *
  * Tie rules (deterministic): at equal time the right row is visible to
  * the left row (`<=` semantics); among right rows sharing a timestamp
  * the greatest `tieCol` wins.
  */
object AsOfJoin {

  /** Left rows with a `asof` struct column holding the matched right row
    * (null when no right row precedes). `on`: equi partition keys.
    */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      timeCol: String, tieCol: String): DataFrame = {
    val rPayload = struct(right.columns.map(col): _*)
    val rType = right.select(rPayload.as("r")).schema.head.dataType
    val lPayload = struct(left.columns.map(col): _*)

    val rTagged = right.select(
      on.map(col) ++ Seq(col(timeCol).as("__t"), col(tieCol).as("__tie"),
        rPayload.as("__r"), lit(null).cast(left.select(lPayload.as("l"))
          .schema.head.dataType).as("__l"), lit(0).as("__side")): _*)
    val lTagged = left.select(
      on.map(col) ++ Seq(col(timeCol).as("__t"),
        lit(null).cast(right.schema(tieCol).dataType).as("__tie"),
        lit(null).cast(rType).as("__r"), lPayload.as("__l"),
        lit(1).as("__side")): _*)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    rTagged.unionByName(lTagged)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__l.*"), col("__asof").as("asof"))
  }
}
