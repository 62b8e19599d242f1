package graft.search

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable.ArrayBuffer

/** One scored candidate. Ties broken by ascending id for determinism. */
case class ScoredDoc(id: Long, score: Double)

/** Bounded buffer: worst-of-top-k pruning happens on overflow, so partial
  * (map-side) aggregation never holds more than 4k candidates per group.
  */
case class TopKBuffer(k: Int, items: ArrayBuffer[ScoredDoc])

/** Grouped bounded top-k as a partial-aggregatable `Aggregator`.
  *
  * Re-expresses the reference's streaming bounded top-k — running
  * `torch.topk` over scanned doc batches (MEVI/main_models.py:3819-3876,
  * 3979-3989) — as Spark's partial+final aggregation: each map task keeps a
  * bounded buffer (combiner-side pruning), merge is concat+prune. At 100 TB
  * this is the difference between shuffling every scored (query, doc) pair
  * and shuffling ≤ k rows per (group, map task).
  *
  * Output is sorted by (score desc, id asc) — canonical for oracle hashing.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredDoc, TopKBuffer, Seq[ScoredDoc]] {

  private val overflow = math.max(4 * k, 64)

  override def zero: TopKBuffer = TopKBuffer(k, ArrayBuffer.empty)

  private def prune(buf: TopKBuffer, to: Int): TopKBuffer = {
    if (buf.items.length > to) {
      val kept = buf.items.sortBy(d => (-d.score, d.id)).take(k)
      TopKBuffer(k, ArrayBuffer.from(kept))
    } else buf
  }

  override def reduce(b: TopKBuffer, a: ScoredDoc): TopKBuffer = {
    b.items += a
    prune(b, overflow)
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    b1.items ++= b2.items
    prune(b1, k)
  }

  override def finish(r: TopKBuffer): Seq[ScoredDoc] =
    r.items.sortBy(d => (-d.score, d.id)).take(k).toSeq

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.kryo[TopKBuffer]
  override def outputEncoder: Encoder[Seq[ScoredDoc]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredDoc]]()
}

/** Bounded buffer for [[MinKLongsAggregator]] — same overflow-prune
  * discipline as [[TopKBuffer]].
  */
case class MinKBuffer(k: Int, items: ArrayBuffer[Long])

/** Grouped bounded k-SMALLEST-ids as a partial-aggregatable `Aggregator` —
  * the capped-sample replacement for `collect_list` in group REPORTS
  * (e.g. duplicate-group membership samples): a group with 10⁸ members
  * costs the same bounded buffer as a group with 10. Exact over the full
  * Long domain (no Double round-trip — ids above 2^53 stay exact).
  * Output sorted ascending, deterministic for oracle hashing.
  */
class MinKLongsAggregator(k: Int)
    extends Aggregator[Long, MinKBuffer, Seq[Long]] {

  private val overflow = math.max(4 * k, 64)

  override def zero: MinKBuffer = MinKBuffer(k, ArrayBuffer.empty)

  private def prune(buf: MinKBuffer, to: Int): MinKBuffer = {
    if (buf.items.length > to) {
      val kept = buf.items.sorted.take(k)
      MinKBuffer(k, ArrayBuffer.from(kept))
    } else buf
  }

  override def reduce(b: MinKBuffer, a: Long): MinKBuffer = {
    b.items += a
    prune(b, overflow)
  }

  override def merge(b1: MinKBuffer, b2: MinKBuffer): MinKBuffer = {
    b1.items ++= b2.items
    prune(b1, k)
  }

  override def finish(r: MinKBuffer): Seq[Long] =
    r.items.sorted.take(k).toSeq

  override def bufferEncoder: Encoder[MinKBuffer] = Encoders.kryo[MinKBuffer]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object TopK {
  /** Untyped column form of the bounded k-smallest-ids sample:
    * `df.groupBy("h").agg(TopK.minIds(8)($"doc_id"))` → `ARRAY<BIGINT>`
    * ascending. Replaces `sort_array(collect_list(id))` wherever the
    * group size is adversary-controlled.
    */
  def minIds(k: Int): Column => Column = { id =>
    udaf(new MinKLongsAggregator(k), Encoders.scalaLong).apply(id)
  }

  /** Untyped column form: `df.groupBy("qid").agg(TopK.topk(10)($"doc_id", $"score"))`
    * → `ARRAY<STRUCT<id BIGINT, score DOUBLE>>` ranked best-first.
    */
  def topk(k: Int): (Column, Column) => Column = { (id, score) =>
    udaf(new TopKAggregator(k), Encoders.product[ScoredDoc])
      .apply(id, score)
  }

  /** The canonical ranked-hit output: scored (query_id, doc_id, score) rows
    * → (query_id, rank 1-based, doc_id, score), grouped bounded top-k.
    * Single definition of the engine's ranked-list contract (tie-break,
    * rank base, column names) shared by every retrieval path.
    */
  def ranked(scored: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    scored
      .groupBy("query_id")
      .agg(topk(k)(col("doc_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "sd")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("sd.id").as("doc_id"), col("sd.score").as("score"))
  }
}
