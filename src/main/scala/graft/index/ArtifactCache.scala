package graft.index

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

/** Path-keyed artifact memoization — the engine-side equivalent of the
  * reference's recompute-avoidance (skip embed/cluster gen when the file
  * exists: MEVI/main_models.py:2944-2978,3099,3194). Within one JVM session
  * (Verify/Bench run all queries sequentially) the trained codebook and the
  * assignment DataFrame are reused instead of re-fit per query.
  */
object ArtifactCache {

  private val codebooks = TrieMap.empty[String, Codebook]
  private val frames = TrieMap.empty[String, DataFrame]

  def codebook(key: String)(train: => Codebook): Codebook =
    codebooks.getOrElseUpdate(key, train)

  /** Cached + persisted DataFrame (materialized once). */
  def frame(key: String)(build: => DataFrame): DataFrame =
    frames.getOrElseUpdate(key, {
      val df = build.persist()
      df.count()
      df
    })

  def clear(): Unit = {
    frames.values.foreach(_.unpersist())
    frames.clear()
    codebooks.clear()
  }
}
