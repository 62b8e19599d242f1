package graft.index

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

/** Path-keyed artifact memoization — the engine-side equivalent of the
  * reference's recompute-avoidance (skip embed/cluster gen when the file
  * exists: MEVI/main_models.py:2944-2978,3099,3194). Within one JVM session
  * (Verify/Bench run all queries sequentially) the trained codebook and the
  * assignment DataFrame are reused instead of re-fit per query.
  *
  * Codebooks are plain serializable objects → safe to share across
  * sessions. Cached DataFrames are validated on every hit: a frame whose
  * SparkContext has stopped is rebuilt and replaced (weak-reference
  * schemes don't work here — a Dataset strongly references its session, so
  * a session-keyed weak map would never evict). Builds are serialized per
  * cache so concurrent callers can't double-persist a discarded frame.
  */
object ArtifactCache {

  private val codebooks = TrieMap.empty[String, Codebook]
  private val frames = TrieMap.empty[String, DataFrame]

  def codebook(key: String)(train: => Codebook): Codebook =
    codebooks.getOrElseUpdate(key, train)

  /** Cached + persisted DataFrame (materialized once per live context). */
  def frame(session: org.apache.spark.sql.SparkSession, key: String)(
      build: => DataFrame): DataFrame = frames.synchronized {
    frames.get(key) match {
      case Some(df) if !df.sparkSession.sparkContext.isStopped => df
      case _ =>
        val df = build.persist()
        df.count()
        frames.put(key, df)
        df
    }
  }

  def clear(): Unit = {
    frames.synchronized {
      frames.values.foreach { df =>
        if (!df.sparkSession.sparkContext.isStopped) df.unpersist(false)
      }
      frames.clear()
    }
    codebooks.clear()
  }
}
