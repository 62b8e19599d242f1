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
  * sessions (keyed by path alone). DataFrames are bound to the session
  * that persisted them → cached per live session in a WeakHashMap, so a
  * dead session's frames are GC-evicted and an identity-hash reuse can
  * never resurrect a frame of a stopped SparkContext.
  */
object ArtifactCache {

  private val codebooks = TrieMap.empty[String, Codebook]
  private val frames =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      TrieMap[String, DataFrame]]()

  def codebook(key: String)(train: => Codebook): Codebook =
    codebooks.getOrElseUpdate(key, train)

  /** Cached + persisted DataFrame (materialized once), scoped to the
    * session that builds it. */
  def frame(session: org.apache.spark.sql.SparkSession, key: String)(
      build: => DataFrame): DataFrame = {
    val perSession = frames.synchronized {
      var m = frames.get(session)
      if (m == null) { m = TrieMap.empty[String, DataFrame]; frames.put(session, m) }
      m
    }
    perSession.getOrElseUpdate(key, {
      val df = build.persist()
      df.count()
      df
    })
  }

  def clear(): Unit = {
    frames.synchronized {
      frames.values.forEach(m => m.values.foreach(_.unpersist(false)))
      frames.clear()
    }
    codebooks.clear()
  }
}
