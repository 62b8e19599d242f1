package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PQSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Int = 3) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat)))
      .toDF("doc_id", "vec")
  }

  test("assignment is the per-slice argmin (brute-force check)") {
    val df = vecs(200, 8).cache()
    val cb = PQTrainer.fit(df, "vec", numSub = 2, k = 4, seed = 42L)
    assert(cb.numSub == 2 && cb.k == 4 && cb.subDim == 4)
    val got = PQAssigner.assign(df, cb)
      .as[(Long, Seq[Int])].collect().toMap
    val data = df.as[(Long, Array[Float])].collect()
    data.foreach { case (id, v) =>
      val want = (0 until 2).map { m =>
        (0 until 4).minBy { c =>
          val cent = cb.subs(m)(c)
          (0 until 4).map { j =>
            val d = v(m * 4 + j).toDouble - cent(j).toDouble; d * d
          }.sum
        }
      }
      assert(got(id) == want, s"doc $id")
    }
  }

  test("PQ with one slice ≡ single-level RQ (same seed, same KMeans)") {
    val df = vecs(300, 6).cache()
    val pq = PQTrainer.fit(df, "vec", numSub = 1, k = 5, seed = 7L, maxIter = 10)
    val rq = RQTrainer.fit(df, "vec", numLevels = 1, k = 5, seed = 7L, maxIter = 10)
    val a = PQAssigner.assign(df, pq).as[(Long, Seq[Int])].collect().toMap
    val b = CodeAssigner.assign(df, rq).as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
  }

  test("reconstruction concatenates slice centroids; error is ‖x−rec‖") {
    val df = vecs(100, 8).cache()
    val cb = PQTrainer.fit(df, "vec", numSub = 4, k = 3, seed = 1L)
    val out = PQAssigner.reconstructWithError(df, cb)
      .select("doc_id", "rec", "recon_error")
      .as[(Long, Seq[Float], Double)].collect()
    val data = df.as[(Long, Array[Float])].collect().toMap
    out.foreach { case (id, rec, err) =>
      val codes = cb.assign(data(id))
      val want = cb.reconstruct(codes).toSeq
      assert(rec == want, s"doc $id rec")
      val wantErr = math.sqrt(data(id).zip(rec).map { case (x, r) =>
        val d = x.toDouble - r.toDouble; d * d
      }.sum)
      assert(math.abs(err - wantErr) < 1e-12, s"doc $id err")
    }
    // quantization reduces to exact reproduction iff vector IS a centroid
    // combo; generically the error is positive but bounded by input norm
    val norms = df.select(graft.core.VectorOps.vecNorm2(col("vec"))).as[Double].collect()
    assert(out.map(_._3).sum / out.length < norms.sum / norms.length)
  }

  test("more slices cannot hurt reconstruction on average (finer grid)") {
    val df = vecs(400, 8, seed = 21).cache()
    val c1 = PQTrainer.fit(df, "vec", numSub = 1, k = 4, seed = 42L)
    val c4 = PQTrainer.fit(df, "vec", numSub = 4, k = 4, seed = 42L)
    def meanErr(cb: PQCodebook) =
      PQAssigner.reconstructWithError(df, cb)
        .agg(avg("recon_error")).head.getDouble(0)
    // 4 slices × 4 codes = 256 effective cells vs 4 cells full-width
    assert(meanErr(c4) < meanErr(c1))
  }
}
