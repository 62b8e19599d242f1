package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[Array[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "vec")

  test("first component aligns with the dominant variance axis") {
    val rng = new scala.util.Random(5)
    // spread 10× along axis 1 of 4; noise elsewhere
    val data = (0 until 300).map { _ =>
      Array(rng.nextGaussian().toFloat * 0.1f,
        rng.nextGaussian().toFloat * 10f,
        rng.nextGaussian().toFloat * 0.1f,
        rng.nextGaussian().toFloat * 0.1f)
    }
    val rot = PcaRotation.fit(vecs(data), "vec", k = 2)
    assert(rot.k == 2 && rot.dim == 4)
    assert(math.abs(rot.components(0)(1)) > 0.99,
      s"pc1 should point along axis 1: ${rot.components(0).mkString(",")}")
    // components are unit-norm and orthogonal
    val n0 = math.sqrt(rot.components(0).map(x => x * x).sum)
    val n1 = math.sqrt(rot.components(1).map(x => x * x).sum)
    val dot = rot.components(0).zip(rot.components(1)).map(p => p._1 * p._2).sum
    assert(math.abs(n0 - 1) < 1e-9 && math.abs(n1 - 1) < 1e-9)
    assert(math.abs(dot) < 1e-9)
  }

  test("full-rank rotation preserves pairwise inner products") {
    val rng = new scala.util.Random(9)
    val data = (0 until 100).map(_ => Array.fill(6)(rng.nextGaussian().toFloat))
    val df = vecs(data)
    val rot = PcaRotation.fit(df, "vec", k = 6)
    val proj = PcaRotation.project(df, "vec", rot)
      .select("vec_id", "proj").as[(Long, Seq[Double])].collect().toMap
    val orig = data.map(_.map(_.toDouble))
    for (i <- 0 until 10; j <- 0 until 10) {
      val ipOrig = orig(i).zip(orig(j)).map(p => p._1 * p._2).sum
      val ipProj = proj(i.toLong).zip(proj(j.toLong)).map(p => p._1 * p._2).sum
      assert(math.abs(ipOrig - ipProj) < 1e-4,
        s"ip($i,$j): $ipOrig vs $ipProj")
    }
  }

  test("projection is the exact sequential double fold (engine-replayable)") {
    val data = Seq(Array(1.5f, -2.25f, 0.125f), Array(0f, 3f, -1f))
    val df = vecs(data)
    val rot = PcaRotation.Rotation(Array(
      Array(0.5, 0.25, -1.0), Array(2.0, 0.0, 0.125)))
    val got = PcaRotation.project(df, "vec", rot)
      .select("vec_id", "proj").as[(Long, Seq[Double])].collect().toMap
    def fold(v: Array[Float], c: Array[Double]): Double =
      v.zip(c).foldLeft(0.0) { case (acc, (x, w)) => acc + x.toDouble * w }
    data.zipWithIndex.foreach { case (v, i) =>
      val want = rot.components.map(c => fold(v, c)).toSeq
      assert(got(i.toLong) == want, s"row $i") // bit-exact, not approx
    }
  }

  test("projection reduces reconstruction spread less than dropping raw dims") {
    // sanity: projecting onto top-2 PCs of anisotropic data keeps more
    // variance than keeping the first two raw coordinates
    val rng = new scala.util.Random(13)
    val data = (0 until 200).map { _ =>
      val a = rng.nextGaussian(); val b = rng.nextGaussian()
      // variance lives on diagonals — raw axes split it evenly
      Array((a + b).toFloat, (a - b).toFloat, (a * 0.1).toFloat,
        (3 * a + 0.2 * b).toFloat)
    }
    val df = vecs(data)
    val rot = PcaRotation.fit(df, "vec", k = 2)
    val projVar = PcaRotation.project(df, "vec", rot)
      .select(explode(col("proj")).as("x"))
      .agg(sum(col("x") * col("x"))).head.getDouble(0)
    val rawVar = data.map(v => v(0) * v(0) + v(1) * v(1)).map(_.toDouble).sum
    assert(projVar > rawVar, s"pca $projVar should exceed raw-axes $rawVar")
  }
}
