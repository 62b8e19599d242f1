package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.core.VectorOps._
import graft.functions.VectorFunctions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, -5.0f, 6.0f)),
    (2L, Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f))
  ).toDF("id", "a", "b")

  test("typed Dataset façade round-trips core tables") {
    import graft.core.model._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val emb = graft.io.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("vec_id AS doc_id", "embedding AS vec")
    val ds = emb.asEmbeddings
    assert(ds.head.vec.length == 64)
    val assigned = ds.limit(5).map(e => CodeAssignment(e.doc_id, Seq(0, 1)))
    assert(assigned.collect().forall(_.codes == Seq(0, 1)))
  }

  test("vecDot HOF and native expression agree") {
    val rows = df.select(
      vecDot($"a", $"b").as("hof"),
      float_dot($"a", $"b").as("native")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(0).getDouble(0) == 1.0 * 4 - 2 * 5 + 3 * 6)
  }

  test("negL2Sq HOF and native expression agree") {
    val rows = df.select(
      vecNegL2Sq($"a", $"b").as("hof"),
      float_neg_l2sq($"a", $"b").as("native")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    assert(rows(0).getDouble(0) == -(9.0 + 49.0 + 9.0))
  }

  test("dimension mismatch yields null in both native and HOF forms") {
    val bad = Seq((1L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("id", "a", "b")
    val r = bad.select(float_dot($"a", $"b").as("n"),
      float_neg_l2sq($"a", $"b").as("l"), vecDot($"a", $"b").as("h")).head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("null array elements propagate to null, matching the HOF fold") {
    val withNull = Seq((1L, Seq[java.lang.Float](1.0f, null, 3.0f),
      Seq[java.lang.Float](1.0f, 2.0f, 3.0f))).toDF("id", "a", "b")
    val r = withNull.select(float_dot($"a", $"b").as("n"),
      float_neg_l2sq($"a", $"b").as("l"), vecDot($"a", $"b").as("h")).head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("cosine is 0 on zero vector, 1 on self") {
    val r = df.select(vecCosine($"a", $"b")).collect()
    assert(r(1).getDouble(0) == 0.0)
    val self = df.where($"id" === 1).select(vecCosine($"a", $"a")).head.getDouble(0)
    assert(math.abs(self - 1.0) < 1e-9)
  }

  test("ipToL2 reduction: L2 on augmented vectors ranks like IP on originals") {
    val rnd = new scala.util.Random(3)
    val vecs = Seq.tabulate(30)(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val phi = df.select(max(vecNorm2Sq($"v"))).head.getDouble(0) + 1e-6
    val q = vecs.head._2
    val qAug = q :+ 0.0f
    val scored = df.select($"id",
      vecDot(lit(q.toArray), $"v").as("ip"),
      vecNegL2Sq(lit(qAug.toArray), ipToL2AugmentDoc($"v", lit(phi))).as("negl2"))
      .collect()
    val byIp = scored.sortBy(r => (-r.getDouble(1), r.getLong(0))).map(_.getLong(0)).toSeq
    val byL2 = scored.sortBy(r => (-r.getDouble(2), r.getLong(0))).map(_.getLong(0)).toSeq
    assert(byIp == byL2)
  }

  test("vecSub/vecAdd/normalize roundtrip") {
    val r = df.where($"id" === 1)
      .select(vecAdd(vecSub($"a", $"b"), $"b").as("rt"),
        vecNorm2(vecL2Normalize($"a")).as("n")).head
    assert(r.getSeq[Float](0) == Seq(1.0f, 2.0f, 3.0f))
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-6)
  }
}
