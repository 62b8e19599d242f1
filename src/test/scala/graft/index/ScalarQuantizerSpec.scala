package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalarQuantizerSpec extends SparkSpec {
  import spark.implicits._

  test("codes are 8-bit, constant dims code to 0, endpoints hit 0/255") {
    val df = Seq(
      (0L, Array(0.0f, 5.0f, 7.5f)),
      (1L, Array(10.0f, 5.0f, 2.5f)),
      (2L, Array(5.0f, 5.0f, 0.0f))).toDF("doc_id", "vec")
    val out = ScalarQuantizer.roundtrip(df,
      ScalarQuantizer.fitStats(df, "vec"))
      .select("doc_id", "codes").as[(Long, Seq[Int])].collect().toMap
    // dim0 spans [0,10] → 0, 255, mid≈128; dim1 constant → 0
    assert(out(0L)(0) == 0 && out(1L)(0) == 255)
    assert(out(0L)(1) == 0 && out(1L)(1) == 0 && out(2L)(1) == 0)
    // dim2 spans [0,7.5]: 7.5→255, 2.5→85, 0→0
    assert(out(0L)(2) == 255 && out(1L)(2) == 85 && out(2L)(2) == 0)
    assert(out.values.forall(_.forall(c => c >= 0 && c <= 255)))
  }

  test("round-trip error matches the local replica bit-exactly and is small") {
    val rng = new scala.util.Random(29)
    val data = (0 until 200).map(i =>
      (i.toLong, Array.fill(6)(rng.nextGaussian().toFloat)))
    val df = data.toDF("doc_id", "vec")
    val stats = ScalarQuantizer.fitStats(df, "vec")
    val st = stats.orderBy("pos").as[(Int, Double, Double)].collect()
    val out = ScalarQuantizer.roundtrip(df, stats)
      .select("doc_id", "codes", "err")
      .as[(Long, Seq[Int], Double)].collect()
    val lookup = data.toMap
    out.foreach { case (id, codes, err) =>
      val v = lookup(id)
      var s = 0.0
      codes.indices.foreach { j =>
        val (_, mn, mx) = st(j)
        val x = v(j).toDouble
        val code = if (mx == mn) 0
          else math.min(255.0, math.max(0.0,
            math.floor((x - mn) * 255.0 / (mx - mn) + 0.5))).toInt
        assert(codes(j) == code, s"doc $id dim $j")
        val deq = mn + code * (mx - mn) / 255.0
        val d = x - deq
        s += d * d
      }
      assert(err == math.sqrt(s), s"doc $id err bit-exact")
      // 8-bit linear quantization error per dim ≤ step/2 = (mx-mn)/510
      val bound = math.sqrt(st.map { case (_, mn, mx) =>
        val h = (mx - mn) / 510.0 + 1e-12; h * h
      }.sum)
      assert(err <= bound * 1.000001, s"doc $id err $err above bound $bound")
    }
  }
}
