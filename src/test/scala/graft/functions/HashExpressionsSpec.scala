package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions.md5_prefix

class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val strings = (Seq("", "a", "it's", "héllo wörld", "q1:42",
    "alpha beta gamma") ++ (0 until 500).map(i => s"doc $i body")).toDF("s")

  test("md5_prefix is bit-identical to conv(substring(md5(x),1,n),16,10)") {
    for (n <- Seq(8, 15)) {
      val mismatches = strings.select(
        md5_prefix(col("s"), n).as("fast"),
        conv(substring(md5(col("s").cast("binary")), 1, n), 16, 10)
          .cast("long").as("slow"))
        .where(col("fast") =!= col("slow")).count()
      assert(mismatches == 0, s"nibbles=$n diverged from the composed form")
    }
  }

  test("md5_prefix survives both codegen and interpreted (HOF lambda) paths") {
    // top-level projection → whole-stage codegen; inside transform() the
    // lambda evaluates interpreted — both must agree
    val row = Seq((Seq("x", "y"), "x")).toDF("arr", "s")
      .select(transform(col("arr"), e => md5_prefix(e, 15)).as("hofed"),
        md5_prefix(col("s"), 15).as("direct"))
      .head()
    assert(row.getSeq[Long](0).head == row.getLong(1))
  }

  test("md5_prefix propagates null") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(md5_prefix(col("s"), 15)).head()
    assert(r.isNullAt(0))
  }
}
