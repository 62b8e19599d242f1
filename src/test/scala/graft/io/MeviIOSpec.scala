package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

class MeviIOSpec extends SparkSpec {
  import spark.implicits._

  test("binary float32 matrix reader matches written rows (S6)") {
    val dim = 8
    val rows = Array.tabulate(10, dim)((i, j) => (i * dim + j) * 0.5f)
    val buf = ByteBuffer.allocate(10 * dim * 4).order(ByteOrder.LITTLE_ENDIAN)
    rows.foreach(_.foreach(buf.putFloat))
    val path = "target/tmp/test_floatmatrix.bin"
    Files.createDirectories(Paths.get("target/tmp"))
    Files.write(Paths.get(path), buf.array())

    val df = MeviIO.readFloatMatrix(spark, path, dim)
    assert(df.count() == 10)
    val got = df.orderBy("row_id").collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i)
      assert(r.getSeq[Float](1) == rows(i).toSeq)
    }
  }

  test("binary int64 matrix reader (token matrix, S6)") {
    val width = 4
    val rows = Array.tabulate(5, width)((i, j) => (i * 100 + j).toLong)
    val buf = ByteBuffer.allocate(5 * width * 8).order(ByteOrder.LITTLE_ENDIAN)
    rows.foreach(_.foreach(buf.putLong))
    val path = "target/tmp/test_longmatrix.bin"
    Files.write(Paths.get(path), buf.array())
    val got = MeviIO.readLongMatrix(spark, path, width).orderBy("row_id").collect()
    assert(got.length == 5)
    assert(got(3).getSeq[Long](1) == rows(3).toSeq)
  }

  test("corpus TSV is raw unquoted (reference format): quotes pass through literally") {
    import spark.implicits._
    // the reference writes '\t'.join(...) with no quoting — fields that
    // START with a quote char must survive verbatim (CSV quoting would
    // swallow across tabs); embedded tabs are unrepresentable by design
    val nasty = Seq(
      (1L, "plain", "simple content"),
      (2L, "\"leading quote", "mid\"quote and, commas"),
      (3L, "", "trailing quote\"")
    ).toDF("doc_id", "title", "content")
    val dir = "target/tmp/test_nasty_tsv"
    MeviIO.writeCorpusTsv(nasty, dir)
    // raw file must contain no added quote characters
    val rawLines = spark.read.text(dir).collect().map(_.getString(0))
    assert(rawLines.exists(_ == "2\t\"leading quote\tmid\"quote and, commas"),
      s"writer altered raw fields: ${rawLines.toSeq}")
    val back = MeviIO.readCorpusTsv(spark, dir).orderBy("doc_id").collect()
    assert(back.length == 3)
    assert(back(1).getString(1) == "\"leading quote")
    assert(back(1).getString(2) == "mid\"quote and, commas")
    assert(back(2).getString(1) == "") // fillna('') on the empty title
  }

  test("ranked TSV roundtrips empty prediction lists as empty arrays") {
    import spark.implicits._
    val lists = Seq(
      ("q1", Seq(1L, 2L), Seq(0.5f, 0.25f)),
      ("q2", Seq.empty[Long], Seq.empty[Float])
    ).toDF("query", "preds", "scores")
    val dir = "target/tmp/test_empty_ranked"
    MeviIO.writeRankedTsv(lists, dir)
    val back = MeviIO.readRankedTsv(spark, dir).orderBy("query").collect()
    assert(back(0).getSeq[Long](1) == Seq(1L, 2L))
    assert(back(1).getSeq[Long](1) == Seq.empty[Long]) // not null, not [null]
    assert(back(1).getSeq[Float](2) == Seq.empty[Float])
  }

  test("biencoder JSON reader explodes positive contexts with id re-base (S5/J9)") {
    val path = "target/tmp/test_biencoder.json"
    Files.createDirectories(Paths.get("target/tmp"))
    Files.writeString(Paths.get(path),
      """[{"question": "who wrote spark", "positive_ctxs": [{"passage_id": "5", "title": "t"}, {"passage_id": "9", "title": "u"}]},
        | {"question": "what is rdd", "positive_ctxs": [{"passage_id": "1", "title": "v"}]}]""".stripMargin)
    val got = MeviIO.readBiencoderJson(spark, path)
      .orderBy("query", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(
      ("what is rdd", 0L), ("who wrote spark", 4L), ("who wrote spark", 8L)))
  }

  test("pairs + dev TSV readers parse the reference formats (S2/S3)") {
    val dir = "target/tmp/test_pairs_tsv"
    Seq(("what is spark", 7L), ("what is duck", 9L)).toDF("query", "doc_id")
      .write.option("sep", "\t").mode("overwrite").csv(dir)
    val pairs = MeviIO.readPairsTsv(spark, dir)
    assert(pairs.count() == 2)
    assert(pairs.where($"doc_id" === 7L).head.getString(0) == "what is spark")

    val devDir = "target/tmp/test_dev_tsv"
    Seq(("q1", "1,2,3"), ("q2", "42")).toDF("query", "raw")
      .write.option("sep", "\t").mode("overwrite").csv(devDir)
    val dev = MeviIO.readDevTsv(spark, devDir).orderBy("query").collect()
    assert(dev(0).getSeq[Long](1) == Seq(1L, 2L, 3L))
    assert(dev(1).getSeq[Long](1) == Seq(42L))
  }

  test("tensor table round-trips through the parquet sink (S9 by design)") {
    // S9: the torch-tensor sink is Parquet by design (SURVEY §2.1) — the
    // contract is that ARRAY<FLOAT> columns survive a write/read unchanged
    val dir = "target/tmp/test_tensor_parquet"
    val in = Seq((0L, Seq(1.5f, -2.25f)), (1L, Seq(0.0f, 3.125f)))
      .toDF("row_id", "vec")
    in.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).orderBy("row_id").collect()
    assert(back.map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq ==
      Seq((0L, Seq(1.5f, -2.25f)), (1L, Seq(0.0f, 3.125f))))
  }

  test("python-literal parser matches eval() on the qa.csv shapes (S4)") {
    import PyLiteral.parseStringList
    assert(parseStringList("['a', 'b']") == Some(Seq("a", "b")))
    assert(parseStringList("[]") == Some(Nil))
    // apostrophe inside a double-quoted element — the regex killer
    assert(parseStringList("""["it's fine", 'plain']""") ==
      Some(Seq("it's fine", "plain")))
    // escaped quotes and backslashes (eval semantics incl. unknown escapes)
    assert(parseStringList("""['esc\'d', "q\"x", 'a\\b', 'k\d']""") ==
      Some(Seq("esc'd", "q\"x", "a\\b", "k\\d")))
    // CSV-wrapped line (get_answers.py:22-23 strip + "" unescape)
    assert(parseStringList("\"['hi', \"\"there\"\"]\"") ==
      Some(Seq("hi", "there")))
    // whitespace / trailing comma tolerance
    assert(parseStringList("[ 'a' , 'b' , ]") == Some(Seq("a", "b")))
    // hex/unicode/octal escapes translate exactly as eval() does
    assert(parseStringList("""['caf\xe9', 'éclair', '\101\60']""") ==
      Some(Seq("café", "éclair", "A0")))
    // adjacent string literals concatenate (python juxtaposition)
    assert(parseStringList("['a' 'b', 'c']") == Some(Seq("ab", "c")))
    assert(parseStringList("""["it" 's']""") == Some(Seq("its")))
    // malformed inputs → None, not garbage (and never an exception — the
    // UDF maps None to null; a throw would abort the whole Spark task)
    assert(parseStringList("not a list").isEmpty)
    assert(parseStringList("['unterminated").isEmpty)
    assert(parseStringList("""['bad \xZZ hex']""").isEmpty)
    assert(parseStringList("""['\Udeadbeef']""").isEmpty)   // > Int range
    assert(parseStringList("""['\U00110000']""").isEmpty)   // > U+10FFFF
    assert(parseStringList("['\\x4\uFF11']").isEmpty)       // non-ASCII digit
    assert(parseStringList("""['ok \U0001F600']""") == Some(Seq("ok \ud83d\ude00")))
    assert(parseStringList("[1, 2]").isEmpty)
    assert(parseStringList(null).isEmpty)
  }
}
