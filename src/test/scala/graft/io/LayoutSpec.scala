package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (a -> odd positions, b -> even)") {
    // a=3 (11b): bits at z-positions 1,3 = 0b1010 = 10
    // b=1 (01b): bit  at z-position 0  = 0b0001 = 1   => z = 11
    val rows = Seq((3L, 1L), (0L, 0L), (1L, 0L), (0L, 1L), (2L, 2L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), bits = 4).as("z"))
      .as[Long].collect()
    assert(rows.toSeq == Seq(11L, 0L, 2L, 1L, 12L))
  }

  test("zValue is monotone-bounded: masking keeps high bits out") {
    val z = Seq(((1L << 40) + 5L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), bits = 16).as("z"))
      .as[Long].head()
    // only the low 16 bits of a survive: same as a=5,b=3
    val z2 = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), bits = 16).as("z"))
      .as[Long].head()
    assert(z == z2)
  }

  /** rows the parquet reader actually decoded (post row-group pruning). */
  private def scannedRows(df: DataFrame): Long = {
    // collect() executes THIS df's QueryExecution (count() would plan a
    // separate aggregate query, leaving these scan metrics untouched)
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes row groups on a 2-D range probe") {
    val n = 200000
    // two decorrelated uniform keys in [0, 1024)
    val base = spark.range(n).select(
      (col("id") % 1024).as("x"),
      (abs(hash(col("id"))) % 1024).as("y"),
      col("id").as("payload"))
    val rnd = "target/tmp/layout_random"
    val zrd = "target/tmp/layout_zorder"
    // "random" = clustered by an unrelated hash, the shape an unordered
    // ingest leaves behind
    base.repartition(16, hash(col("payload")))
      .write.mode("overwrite").option("maxRecordsPerFile", 8192).parquet(rnd)
    Layout.writeZOrdered(base, zrd, "x", "y", nFiles = 16, bits = 10,
      maxRecordsPerFile = 8192)

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // AQE off so executedPlan exposes the scan node with live metrics
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def probe(path: String) = spark.read.parquet(path)
        .where(col("x").between(100, 160) && col("y").between(200, 260))
      val want = probe(rnd).count()
      assert(want == probe(zrd).count(), "layouts disagree on content")
      assert(want > 0)
      val rndScanned = scannedRows(probe(rnd))
      val zScanned = scannedRows(probe(zrd))
      // random layout: every row group spans both key ranges -> nothing
      // prunes; z-order: a 61x61 box touches a handful of quad blocks
      assert(rndScanned >= n * 9 / 10, s"random layout pruned? $rndScanned")
      assert(zScanned <= rndScanned / 4,
        s"z-order pruned too little: $zScanned of $rndScanned")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("zValue matches a reference Morton encode; quad-tree block property") {
    // reference implementation, independent of the Column fold
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((z, i) =>
        z | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i)))
    val rng = new scala.util.Random(7)
    val pairs = Seq.fill(1000)((rng.nextInt(1 << 16).toLong,
      rng.nextInt(1 << 16).toLong))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.zValue(col("a"), col("b"), bits = 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == morton(a, b, 16), s"z($a,$b)")
      // the property pruning rests on: equal z >> 2s  ⟹  equal a >> s
      // AND equal b >> s — a contiguous z range is a square block in
      // (a, b), so per-file z ranges mean narrow min/max on BOTH keys
      for (s <- Seq(2, 5, 8)) {
        val block = z >> (2 * s)
        assert(block == morton(a >> s, b >> s, 16 - s),
          s"block structure at s=$s for ($a,$b)")
      }
    }
  }

  test("compact rewrites a fragmented directory into few full files") {
    val frag = "target/tmp/layout_frag"
    val comp = "target/tmp/layout_compact"
    val df = spark.range(50000).select(
      col("id").as("k"), (col("id") * 7 % 97).as("v"))
    df.repartition(50).write.mode("overwrite").parquet(frag)
    val (rows, before, after) =
      Layout.compact(spark, frag, comp, "k", targetRecordsPerFile = 25000)
    assert(rows == 50000)
    assert(before >= 50, s"expected >=50 fragments, got $before")
    assert(after <= 3, s"compaction left $after files")
    // content preserved exactly
    val a = spark.read.parquet(comp).orderBy("k").collect()
    val b = df.orderBy("k").collect()
    assert(a.sameElements(b))
    // range clustering restored: a k-range probe decodes a single file's
    // worth of rows, not the whole table
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val probed = scannedRows(
        spark.read.parquet(comp).where(col("k") < 1000))
      assert(probed <= 25000, s"compacted probe decoded $probed rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
