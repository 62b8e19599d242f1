package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch properties that the SQL oracles cannot state: estimate
  * accuracy against exact ground truth, the CMS upper-bias invariant,
  * and shard-merge associativity on arbitrary (non-source) splits.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def items = graft.io.Tables
    .load(spark, sf("0.001"), "documents")
    .select(col("doc_id"), col("source"),
      explode(Dedup.tokens(col("text"))).as("token"))

  test("HLL estimate lands within the expected error band of exact") {
    // small-range regime: 31 distinct tokens at m=64 → linear counting
    val exactTokens = items.select("token").distinct().count().toDouble
    val estTokens = Sketches.hllEstimate(
        Sketches.hllRegisters(items, "token", Seq.empty, m = 64),
        Seq.empty, m = 64, alphaM = 0.709)
      .as[Long].head() / 1e6
    assert(math.abs(estTokens - exactTokens) / exactTokens < 0.4,
      s"tokens est=$estTokens exact=$exactTokens")
    // plain regime: 500 distinct texts at m=64 → raw αm estimator
    val texts = graft.io.Tables.load(spark, sf("0.001"), "documents")
      .select(col("text"))
    val exactTexts = texts.distinct().count().toDouble
    val estTexts = Sketches.hllEstimate(
        Sketches.hllRegisters(texts, "text", Seq.empty, m = 64),
        Seq.empty, m = 64, alphaM = 0.709)
      .as[Long].head() / 1e6
    // 1.04/sqrt(64) ≈ 13% rsd; allow 3σ
    assert(math.abs(estTexts - exactTexts) / exactTexts < 0.4,
      s"texts est=$estTexts exact=$exactTexts")
  }

  test("register merge over arbitrary shards == registers of the union") {
    val shards = (0 until 4).map(i =>
      Sketches.hllRegisters(items.where(pmod(col("doc_id"), lit(4)) === i),
        "token", Seq.empty, m = 64))
    val merged = Sketches.hllMerge(shards.reduce(_ unionByName _), Seq("bucket"))
      .as[(Long, Long)].collect().toMap
    val direct = Sketches.hllRegisters(items, "token", Seq.empty, m = 64)
      .as[(Long, Long)].collect().toMap
    assert(merged === direct)
  }

  test("CMS estimates are upper-biased and tight for heavy hitters") {
    val counters = Sketches.cmsCounters(items, "token", depth = 4, width = 256)
    val exact = items.groupBy("token").agg(count(lit(1)).as("exact_n"))
    val vocab = exact.count()
    val top = exact.orderBy(col("exact_n").desc, col("token")).limit(50)
    val got = Sketches.cmsLookup(counters, top, "token", depth = 4, width = 256)
      .join(top, Seq("token"))
      .select($"token", $"exact_n", $"cms_n")
      .as[(String, Long, Long)].collect()
    assert(got.length === math.min(50L, vocab))
    got.foreach { case (t, ex, cms) =>
      assert(cms >= ex, s"token=$t CMS must never underestimate")
    }
    // total corpus mass / width bounds the expected collision inflation;
    // heavy hitters should sit well inside 3 rows' worth of noise
    val mass = items.count()
    val bound = 3.0 * mass / 256
    got.foreach { case (t, ex, cms) =>
      assert(cms - ex <= bound, s"token=$t inflation ${cms - ex} > $bound")
    }
  }

  test("register build is a partial-aggregated shuffle (map-side max)") {
    val plan = Sketches.hllRegisters(items, "token", Seq("source"), m = 64)
      .queryExecution.executedPlan.toString
    // two HashAggregates around one Exchange: the register max combines
    // map-side, so the shuffle carries ≤ groups×m rows per task — the
    // property that makes a corpus-wide sketch one cheap pass
    assert(plan.contains("partial_max"), s"no map-side combine in:\n$plan")
  }

  test("MG sketch: offset form matches a local Misra-Gries bound check") {
    val k = 16
    val exact = items.groupBy("token").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val sk = Sketches.mgSketch(items, "token", Seq.empty, k)
      .as[(String, Long, Long)].collect()
    assert(sk.length <= k, s"sketch must hold <= $k items, got ${sk.length}")
    // every stored item: mg_cnt <= true <= mg_cnt + mg_err, err <= N/(k+1)
    sk.foreach { case (tok, cnt, err) =>
      assert(cnt >= 1 && cnt <= exact(tok), s"$tok stored $cnt vs ${exact(tok)}")
      assert(exact(tok) <= cnt + err, s"$tok bracket broken")
      assert(err <= n / (k + 1), s"offset $err above N/(k+1)")
    }
    // every OMITTED item's true count is <= the offset (else it would
    // have survived truncation)
    val kept = sk.map(_._1).toSet
    val t = sk.headOption.map(_._3).getOrElse(0L)
    exact.filterNot(e => kept(e._1)).foreach { case (tok, c) =>
      assert(c <= t, s"omitted $tok has count $c above offset $t")
    }
  }

  test("MG shard merge: bracket survives arbitrary doc-hash shards") {
    val k = 16
    // shard by doc hash — NOT by source — so the merge sees an
    // arbitrary partition of the multiset
    val shards = (0 until 3).map(i =>
      Sketches.mgSketch(
        items.where(pmod(col("doc_id"), lit(3)) === i)
          .withColumn("shard", lit(i)),
        "token", Seq("shard"), k))
    val merged = Sketches.mgMerge(
        shards.reduce(_ unionByName _), "token", Seq.empty, k)
      .as[(String, Long, Long)].collect()
    val exact = items.groupBy("token").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(merged.nonEmpty && merged.length <= k)
    merged.foreach { case (tok, cnt, err) =>
      assert(cnt <= exact(tok), s"$tok merged $cnt overcounts ${exact(tok)}")
      assert(exact(tok) <= cnt + err, s"$tok merged bracket broken")
    }
    // the true #1 heavy hitter must survive any constant-shard merge
    val top = exact.maxBy(_._2)._1
    assert(merged.exists(_._1 == top), s"true top token $top lost in merge")
  }

  test("MG merge is deterministic across shardings and partitionings") {
    val k = 8
    def mergeOf(nShards: Int) = {
      val shards = (0 until nShards).map(i =>
        Sketches.mgSketch(
          items.where(pmod(col("doc_id"), lit(nShards)) === i)
            .withColumn("shard", lit(i)),
          "token", Seq("shard"), k))
      Sketches.mgMerge(shards.reduce(_ unionByName _), "token", Seq.empty, k)
        .select("token", "mg_cnt").as[(String, Long)].collect().toSet
    }
    // same sharding twice → identical rows (no order dependence)
    assert(mergeOf(3) == mergeOf(3))
    // per-source sketch is repartitioning-invariant
    val a = Sketches.mgSketch(items.repartition(13), "token",
      Seq("source"), k).orderBy("source", "token").collect().toSeq
    val b = Sketches.mgSketch(items.repartition(2), "token",
      Seq("source"), k).orderBy("source", "token").collect().toSeq
    assert(a == b)
  }

  test("MG sketch plans a partial-aggregated count, window only on the histogram") {
    val plan = Sketches.mgSketch(items, "token", Seq("source"), 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"no map-side combine on the item-count agg:\n$plan")
    // the per-item count table must never be window-sorted: the single
    // Window operates on the count-of-counts histogram (grouped twice)
    assert(!plan.contains("row_number"),
      s"item-level ranking crept into the MG path:\n$plan")
  }

  test("HDR quantiles land within the 2^-s relative-error band of exact") {
    import org.apache.spark.sql.functions.expr
    val s = 5
    val li = graft.io.Tables.load(spark, sf("0.01"), "lineitem").select(
      col("l_returnflag").as("flag"),
      expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .cache()
    val qs = Seq((1, 2), (9, 10), (99, 100))
    val est = Sketches.hdrQuantiles(
        Sketches.hdrHistogram(li, "cents", Seq("flag"), s), Seq("flag"), s, qs)
      .as[(String, Int, Int, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    // exact quantiles computed locally per flag
    val byFlag = li.as[(String, Long)].collect().groupBy(_._1)
      .map { case (f, rows) => f -> rows.map(_._2).sorted }
    assert(est.size == byFlag.size * 3)
    est.foreach { case ((f, qn, qd), e) =>
      val vals = byFlag(f)
      val rank = (vals.length.toLong * qn + qd - 1) / qd
      val exact = vals(math.max(0, rank.toInt - 1))
      // est is the bucket lower bound containing the rank-th value:
      // est <= exact < est * (1 + 2^-s) (+1 for the sub-2^s exact zone)
      assert(e <= exact, s"$f $qn/$qd: est $e above exact $exact")
      assert(exact < e + (e >> s) + (1L << s),
        s"$f $qn/$qd: exact $exact outside error band of est $e")
    }
  }

  test("HDR histogram merge over arbitrary shards == histogram of the union") {
    import org.apache.spark.sql.functions.expr
    val li = graft.io.Tables.load(spark, sf("0.01"), "lineitem").select(
      col("l_orderkey"), col("l_returnflag").as("flag"),
      expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val shards = (0 until 3).map(i =>
      Sketches.hdrHistogram(
        li.where(pmod(col("l_orderkey"), lit(3)) === i)
          .withColumn("sh", lit(i)),
        "cents", Seq("flag", "sh"), 5))
    val merged = Sketches.hdrMerge(shards.reduce(_ unionByName _), Seq("flag"))
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val direct = Sketches.hdrHistogram(li, "cents", Seq("flag"), 5)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(merged === direct, "count sums must be exactly associative")
    // sketch stays tiny: <= 64 * 2^5 buckets per group by construction
    val perGroup = direct.keys.groupBy(_._1).values.map(_.size)
    assert(perGroup.forall(_ <= 64 * 32))
  }

  test("CMS counter merge across shards == counters of the union") {
    val shards = (0 until 3).map(i =>
      Sketches.cmsCounters(items.where(pmod(col("doc_id"), lit(3)) === i),
        "token", depth = 4, width = 256))
    val merged = shards.reduce(_ unionByName _)
      .groupBy("row", "col").agg(sum("n").as("n"))
      .as[(Int, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val direct = Sketches.cmsCounters(items, "token", depth = 4, width = 256)
      .as[(Int, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(merged === direct)
  }
}
