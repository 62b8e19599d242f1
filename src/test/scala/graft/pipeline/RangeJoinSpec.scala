package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RangeJoin: the bucketed point-in-interval join must be LOSSLESS vs
  * the naive BETWEEN theta join (every pair, exactly once), bin-width
  * independent, correct on negative domains (floor-division bins), and
  * fail fast — not silently replicate — on pathological interval spans.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    left.as("l").join(right.as("r"),
        $"l.user_id" === $"r.user_id" &&
          $"l.pt" >= $"r.lo" && $"l.pt" <= $"r.hi")
      .select($"l.event_id", $"r.purchase_id").as[(Long, Long)]
      .collect().toSet

  private def events = graft.io.Tables.load(spark, sf("0.001"), "events")

  test("bucketed join equals the naive theta join on real event data") {
    val hourUs = 3600L * 1000000L
    val right = events.where($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id",
        unix_micros($"ts").as("lo"), (unix_micros($"ts") + hourUs).as("hi"))
    val left = events.where($"event_type".isin("click", "view"))
      .select($"event_id", $"user_id", unix_micros($"ts").as("pt"))

    val expected = naive(left, right)
    assert(expected.nonEmpty, "fixture should produce at least one match")

    for (bin <- Seq(hourUs, hourUs / 4, hourUs * 8)) {
      val got = RangeJoin.pointInInterval(left, right, Seq("user_id"),
          "pt", "lo", "hi", binWidth = bin)
        .select($"event_id", $"range.purchase_id").as[(Long, Long)]
        .collect()
      assert(got.length === got.toSet.size, s"bin=$bin produced duplicates")
      assert(got.toSet === expected, s"bin=$bin diverged from naive join")
    }
  }

  test("inclusive bounds, negative domain, empty intervals") {
    val left = Seq((1L, "k", -10L), (2L, "k", 0L), (3L, "k", 10L),
      (4L, "k", 11L), (5L, "other", 10L))
      .toDF("event_id", "user_id", "pt")
    val right = Seq((100L, "k", -10L, 10L), (200L, "k", 5L, 4L))
      .toDF("purchase_id", "user_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(left, right, Seq("user_id"),
        "pt", "lo", "hi", binWidth = 7)
      .select($"event_id", $"range.purchase_id").as[(Long, Long)]
      .collect().toSet
    // both endpoints included; 11 is out; the other key never matches;
    // the empty interval (hi < lo) matches nothing
    assert(got === Set((1L, 100L), (2L, 100L), (3L, 100L)))
  }

  test("an interval wider than maxBinsPerInterval fails fast, not silently") {
    val left = Seq((1L, "k", 0L)).toDF("event_id", "user_id", "pt")
    val right = Seq((100L, "k", 0L, 1000L))
      .toDF("purchase_id", "user_id", "lo", "hi")
    // surfaces as SparkRuntimeException (USER_RAISED_EXCEPTION) when the
    // failing row evaluates driver-side, SparkException when on an executor
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(left, right, Seq("user_id"),
        "pt", "lo", "hi", binWidth = 1, maxBinsPerInterval = 10).collect()
    }
    assert(ex.getMessage.contains("RangeJoin") ||
      Option(ex.getCause).exists(_.getMessage.contains("RangeJoin")))
    // same data passes once the guard admits the span
    val ok = RangeJoin.pointInInterval(left, right, Seq("user_id"),
      "pt", "lo", "hi", binWidth = 1, maxBinsPerInterval = 2000).count()
    assert(ok === 1L)
  }

  test("randomized instances: bucketed == naive in one keyed sweep") {
    // 40 seeded random instances ride one DataFrame (instance id joins
    // the equi keys), so the whole sweep is a single pair of Spark jobs
    val rnd = new scala.util.Random(42)
    val lefts = for {
      inst <- 0 until 40; i <- 0 until rnd.nextInt(12)
    } yield (inst, (inst.toLong << 32) | i, "k" + rnd.nextInt(3),
      rnd.nextLong() % 1000L)
    val rights = for {
      inst <- 0 until 40; j <- 0 until rnd.nextInt(8)
    } yield {
      val lo = rnd.nextLong() % 1000L
      (inst, (inst.toLong << 32) | j, "k" + rnd.nextInt(3),
        lo, lo + rnd.nextInt(300) - 20) // some empty (hi < lo)
    }
    val lDf = lefts.toDF("inst", "event_id", "user_id", "pt")
    val rDf = rights.toDF("inst", "purchase_id", "user_id", "lo", "hi")

    val expected = lDf.as("l").join(rDf.as("r"),
        $"l.inst" === $"r.inst" && $"l.user_id" === $"r.user_id" &&
          $"l.pt" >= $"r.lo" && $"l.pt" <= $"r.hi")
      .select($"l.event_id", $"r.purchase_id").as[(Long, Long)]
      .collect().toSet
    assert(expected.nonEmpty)

    for (bin <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(lDf, rDf,
          Seq("inst", "user_id"), "pt", "lo", "hi", binWidth = bin)
        .select($"event_id", $"range.purchase_id").as[(Long, Long)]
        .collect()
      assert(got.length === got.toSet.size, s"bin=$bin duplicates")
      assert(got.toSet === expected, s"bin=$bin diverged")
    }
  }

  test("plan shape: equi join on (key, bin), no cartesian") {
    val hourUs = 3600L * 1000000L
    val right = events.where($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id",
        unix_micros($"ts").as("lo"), (unix_micros($"ts") + hourUs).as("hi"))
    val left = events.select($"event_id", $"user_id", unix_micros($"ts").as("pt"))
    val plan = RangeJoin.pointInInterval(left, right, Seq("user_id"),
        "pt", "lo", "hi", binWidth = hourUs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
