package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** EWMA per-key sorted fold, ordered funnel, and the interval-overlap
  * join — each checked against independent local recomputation or the
  * naive formulation on real fixture events.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def events = graft.io.Tables.load(spark, sf("0.001"), "events")

  test("ewma matches a local sequential fold per key") {
    val got = TimeSeries.ewma(events, "user_id", "ts", "event_id", "value",
        alpha = 0.25)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    val local = events
      .select($"user_id", unix_micros($"ts").as("o"), $"event_id", $"value")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).toSeq.flatMap { case (u, rows) =>
        var acc = 0.0
        var first = true
        rows.sortBy(r => (r._2, r._3)).map { r =>
          acc = if (first) { first = false; r._4 }
            else 0.25 * r._4 + 0.75 * acc
          (u, r._3) -> math.floor(acc * 1000000 + 0.5).toLong
        }
      }.toMap

    assert(got.size === local.size)
    assert(got === local)
  }

  test("ewma alpha=1 degenerates to the value itself") {
    val got = TimeSeries.ewma(events.limit(200), "user_id", "ts",
        "event_id", "value", alpha = 1.0)
      .as[(Long, Long, Long)].collect()
    val vals = events.limit(200)
      .select($"event_id", $"value").as[(Long, Double)].collect().toMap
    got.foreach { case (_, tie, micro) =>
      assert(micro === math.floor(vals(tie) * 1000000 + 0.5).toLong)
    }
  }

  test("funnel replays the sequential min-chain per user") {
    val steps = Seq("signup", "view", "click", "purchase")
    val got = TimeSeries.funnel(events, "user_id", "ts", "event_type", steps)
      .select($"user_id", unix_micros($"step1_ts"), unix_micros($"step2_ts"),
        unix_micros($"step3_ts"), unix_micros($"step4_ts"), $"steps_completed")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> r).toMap

    val raw = events.select($"user_id", $"event_type", unix_micros($"ts"))
      .as[(Long, String, Long)].collect().groupBy(_._1)

    var usersWithStep1 = 0
    raw.foreach { case (u, rows) =>
      def minAfter(tpe: String, lo: Option[Long]): Option[Long] =
        lo.flatMap(l => rows.filter(r => r._2 == tpe && r._3 >= l)
          .map(_._3).minOption)
      val t1 = rows.filter(_._2 == "signup").map(_._3).minOption
      val t2 = minAfter("view", t1)
      val t3 = minAfter("click", t2)
      val t4 = minAfter("purchase", t3)
      if (t1.isDefined) {
        usersWithStep1 += 1
        val g = got(u)
        assert((g._2, g._3, g._4, g._5) === ((t1, t2, t3, t4)), s"user=$u")
        assert(g._6 === Seq(t1, t2, t3, t4).count(_.isDefined), s"user=$u steps")
      } else assert(!got.contains(u), s"user=$u should be absent")
    }
    assert(got.size === usersWithStep1)
  }

  test("interval merge: islands cover exactly the union, gaps split") {
    // hand case: [0,10],[5,20] merge; [21,30] touches nothing ([20]<[21]
    // is a gap of 1); [30,30] touches [21,30]
    val iv = Seq((1L, 0L, 10L), (1L, 5L, 20L), (1L, 21L, 30L),
      (1L, 30L, 30L), (2L, 0L, 1L)).toDF("user_id", "lo", "hi")
    val got = TimeSeries.mergeIntervals(iv, "user_id", "lo", "hi")
      .select($"user_id", $"island", $"lo", $"hi", $"n")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 0L, 20L, 2L), (1L, 2L, 21L, 30L, 2L),
      (2L, 1L, 0L, 1L, 1L)))

    // randomized: islands from a local sweep-line must match
    val rnd = new scala.util.Random(11)
    val rand = for (k <- 0L until 20L; _ <- 0 until rnd.nextInt(30))
      yield { val lo = rnd.nextInt(200).toLong; (k, lo, lo + rnd.nextInt(20)) }
    val gotR = TimeSeries.mergeIntervals(rand.toDF("user_id", "lo", "hi"),
        "user_id", "lo", "hi")
      .select($"user_id", $"lo", $"hi", $"n")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4)).sortBy(_._1).toSeq).toMap
    val local = rand.groupBy(_._1).view.mapValues { ivs =>
      val sorted = ivs.map(i => (i._2, i._3)).sortBy(identity)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      for ((lo, hi) <- sorted) {
        if (out.nonEmpty && lo <= out.last._2)
          out(out.length - 1) = (out.last._1, math.max(out.last._2, hi),
            out.last._3 + 1)
        else out += ((lo, hi, 1L))
      }
      out.toSeq
    }.toMap
    assert(gotR === local)
  }

  test("interval overlap equals the naive theta join, once per pair") {
    val hourUs = 3600L * 1000000L
    val p = events.where($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id",
        unix_micros($"ts").as("p_lo"), (unix_micros($"ts") + hourUs).as("p_hi"))
    val e = events.where($"event_type" === "error")
      .select($"event_id".as("error_id"), $"user_id",
        unix_micros($"ts").as("e_lo"),
        (unix_micros($"ts") + hourUs / 2).as("e_hi"))

    val expected = p.as("p").join(e.as("e"),
        $"p.user_id" === $"e.user_id" &&
          $"p_lo" <= $"e_hi" && $"e_lo" <= $"p_hi")
      .select($"purchase_id", $"error_id").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)

    for (bin <- Seq(hourUs, hourUs / 3, hourUs * 4)) {
      val got = RangeJoin.intervalOverlap(p, e, Seq("user_id"),
          "p_lo", "p_hi", "e_lo", "e_hi", binWidth = bin)
        .select($"purchase_id", $"range.error_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"bin=$bin emitted duplicates")
      assert(got.toSet === expected, s"bin=$bin diverged")
    }
  }
}
