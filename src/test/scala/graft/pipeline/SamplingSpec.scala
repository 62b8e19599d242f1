package graft.pipeline

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf("0.01"), "documents").cache()

  test("bernoulli sample is deterministic and partitioning-independent") {
    val a = Sampling.bernoulli(docs, 0.3).select("doc_id").collect().toSet
    val b = Sampling.bernoulli(docs.repartition(13), 0.3)
      .select("doc_id").collect().toSet
    assert(a == b && a.nonEmpty)
    // rough mass check: within ±40% of the target fraction
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.18 && frac < 0.42, s"fraction $frac far from 0.3")
  }

  test("bernoulli sampling is join-stable: nested fractions nest row sets") {
    val small = Sampling.bernoulli(docs, 0.2).select("doc_id").collect().toSet
    val big = Sampling.bernoulli(docs, 0.5).select("doc_id").collect().toSet
    assert(small.subsetOf(big), "smaller fraction must be a subset")
  }

  test("stratified sampling applies per-stratum fractions, drops unknown strata") {
    val d = Seq((1L, "en"), (2L, "en"), (3L, "fr")).toDF("doc_id", "lang")
      .unionByName((4L to 400L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
        .toDF("doc_id", "lang"))
    val out = Sampling.stratified(d, "lang", Map("en" -> 1.0, "zh" -> 0.0))
      .select("doc_id", "lang").collect()
    assert(out.forall(_.getString(1) == "en")) // zh: 0.0, fr: unmapped
    val enCount = d.where(col("lang") === "en").count()
    assert(out.length == enCount) // fraction 1.0 keeps every en row
  }

  test("capPerGroup bounds every group and keeps a deterministic subset") {
    val capped = Sampling.capPerGroup(docs, "source", cap = 10)
    val sizes = capped.groupBy("source").count().collect()
    assert(sizes.forall(_.getLong(1) <= 10))
    val again = Sampling.capPerGroup(docs.repartition(7), "source", cap = 10)
    assert(capped.select("doc_id").collect().toSet ==
      again.select("doc_id").collect().toSet)
  }

  test("tokenBudget fills each group to ≤ budget in hash-rank order") {
    val d = (0L until 300L).map(i => (i, s"g${i % 3}", (i % 50) + 1))
      .toDF("doc_id", "grp", "n_tokens")
    val out = Sampling.tokenBudget(d, "grp", budget = 500L).cache()
    // per-group totals within budget
    val totals = out.groupBy("grp").agg(sum("n_tokens").as("s"))
      .as[(String, Long)].collect().toMap
    assert(totals.values.forall(_ <= 500L) && totals.size == 3)
    // maximal prefix: the next doc in hash order would overflow — verify by
    // checking budget+max_doc_tokens can't fit any excluded doc's tokens
    // under the group's remaining headroom in hash-rank order
    val picked = out.select("doc_id").as[Long].collect().toSet
    val again = Sampling.tokenBudget(d.repartition(7), "grp", budget = 500L)
      .select("doc_id").as[Long].collect().toSet
    assert(picked == again, "deterministic across partitionings")
    assert(picked.nonEmpty && picked.size < 300)
  }

  test("weighted ES sample: local md5 replay picks the identical rows") {
    val docs = graft.io.Tables.load(spark, sf("0.001"), "documents")
      .select(col("doc_id"), col("n_chars"))
    val got = Sampling.weightedTopK(docs, k = 100, weightCol = "n_chars")
      .select($"doc_id", $"es_key_micro").as[(Long, Long)].collect()

    // independent replay: JVM MessageDigest md5 == Spark md5 == DuckDB md5
    val all = docs.as[(Long, Long)].collect()
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"42:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val local = all.map { case (id, w) =>
      val u = (bucket(id) + 1.0) / 1000001.0
      (id, math.floor(math.pow(u, 1.0 / w) * 1000000 + 0.5).toLong)
    }.sortBy { case (id, key) => (-key, id) }.take(100)
    assert(got.toSeq === local.toSeq)
  }

  test("weighted ES plan is TakeOrdered, never a global sort") {
    val docs = graft.io.Tables.load(spark, sf("0.001"), "documents")
      .select(col("doc_id"), col("n_chars"))
    val plan = Sampling.weightedTopK(docs, k = 100, weightCol = "n_chars")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k + driver merge, got:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      "a global sort would shuffle the corpus to rank 100 rows")
  }

  test("weighted ES key grows with weight at fixed hash") {
    import spark.implicits._
    val d = Seq((7L, 1L), (7L, 100L)).toDF("doc_id", "w")
    val keys = Sampling.weightedTopK(d, k = 2, weightCol = "w")
      .select($"w", $"es_key_micro").as[(Long, Long)].collect().toMap
    assert(keys(100L) > keys(1L),
      "heavier weight must raise the same row's selection key")
  }

  test("weighted ES rejects null/zero/negative weights instead of mis-keying") {
    val d = Seq((1L, 10.0), (2L, 0.0), (3L, 5.0)).toDF("doc_id", "w")
    val e = intercept[Exception] {
      Sampling.weightedTopK(d, k = 3, weightCol = "w").collect()
    }
    assert(e.getMessage.contains("weight must be > 0") ||
      Option(e.getCause).exists(_.getMessage.contains("weight must be > 0")))
    val neg = Seq((1L, 10.0), (2L, -3.0)).toDF("doc_id", "w")
    intercept[Exception] {
      Sampling.weightedTopKLog(neg, k = 2, weightCol = "w").collect()
    }
  }

  private def md5bucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"42:$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 1000000L
  }

  test("log-domain ES selection matches a JVM replay across w ∈ 1e-3..1e6") {
    // wide-range weights: each doc's weight spans nine orders of magnitude
    // — exactly where the micro-grid u^(1/w) key of weightedTopK collides
    val weights = Array(1e-3, 1.0, 1e3, 1e6)
    val d = (0L until 400L).map(i => (i, weights((i % 4).toInt)))
      .toDF("doc_id", "w")
    val got = Sampling.weightedTopKLog(d, k = 50, weightCol = "w")
      .select($"doc_id", $"es_lognum").as[(Long, Long)].collect().toSet

    val local = (0L until 400L).map { id =>
      val u = (md5bucket(id) + 1.0) / 1000001.0
      val num = math.floor(math.log(u) * 1000000 + 0.5).toLong
      (id, num, num.toDouble / weights((id % 4).toInt))
    }.sortBy { case (id, _, key) => (-key, id) }.take(50)
      .map(t => (t._1, t._2)).toSet
    assert(got === local)
    // sanity: the selection is weight-responsive — heavy weights dominate
    val heavy = got.count { case (id, _) => id % 4 == 3 }
    assert(heavy > 30, s"1e6-weight rows should dominate the draw, got $heavy/50")
  }

  test("log-domain ES keys do NOT collide at large weights (the grid-compression fix)") {
    // u^(1/w) for w ∈ {1e5, 1e6} rounds to the SAME micro key (≈1.0) for
    // almost every u, so weightedTopK degenerates to id order there;
    // ln(u)/w keeps the two weight classes strictly separated
    val d = (0L until 200L).map(i =>
      (i, if (i < 100) 1.0e5 else 1.0e6)).toDF("doc_id", "w")
    val legacy = Sampling.weightedTopK(d, k = 200, weightCol = "w")
      .select($"es_key_micro").as[Long].collect().distinct
    assert(legacy.length < 100,
      s"precondition: micro keys should collide heavily at huge w (observed " +
        s"29 distinct / 200 rows at this seed), got ${legacy.length} distinct")
    val logSel = Sampling.weightedTopKLog(d, k = 100, weightCol = "w")
      .select($"doc_id").as[Long].collect()
    val heavy = logSel.count(_ >= 100)
    assert(heavy > 55, s"w=1e6 class must win most of a k=100 draw, got $heavy")
  }

  test("temperature mix: n^alpha quotas flatten the head, all-Long replay") {
    // 160 docs of lang A, 20 of B, 20 of C: proportional would give A 80%
    val docs = ((0L until 160L).map((_, "A")) ++
      (160L until 180L).map((_, "B")) ++
      (180L until 200L).map((_, "C"))).toDF("doc_id", "lang")
    val r = Sampling.temperatureMix(docs, "lang", total = 100L, alpha = 0.3)
      .collect().map(row => (row.getLong(0), row.getString(1), row.getLong(3)))
    val byLang = r.groupBy(_._2).view.mapValues(_.length).toMap
    // hand arithmetic: w = floor(n^0.3·1e6 + .5) → A 4583909, B 2456456,
    // C 2456456; tot 9496821; quotas = 100·w div tot → 48, 25, 25; B and
    // C hold only 20 docs, so their quota caps at the group size —
    // proportional would have given A 80 of 100, flattening gives 48
    assert(byLang == Map("A" -> 48, "B" -> 20, "C" -> 20), s"got $byLang")
    // every selected row carries its group's quota
    assert(r.filter(_._2 == "A").forall(_._3 == 48L))
    assert(r.filter(_._2 == "B").forall(_._3 == 25L))
    assert(r.length == 88)
    // determinism across partitionings
    val again = Sampling.temperatureMix(docs.repartition(7), "lang",
      total = 100L, alpha = 0.3).collect()
      .map(row => (row.getLong(0), row.getString(1))).toSet
    assert(again == r.map(t => (t._1, t._2)).toSet)
  }

  test("temperature mix: tiny totals floor to zero-quota groups, not crashes") {
    val docs = ((0L until 160L).map((_, "A")) ++
      (160L until 180L).map((_, "B")) ++
      (180L until 200L).map((_, "C"))).toDF("doc_id", "lang")
    // total=3: only A's 3·w div tot reaches 1; B and C floor to 0 and
    // contribute nothing (floor-division under-allocation, documented)
    val tiny = Sampling.temperatureMix(docs, "lang", total = 3L, alpha = 0.3)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    assert(tiny.toSeq == Seq(("A", 1L)), s"got ${tiny.toSeq}")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(docs, "lang", total = 0L, alpha = 0.3)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(docs, "lang", total = 10L, alpha = 1.5)
    }
  }

  test("cluster-balanced: planted imbalance flattens under n^0.5 quotas") {
    // two planted cells at (1,0) and (0,1): 90 docs near cell 0, 10 near
    // cell 1 — α=0.5 quotas go ∝ √n, so cell 1's 10% share rises to
    // √90:√10 ≈ 3:1 (25%) instead of 9:1
    val cb = graft.index.Codebook(Array(Array(
      Array(1f, 0f), Array(0f, 1f))))
    val vecs = (0L until 100L).map { i =>
      if (i < 90L) (i, Array(0.9f + 0.001f * i.toFloat, 0.1f))
      else (i, Array(0.1f, 0.9f + 0.001f * i.toFloat))
    }.toDF("doc_id", "vec")
    val cells = graft.index.CodeAssigner.assign(vecs, cb)
      .select(col("doc_id").as("vec_id"),
        col("codes").getItem(0).cast("long").as("cell"))
    val r = Sampling.temperatureMix(cells, "cell", total = 40L,
        alpha = 0.5, idCol = "vec_id")
      .collect().map(row => (row.getLong(1), row.getLong(0))).toSeq
    val byCell = r.groupBy(_._1).view.mapValues(_.size).toMap
    // quotas: w0=9486833μ, w1=3162278μ, tot=12649111μ →
    // 40·w0 div tot = 29 (29.99 floors), 40·w1 div tot = 10 —
    // cell 1's 10% population share lands at 10/39 ≈ 26%
    assert(byCell == Map(0L -> 29, 1L -> 10), s"got $byCell")
    // the draw itself is deterministic
    val again = Sampling.temperatureMix(cells.repartition(5), "cell",
        total = 40L, alpha = 0.5, idCol = "vec_id")
      .collect().map(row => (row.getLong(1), row.getLong(0))).toSet
    assert(again == r.toSet)
  }

  test("token budget histogram form equals the direct cumsum window form on a coarse grid") {
    import org.apache.spark.sql.expressions.Window
    // same discipline as the temperatureMix pin below: a 97-bucket
    // grid over 30k skewed rows lands the budget boundary mid-bucket,
    // so the leftover-allowance (r) walk has to split a fat tie set;
    // the tiny 'ar' group's total fits its budget, exercising the
    // keep-all (no h* row) branch
    val gridM = 97L
    val seed = 7L
    val d = spark.range(30000).select(col("id").as("doc_id"),
      when(col("id") < 27000, "en")
        .when(col("id") < 29700, "zh").otherwise("ar").as("grp"),
      (col("id") % 37 + 1).cast("long").as("n_tokens"))
    val out = Sampling.tokenBudgetGrid(d, "grp", budget = 40000L,
      nTokCol = "n_tokens", idCol = "doc_id", seed = seed, gridM = gridM)
    val got = out.select("grp", "doc_id").as[(String, Long)].collect().toSet

    val h = pmod(graft.functions.HashFunctions.md5_prefix(
      concat(lit(seed.toString), lit(":"), col("doc_id").cast("string")),
      15), lit(gridM))
    val w = Window.partitionBy(col("grp")).orderBy(h.asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = d.withColumn("__cum", sum(col("n_tokens")).over(w))
      .where(col("__cum") <= 40000L)
      .select("grp", "doc_id").as[(String, Long)].collect().toSet
    assert(got == ref,
      s"histogram budget selection diverged from the cumsum window: " +
        s"only-hist=${(got -- ref).take(5)} only-ref=${(ref -- got).take(5)}")

    // ar's ~5.7k total tokens fit the 40k budget → keep-all branch
    assert(got.count(_._1 == "ar") == 300)
    // budget respected exactly per group
    val sums = out.groupBy("grp").agg(sum("n_tokens").as("s"))
      .as[(String, Long)].collect().toMap
    assert(sums("en") <= 40000L && sums("zh") <= 40000L)
    // vacuity check: the en boundary bucket got split mid-tie-set
    val withH = d.where(col("grp") === "en").withColumn("__h", h)
    val selIds = got.filter(_._1 == "en").map(_._2)
    val hStar = withH.where(col("doc_id").isin(selIds.toSeq: _*))
      .agg(max("__h")).as[Long].head()
    val atBoundary = withH.where(col("__h") === hStar).count()
    val selAtBoundary = withH.where(col("__h") === hStar &&
      col("doc_id").isin(selIds.toSeq: _*)).count()
    assert(selAtBoundary > 0 && selAtBoundary < atBoundary,
      s"budget boundary bucket not split (sel $selAtBoundary of $atBoundary)")
  }

  test("unimax epochs: water level, saturation, and epoch expansion (hand case)") {
    // groups a=2, b=5, c=50 docs at E=3 → caps 6, 15, 150. Budget 40:
    // a saturates (0 + 3·6 = 18 ≤ 40), b saturates (6 + 2·15 = 36 ≤ 40),
    // c does not (21 + 150 > 40) → level t = (40 − 21) div 1 = 19.
    // Quotas a=6 (3 full epochs), b=15 (3 full epochs), c=19 (0 full +
    // 19-doc partial at epoch 0). Σ = 40 = the whole budget.
    val d = ((0L until 2L).map(i => (i, "a")) ++
      (10L until 15L).map(i => (i, "b")) ++
      (100L until 150L).map(i => (i, "c"))).toDF("doc_id", "grp")
    val out = Sampling.unimaxEpochs(d, "grp", budget = 40L, epochCap = 3)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val byGrp = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byGrp == Map("a" -> 6, "b" -> 15, "c" -> 19), s"got $byGrp")
    // saturated groups run full epochs 0..2 over EVERY doc
    assert(out.filter(_._1 == "a").map(_._3).sorted.toSeq ==
      Seq(0L, 0L, 1L, 1L, 2L, 2L))
    assert(out.filter(_._1 == "b").count(_._3 == 2L) == 5)
    // the unsaturated group is one partial epoch, all at epoch 0
    assert(out.filter(_._1 == "c").forall(_._3 == 0L))
    assert(out.filter(_._1 == "c").map(_._2).distinct.length == 19)

    // budget ≥ Σ caps: everyone saturates at exactly E epochs
    val all = Sampling.unimaxEpochs(d, "grp", budget = 1000L, epochCap = 2)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(all.length == (2 + 5 + 50) * 2)
    assert(all.forall(t => t._2 == 0L || t._2 == 1L))

    // deterministic under repartition
    val again = Sampling.unimaxEpochs(d.repartition(7), "grp",
        budget = 40L, epochCap = 3)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2))).toSet
    assert(again == out.toSet)

    // the partial-epoch draw equals the direct window walk AT THE SAME
    // grid (the grid defines the rank order, so this is the meaningful
    // invariant — the same one the temperatureMix/tokenBudget coarse
    // pins establish for the shared selection core): c's 19 partial
    // docs under a 7-bucket grid = the 19 smallest (h%7, id) of c
    import org.apache.spark.sql.expressions.Window
    val gridM = 7L
    val coarse = Sampling.unimaxEpochsGrid(d, "grp", 40L, 3,
        "doc_id", 42L, gridM)
      .collect().filter(_.getString(1) == "c").map(_.getLong(0)).toSet
    val h = pmod(graft.functions.HashFunctions.md5_prefix(
      concat(lit("42"), lit(":"), col("doc_id").cast("string")), 15),
      lit(gridM))
    val w = Window.partitionBy(col("grp")).orderBy(h.asc, col("doc_id").asc)
    val ref = d.where(col("grp") === "c")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= 19).select("doc_id")
      .as[Long].collect().toSet
    assert(coarse == ref, "partial draw diverged from the rank walk")
  }

  test("unimax epochs fails fast when the group key is finer than maxGroups") {
    // VERDICT r12 #3: the water-level windows sort the #groups-row cap
    // table in ONE task; a fine key (k-means cells, domains) must trip
    // the guard BEFORE any window runs, with an actionable message
    val fine = spark.range(500).select(col("id").as("doc_id"),
      col("id").cast("string").as("grp")) // 500 groups of 1
    val e = intercept[IllegalArgumentException] {
      Sampling.unimaxEpochs(fine, "grp", budget = 100L, epochCap = 2,
        maxGroups = 100L)
    }
    assert(e.getMessage.contains("500 distinct") &&
      e.getMessage.contains("maxGroups=100") &&
      e.getMessage.contains("coarser group key"), e.getMessage)
    // at the default bound the same frame allocates normally (budget 600
    // over 500 singleton groups → water level 1 → one doc per group)
    assert(Sampling.unimaxEpochs(fine, "grp", budget = 600L,
      epochCap = 2).count() == 500)
  }

  test("token budget treats NULL token counts as 0 (ADVICE r12)") {
    // the direct cumsum-window form skips NULLs (sum ignores them), so a
    // NULL-token row rides along for free; the histogram form must agree
    // — before the coalesce fix an all-NULL boundary bucket nulled __r
    // and dropped its whole tie set
    val d = spark.range(200).select(col("id").as("doc_id"),
      lit("g").as("grp"),
      when(col("id") % 3 === 0, lit(null).cast("long"))
        .otherwise(lit(10L)).as("n_tokens"))
    val gridM = 7L
    val got = Sampling.tokenBudgetGrid(d, "grp", budget = 300L,
        nTokCol = "n_tokens", idCol = "doc_id", seed = 42L, gridM = gridM)
      .select("doc_id").as[Long].collect().toSet
    // reference: inclusive running sum over coalesce(n,0) in the same
    // (hash % grid, id) order
    import org.apache.spark.sql.expressions.Window
    val h = pmod(graft.functions.HashFunctions.md5_prefix(
      concat(lit("42"), lit(":"), col("doc_id").cast("string")), 15),
      lit(gridM))
    val w = Window.partitionBy("grp").orderBy(h.asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = d.withColumn("__c", sum(coalesce(col("n_tokens"), lit(0L))).over(w))
      .where(col("__c") <= 300L).select("doc_id").as[Long].collect().toSet
    assert(got == ref, s"NULL-token selection diverged: got ${got.size}, ref ${ref.size}")
    assert(got.nonEmpty)
  }

  test("per-group token budgets: constant budgets equal the scalar form; missing groups drop; NULL raises") {
    val d = spark.range(6000).select(col("id").as("doc_id"),
      when(col("id") < 5000, "web").when(col("id") < 5800, "code")
        .otherwise("books").as("src"),
      (col("id") % 7 + 3).as("n_tokens"))
    val gridM = 13L // coarse: boundary buckets must split mid-tie-set
    // 1. a constant budgets frame selects the IDENTICAL set as the
    // scalar form at the same grid
    val const = Seq(("web", 900L), ("code", 900L), ("books", 900L))
      .toDF("src", "budget")
    val got = Sampling.tokenBudgetPerGroupGrid(d, "src", const,
        "n_tokens", "doc_id", 42L, gridM)
      .select("doc_id").as[Long].collect().toSet
    val ref = Sampling.tokenBudgetGrid(d, "src", 900L,
        "n_tokens", "doc_id", 42L, gridM)
      .select("doc_id").as[Long].collect().toSet
    assert(got == ref, s"per-group(const) diverged from scalar: " +
      s"got-only ${(got -- ref).take(5)}, ref-only ${(ref -- got).take(5)}")
    // the boundary machinery was exercised, not vacuous: some group's
    // budget actually bound (drops happened)
    assert(got.size < 6000)
    // 2. distinct budgets fill each group to ITS own cap
    val mix = Seq(("web", 2000L), ("code", 500L)).toDF("src", "budget")
    val out = Sampling.tokenBudgetPerGroup(d, "src", mix,
      nTokCol = "n_tokens", idCol = "doc_id")
    val sums = out.groupBy("src").agg(sum("n_tokens").as("s"))
      .as[(String, Long)].collect().toMap
    assert(sums("web") <= 2000L && sums("web") > 2000L - 10L, s"web fill $sums")
    assert(sums("code") <= 500L && sums("code") > 500L - 10L, s"code fill $sums")
    // books has no budget row → not in the mix
    assert(!sums.contains("books"), s"unbudgeted group leaked: $sums")
    // 3. a NULL budget fails closed
    val bad = Seq(("web", Some(100L)), ("code", None))
      .toDF("src", "budget")
    val e = intercept[Exception] {
      Sampling.tokenBudgetPerGroup(d, "src", bad,
        nTokCol = "n_tokens", idCol = "doc_id").count()
    }
    assert(e.getMessage != null)
  }

  test("temperature mix histogram form equals the direct window form on a coarse grid") {
    import org.apache.spark.sql.expressions.Window
    // The ADVICE-r11 property pin: the histogram/threshold/tie-trim
    // machinery must select the IDENTICAL row set as the plain
    // row_number-over-(hash,id) window it replaced. A 1e6-value grid
    // over a unit-test fixture never collides at the boundary, so the
    // grid shrinks to 97 buckets over 30k skewed rows: the hot group
    // packs ~278 rows per bucket, the quota boundary lands mid-bucket,
    // and the h*/r trim has to split a fat tie set — the exact
    // arithmetic a vacuous boundary would leave untested. The tiny
    // 'ar' group's quota exceeds its population, exercising the
    // keep-all (no h* row) branch in the same run.
    val gridM = 97L
    val seed = 7L
    val d = spark.range(30000).select(col("id").as("doc_id"),
      when(col("id") < 27000, "en")
        .when(col("id") < 29700, "zh").otherwise("ar").as("lang"))
    val out = Sampling.temperatureMixGrid(d, "lang", total = 3000L,
      alpha = 0.3, idCol = "doc_id", seed = seed, gridM = gridM)
    val got = out.select("lang", "doc_id")
      .as[(String, Long)].collect().toSet

    // reference form: per-group row_number over (grid rank, id), kept
    // while rn <= quota — the mega-group-UNSAFE shape the histogram
    // form exists to replace, trustworthy as an oracle at 30k rows
    val h = pmod(graft.functions.HashFunctions.md5_prefix(
      concat(lit(seed.toString), lit(":"), col("doc_id").cast("string")),
      15), lit(gridM))
    val quotas = out.select("lang", "quota").distinct()
    val w = Window.partitionBy(col("lang")).orderBy(h.asc, col("doc_id").asc)
    val ref = d.join(quotas, Seq("lang"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .where(col("__rn") <= col("quota"))
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(got == ref,
      s"histogram selection diverged from the window walk: " +
        s"only-hist=${(got -- ref).take(5)} only-ref=${(ref -- got).take(5)}")

    // boundary sanity: the quota really does land mid-bucket (a tie
    // set got split) — otherwise this test pins nothing
    val enQuota = quotas.where(col("lang") === "en")
      .select("quota").as[Long].head()
    val enSel = got.count(_._1 == "en").toLong
    assert(enSel == enQuota, s"en selected $enSel != quota $enQuota")
    val arAll = d.where(col("lang") === "ar").count()
    assert(got.count(_._1 == "ar").toLong == arAll,
      "ar group (quota > n) must keep every row")
    // the en boundary bucket is shared: selected and unselected rows
    // coexist at h == h* (i.e. the trim split a tie set)
    val withH = d.where(col("lang") === "en").withColumn("__h", h)
    val selIds = got.filter(_._1 == "en").map(_._2)
    val hStar = withH.where(col("doc_id").isin(selIds.toSeq: _*))
      .agg(max("__h")).as[Long].head()
    val atBoundary = withH.where(col("__h") === hStar).count()
    val selAtBoundary = withH.where(col("__h") === hStar &&
      col("doc_id").isin(selIds.toSeq: _*)).count()
    assert(selAtBoundary > 0 && selAtBoundary < atBoundary,
      s"boundary bucket not split (sel $selAtBoundary of $atBoundary) — " +
        "grid too fine for the fixture, test is vacuous")
  }
}
