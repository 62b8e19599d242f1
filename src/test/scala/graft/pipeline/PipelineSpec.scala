package graft.pipeline

import graft.SparkSpec
import graft.io.Tables
import graft.index.{RQTrainer, CodeAssigner, ClusterIndexBuilder}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf("0.001"), "documents").cache()

  test("exactDedup keeps one row per distinct text, min id wins") {
    val withDups = docs.select("doc_id", "text")
      .union(docs.select(col("doc_id") + 10000, col("text")))
    val deduped = Dedup.exactDedup(withDups)
    assert(deduped.count() == docs.count())
    assert(deduped.where(col("doc_id") >= 10000).count() == 0)
  }

  test("exactDedup handles unorderable payload columns (ADVICE r12)") {
    // a MapType payload can't sit inside the min-struct agg (Spark
    // requires orderable struct fields) — the two-pass min(id)+semi-join
    // form must kick in transparently with the same kept set
    val withMap = Seq(
      (1L, "same text", Map("k" -> 1)),
      (2L, "same text", Map("k" -> 2)),
      (3L, "other text", Map("k" -> 3))).toDF("doc_id", "text", "meta")
    val out = Dedup.exactDedup(withMap).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // payload survives the roundtrip
    assert(out.map(r => r.getMap[String, Int](2)("k")).sorted.toSeq ==
      Seq(1, 3))
  }

  test("short docs (< shingleN tokens) are dropped, not crashed") {
    val mixed = Seq((1L, "one two"), (2L, "a"), (3L, ""),
      (4L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(mixed).collect()
    assert(sigs.map(_.getLong(0)).toSet == Set(4L))
    val jac = Dedup.jaccardPairs(mixed).collect()
    assert(jac.nonEmpty) // pairs exist (empty-set pairs have 0/union)
  }

  test("minhash signature containment: identical docs share signatures") {
    val two = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here now ok")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(two).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("LSH candidates contain exact duplicates") {
    val two = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here now ok")).toDF("doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(Dedup.minhashSignatures(two))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("LSH band-bucket cap drops degenerate buckets, keeps normal ones") {
    // 6 identical docs → every band bucket holds all 6; cap 5 drops them.
    // Two near-identical docs elsewhere still pair under the same cap.
    val clones = (1L to 6L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val pairDocs = Seq((10L, "red orange yellow green blue indigo"),
      (11L, "red orange yellow green blue indigo"))
    val docs = (clones ++ pairDocs).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs)
    val capped = Dedup.lshCandidatePairs(sigs, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((10L, 11L)))
    // with the default cap all 6·5/2 clone pairs come back too
    val full = Dedup.lshCandidatePairs(sigs).count()
    assert(full == 15 + 1)
  }

  test("as-of join: latest prior right row, equal-ts visibility, no-match null") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val left = Seq((1L, 10L, ts(100)), (2L, 10L, ts(200)), (3L, 20L, ts(50)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((11L, 10L, ts(90)), (12L, 10L, ts(200)), (13L, 20L, ts(60)))
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "event_id")
      .select(col("event_id"), col("asof.event_id").as("m")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // left 1: latest right at/before t=100 is 11; left 2: equal-ts right 12
    // is visible; left 3: right is later (t=60 > 50) → no match
    assert(out == Map(1L -> 11L, 2L -> 12L, 3L -> -1L))
  }

  test("as-of join tie rule: greatest tie column wins at equal timestamps") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val left = Seq((1L, 10L, ts(100))).toDF("event_id", "user_id", "ts")
    val right = Seq((11L, 10L, ts(90)), (15L, 10L, ts(90)), (12L, 10L, ts(90)))
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "event_id")
      .select(col("asof.event_id")).head.getLong(0)
    assert(out == 15L)
  }

  test("simhashPairs banding finds exactly the brute-force hamming matches") {
    val sigs = Dedup.simhash(docs)
    val banded = Dedup.simhashPairs(sigs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = sigs.as("x").join(sigs.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long")
          .as("hamming"))
      .where(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute)
  }

  test("simhashPairs rejects a banding that voids the pigeonhole guarantee") {
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(Dedup.simhash(docs), maxHamming = 4, bands = 4)
    }
  }

  test("contamination screen: planted excerpt hits its source document") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "totally unrelated content with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "beta gamma delta epsilon zeta eta"),
      (200L, "missing from every corpus document entirely")
    ).toDF("bench_id", "text")
    val hits = Contamination.screen(corpus, bench, n = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((1L, 100L)))
    // the frozen-artifact split (r14): screen ≡ screenHashed over the
    // precomputed gram table — the form the streaming door consumes
    val grams = Contamination.hashedGrams(bench, n = 3)
    val viaFrozen = Contamination
      .screenHashed(corpus, grams, n = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaFrozen == hits)
  }

  test("connected components: chains, cliques, and singleton pairs") {
    // chain 1-2-3-4 (diameter 3), clique {10,11,12}, isolated pair (20,21)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("a", "b")
    val comp = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: long path converges within the iteration cap") {
    // a 40-vertex path needs ~log2(40) rounds with path halving — far
    // under maxIter, and the min label must traverse the whole path
    val edges = (0L until 39L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = Dedup.connectedComponents(edges).collect()
    assert(comp.length == 40 && comp.forall(_.getLong(1) == 0L))
    // reversed ids: min is at the far end
    val rev = (0L until 39L).map(i => (39L - i, 38L - i)).toDF("a", "b")
    val comp2 = Dedup.connectedComponents(rev).collect()
    assert(comp2.length == 40 && comp2.forall(_.getLong(1) == 0L))
  }

  test("connected components: empty edge set yields empty labels") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(edges).count() == 0)
  }

  test("connectedComponentsAuto: driver union-find equals the distributed labels; gate routes") {
    // random sparse graph with multi-edge chains: the driver shortcut
    // must produce the IDENTICAL (v, min-member) labeling
    val rng = new scala.util.Random(7)
    val randEdges = (0 until 400).map { _ =>
      val a = rng.nextInt(300).toLong; val b = rng.nextInt(300).toLong
      (math.min(a, b), math.max(a, b) + 1) // avoid self-loops
    }.toDF("a", "b")
    val dist = Dedup.connectedComponents(randEdges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Dedup.connectedComponentsAuto(randEdges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == dist, s"driver union-find diverged: " +
      s"auto-only ${auto -- dist}, dist-only ${dist -- auto}")
    // the gate: maxDriverEdges below the edge count must route to the
    // distributed path (observable: same labels — so pin the routing by
    // shape instead: a 1-edge graph under a 0-edge budget still works)
    val one = Seq((5L, 2L)).toDF("a", "b")
    val forced = Dedup.connectedComponentsAuto(one, maxDriverEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(forced == Set((5L, 2L), (2L, 2L)))
    // empty edges through the driver path
    assert(Dedup.connectedComponentsAuto(
      Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
    // non-integral vertex ids must route DISTRIBUTED (the driver path
    // works in Longs; a string id would silently null-cast)
    val strComp = Dedup.connectedComponentsAuto(
      Seq(("x", "y"), ("y", "z")).toDF("a", "b")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(strComp == Set(("x", "x"), ("y", "x"), ("z", "x")))
  }

  test("hash-based Jaccard confirm matches the array form on candidate pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six"),
      (4L, "ab")).toDF("doc_id", "text") // doc 4: no shingles
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val byArray = Dedup.jaccardPairs(docs, pairs = Some(pairs))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val byHash = Dedup.jaccardPairsByHash(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(byHash.keySet == byArray.keySet)
    byArray.foreach { case (k, v) =>
      assert(math.abs(byHash(k) - v) < 1e-12, s"pair $k: ${byHash(k)} vs $v")
    }
    assert(byHash((1L, 4L)) == 0.0)
  }

  test("RQ-cluster negative sampling: negatives share the positive's cluster, exclude it") {
    val emb = Tables.load(spark, sf("0.001"), "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding").as("vec"))
    val cb = RQTrainer.fit(emb, "vec", numLevels = 2, k = 8, seed = 42L)
    val assignments = CodeAssigner.assign(emb, cb).cache()
    val index = ClusterIndexBuilder.build(assignments)
    val pairs = emb.where(col("doc_id") < 10)
      .select(concat(lit("q"), col("doc_id")).as("query"), col("doc_id"))
    val negs = NegativeSampling.clusterNegatives(pairs, assignments, index, n = 3)
    val joined = negs
      .join(assignments.withColumnRenamed("codes", "pos_codes"), Seq("doc_id"))
      .select(col("doc_id"), col("pos_codes"), explode(col("neg_ids")).as("neg_id"))
      .join(assignments.select(col("doc_id").as("neg_id"),
        col("codes").as("neg_codes")), Seq("neg_id"))
    assert(joined.where(col("neg_id") === col("doc_id")).count() == 0)
    assert(joined.where(col("pos_codes") =!= col("neg_codes")).count() == 0)
    // deterministic
    val n2 = NegativeSampling.clusterNegatives(pairs, assignments, index, n = 3)
    assert(negs.orderBy("doc_id").collect().toSeq ==
      n2.orderBy("doc_id").collect().toSeq)
  }

  test("clusterNegatives is chunk-invariant (one row per pair, any maxChunk)") {
    val emb = Tables.load(spark, sf("0.001"), "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding").as("vec"))
    val cb = RQTrainer.fit(emb, "vec", numLevels = 2, k = 8, seed = 42L)
    val assignments = CodeAssigner.assign(emb, cb).cache()
    val pairs = emb.where(col("doc_id") < 10)
      .select(concat(lit("q"), col("doc_id")).as("query"), col("doc_id"))
    val big = ClusterIndexBuilder.build(assignments, maxChunk = 100000)
    val tiny = ClusterIndexBuilder.build(assignments, maxChunk = 3)
    val a = NegativeSampling.clusterNegatives(pairs, assignments, big, n = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getSeq[Long](2))).toSeq
    val b = NegativeSampling.clusterNegatives(pairs, assignments, tiny, n = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getSeq[Long](2))).toSeq
    assert(a == b)
    assert(a.length == 10) // exactly one row per (query, positive)
  }

  test("combineNegatives file/inter/union modes (A7 combinators)") {
    val clus = Seq(("q1", 1L, Seq(10L, 11L, 12L))).toDF("query", "doc_id", "neg_ids")
    val file = Seq(("q1", Seq(11L, 12L, 13L))).toDF("query", "neg_ids")
    def ids(mode: String, n: Int = 10): Set[Long] =
      NegativeSampling.combineNegatives(clus, file, mode, n)
        .head.getSeq[Long](2).toSet
    assert(ids("file") == Set(11L, 12L, 13L))
    assert(ids("union") == Set(10L, 11L, 12L, 13L))
    // inter (main_models.py:1880-1892): intersection satisfied → done
    assert(ids("inter", n = 2) == Set(11L, 12L))
    // deficit covered by rest_part (clus ∖ file) → back-fill
    assert(ids("inter", n = 3) == Set(10L, 11L, 12L))
    // rest_part can't cover the deficit → the FULL cluster list
    assert(ids("inter", n = 10) == Set(10L, 11L, 12L))
    // empty intersection still back-fills from the cluster side
    val disjoint = Seq(("q1", Seq(98L, 99L))).toDF("query", "neg_ids")
    assert(NegativeSampling.combineNegatives(clus, disjoint, "inter", n = 2)
      .head.getSeq[Long](2).size == 2)
    // missing file row falls back to cluster negatives
    val noFile = Seq(("q2", Seq(99L))).toDF("query", "neg_ids")
    assert(NegativeSampling.combineNegatives(clus, noFile, "inter", n = 10)
      .head.getSeq[Long](2).toSet == Set(10L, 11L, 12L))
  }

  test("combineNegatives interhalf splits the quota across inter/rest (A7)") {
    val clus = Seq(("q1", 1L, Seq(10L, 11L, 12L, 13L, 14L, 15L)))
      .toDF("query", "doc_id", "neg_ids")
    val file = Seq(("q1", Seq(10L, 11L, 12L, 90L))).toDF("query", "neg_ids")
    // n=4: 2 from inter {10,11,12}, 2 from rest {13,14,15}
    val got = NegativeSampling.combineNegatives(clus, file, "interhalf", n = 4)
      .head.getSeq[Long](2).toSet
    assert(got.size == 4)
    assert(got.count(Set(10L, 11L, 12L)) == 2)
    assert(got.count(Set(13L, 14L, 15L)) == 2)
    // empty intersection → the whole rest side (capped at n)
    val disjoint = Seq(("q1", Seq(97L, 98L, 99L))).toDF("query", "neg_ids")
    assert(NegativeSampling.combineNegatives(clus, disjoint, "interhalf", n = 4)
      .head.getSeq[Long](2).toSet.subsetOf(Set(10L, 11L, 12L, 13L, 14L, 15L)))
    // file ⊇ clus → rest empty → the inter side
    val superset = Seq(("q1", (9L to 16L).toSeq)).toDF("query", "neg_ids")
    assert(NegativeSampling.combineNegatives(clus, superset, "interhalf", n = 4)
      .head.getSeq[Long](2).toSet.subsetOf(Set(10L, 11L, 12L, 13L, 14L, 15L)))
  }

  test("simansInterNegatives fallback chain (A7 simansinter)") {
    // survivors ≥ n → race top-n from the intersection only
    val scored = Seq.tabulate(8)(i =>
      ("q1", 1L, 10L + i, 0.9 - i * 0.1, 1.0))
      .toDF("query", "doc_id", "cand_id", "cand_score", "pos_score")
    val bigClus = Seq(("q1", 1L, (10L to 17L).toSeq))
      .toDF("query", "doc_id", "neg_ids")
    val race = NegativeSampling.simansInterNegatives(scored, bigClus, n = 5)
      .head.getSeq[Long](2)
    assert(race.size == 5 && race.forall(c => c >= 10L && c <= 17L))
    // survivors < n but cluster ≥ n → survivors ∪ cluster draw, size n
    val narrow = Seq(("q1", 1L, Seq(10L, 11L, 30L, 31L, 32L, 33L)))
      .toDF("query", "doc_id", "neg_ids")
    val mid = NegativeSampling.simansInterNegatives(scored, narrow, n = 5)
      .head.getSeq[Long](2)
    assert(mid.size == 5)
    assert(mid.toSet.subsetOf(Set(10L, 11L, 30L, 31L, 32L, 33L)))
    // cluster itself < n → the whole short cluster list, verbatim
    val short = Seq(("q1", 1L, Seq(10L, 30L))).toDF("query", "doc_id", "neg_ids")
    assert(NegativeSampling.simansInterNegatives(scored, short, n = 5)
      .head.getSeq[Long](2) == Seq(10L, 30L))
    // zero survivors (disjoint file/cluster) still resolves via fallback
    val disjoint = Seq(("q1", 1L, (50L to 60L).toSeq))
      .toDF("query", "doc_id", "neg_ids")
    assert(NegativeSampling.simansInterNegatives(scored, disjoint, n = 5)
      .head.getSeq[Long](2).size == 5)
  }

  test("notClusterNegatives excludes the positive's cluster (A7 notclus)") {
    val emb = Tables.load(spark, sf("0.001"), "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding").as("vec"))
    val cb = RQTrainer.fit(emb, "vec", numLevels = 2, k = 8, seed = 42L)
    val assignments = CodeAssigner.assign(emb, cb).cache()
    val pairs = emb.where(col("doc_id") < 3)
      .select(concat(lit("q"), col("doc_id")).as("query"), col("doc_id"))
    val negs = NegativeSampling.notClusterNegatives(pairs, assignments,
      emb.select("doc_id"), n = 5)
    assert(negs.count() == 3)
    val joined = negs
      .join(assignments.withColumnRenamed("codes", "pos_codes"), Seq("doc_id"))
      .select(col("pos_codes"), explode(col("neg_ids")).as("neg_id"))
      .join(assignments.select(col("doc_id").as("neg_id"),
        col("codes").as("neg_codes")), Seq("neg_id"))
    // reference's if_in_clus: reject on ANY shared code level, not just
    // full-tuple equality (main_models.py:1841-1843)
    val sharesLevel = array_contains(
      zip_with(col("pos_codes"), col("neg_codes"), (a, b) => a === b), true)
    assert(joined.where(sharesLevel).count() == 0)
    assert(negs.where(size(col("neg_ids")) =!= 5).count() == 0)
  }

  test("simans sampling is deterministic and bounded") {
    val scored = Seq(
      ("q1", 1L, 10L, 0.9, 1.0), ("q1", 1L, 11L, 0.5, 1.0),
      ("q1", 1L, 12L, 0.95, 1.0), ("q1", 1L, 13L, 0.1, 1.0))
      .toDF("query", "doc_id", "cand_id", "cand_score", "pos_score")
    val a = NegativeSampling.simansNegatives(scored, n = 2).collect()
    val b = NegativeSampling.simansNegatives(scored, n = 2).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.head.getSeq[Long](2).size == 2)
  }

  test("IVF-blocked near-dup finds planted duplicates without labels") {
    val emb = Tables.load(spark, sf("0.001"), "embeddings")
    // plant an exact duplicate of vec 0 under a new id
    val dup = emb.where(col("vec_id") === 0)
      .select(lit(99999L).as("vec_id"), col("embedding"), col("label"))
    val withDup = emb.unionByName(dup)
    val pairs = Dedup.embeddingNearDupIVF(withDup, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 99999L)), s"planted dup not found: ${pairs.toSeq}")
  }

  test("semdedup: τ-groups keep their least-centroid-similar exemplar") {
    // hand codebook: two unit centroids; vectors planted so cluster 0
    // holds a τ-similar pair (v0 exact-on-centroid, v1 slightly off)
    // plus a dissimilar loner, cluster 1 likewise
    val cb = graft.index.Codebook(Array(Array(
      Array(1f, 0f), Array(0f, 1f))))
    val emb = Seq(
      (0L, Array(1f, 0f)),       // cell 0, cent_sim 1.0     → dropped
      (1L, Array(0.98f, 0.2f)),  // cell 0, cent_sim ≈0.9798 → kept (min of group)
      (2L, Array(0.8f, -0.5f)),  // cell 0, cos<τ to both    → kept
      (3L, Array(0f, 1f)),       // cell 1, cent_sim 1.0     → dropped
      (4L, Array(0.1f, 0.99f)),  // cell 1, cent_sim ≈0.9949 → kept
      (5L, Array(-0.9f, 0.5f))   // cell 1, dissimilar       → kept
    ).toDF("vec_id", "embedding")
    val cells = graft.index.CodeAssigner.assign(
        emb.selectExpr("vec_id as doc_id", "embedding as vec"), cb)
      .select(col("doc_id"), col("codes").getItem(0).as("cell"))
    val r = Dedup.semDeDup(emb, cells, cb, tau = 0.9)
      .collect().map(row => row.getLong(0) ->
        (row.getInt(1), row.getLong(2), row.getBoolean(3))).toMap
    assert(r.size == 6) // every input row gets a decision
    assert(r(0L)._1 == 0 && r(1L)._1 == 0 && r(2L)._1 == 0)
    assert(r(3L)._1 == 1 && r(4L)._1 == 1 && r(5L)._1 == 1)
    assert(r(0L)._2 == 1000000L) // exact-on-centroid
    assert(r(1L)._2 < r(0L)._2)  // the off-centroid doc ranks first
    assert(!r(0L)._3 && r(1L)._3, s"cluster-0 keep rule: $r")
    assert(r(2L)._3)             // dissimilar loner survives
    assert(!r(3L)._3 && r(4L)._3 && r(5L)._3, s"cluster-1 keep rule: $r")

    // partitioning invariance: same kept set under a different chopping
    val again = Dedup.semDeDup(emb.repartition(5), cells, cb, tau = 0.9)
      .collect().map(row => row.getLong(0) -> row.getBoolean(3)).toMap
    assert(again == r.map { case (k, v) => k -> v._3 })

    // guards: multi-level codebooks refused; empty input → empty output
    val cb2 = graft.index.Codebook(Array(
      Array(Array(1f, 0f)), Array(Array(0f, 1f))))
    intercept[IllegalArgumentException] {
      Dedup.semDeDup(emb, cells, cb2, tau = 0.9)
    }
    val none = Dedup.semDeDup(emb.limit(0), cells, cb, tau = 0.9).collect()
    assert(none.isEmpty)
  }

  test("semdedup refinement: capped cell re-dedups under the sub-codebook, fail-open is closed") {
    // cell 0 is over-cap (5 members vs maxCell=3): a tight τ-pair
    // (v0 on-centroid, v1 near), a second τ-pair off-axis (v2, v3),
    // and a loner (v4). cell 1 stays under cap (2 members, one τ-pair).
    val cb = graft.index.Codebook(Array(Array(
      Array(1f, 0f), Array(0f, 1f))))
    val emb = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0.995f, 0.1f)),
      (2L, Array(0.9f, 0.435f)),
      (3L, Array(0.88f, 0.47f)),
      (4L, Array(0.8f, -0.6f)),
      (5L, Array(0f, 1f)),
      (6L, Array(0.1f, 0.995f))
    ).toDF("vec_id", "embedding")
    def assign(c: graft.index.Codebook) = graft.index.CodeAssigner.assign(
        emb.selectExpr("vec_id as doc_id", "embedding as vec"), c)
      .select(col("doc_id"), col("codes").getItem(0).as("cell"))
    val cells = assign(cb)
    // hand sub-codebook splitting cell 0's two pairs; the trainer
    // ignores the derived k (a hand artifact IS the trained artifact)
    val sub = graft.index.Codebook(Array(Array(
      Array(1f, 0f), Array(0.88f, 0.46f))))
    val trainer = (d: org.apache.spark.sql.DataFrame, _: Int) =>
      graft.search.IVFIndex.IVF(sub,
        graft.index.CodeAssigner.assign(d, sub)
          .select(col("doc_id"), col("codes").getItem(0).as("cell")))
    val r = Dedup.semDeDupRefined(emb, cells, cb, tau = 0.9,
        maxCell = 3, train = Some(trainer))
      .collect().map(row => row.getLong(0) ->
        (row.getInt(1), row.getBoolean(3), row.getBoolean(4))).toMap
    assert(r.size == 7)
    // under-cap cell 1 decided by the BASE pass
    assert(!r(5L)._3 && !r(6L)._3)
    assert(!r(5L)._2 && r(6L)._2, s"cell-1 base keep rule: $r")
    // over-cap cell 0 decided by the REFINED pass, and actually deduped
    assert(Seq(0L, 1L, 2L, 3L, 4L).forall(r(_)._3), s"refined flags: $r")
    assert(!r(0L)._2 && r(1L)._2, s"sub-cell A keep rule: $r")
    assert(!r(2L)._2 && r(3L)._2 || r(2L)._2 && !r(3L)._2,
      s"sub-cell B must drop exactly one of the pair: $r")
    assert(r(4L)._2, s"loner must survive refinement: $r")

    // degenerate sub-codebook (k=1): the one sub-cell is itself over
    // cap → second pass fails open too, visibly (all kept)
    val sub1 = graft.index.Codebook(Array(Array(Array(1f, 0f))))
    val t1 = (d: org.apache.spark.sql.DataFrame, _: Int) =>
      graft.search.IVFIndex.IVF(sub1,
        graft.index.CodeAssigner.assign(d, sub1)
          .select(col("doc_id"), col("codes").getItem(0).as("cell")))
    val r1 = Dedup.semDeDupRefined(emb, cells, cb, tau = 0.9,
        maxCell = 3, train = Some(t1))
      .collect().map(row => row.getLong(0) ->
        (row.getBoolean(3), row.getBoolean(4))).toMap
    assert(Seq(0L, 1L, 2L, 3L, 4L).forall(id => r1(id)._1 && r1(id)._2),
      s"over-cap sub-cell must fail open: $r1")

    // no over-cap cell → pure base pass, refined all false, verdicts
    // identical to plain semDeDup
    val rNone = Dedup.semDeDupRefined(emb, cells, cb, tau = 0.9,
        maxCell = 100, train = Some(trainer))
      .collect().map(row => row.getLong(0) ->
        (row.getBoolean(3), row.getBoolean(4))).toMap
    val base = Dedup.semDeDup(emb, cells, cb, tau = 0.9)
      .collect().map(row => row.getLong(0) -> row.getBoolean(3)).toMap
    assert(rNone.values.forall(!_._2))
    assert(rNone.map { case (k, v) => k -> v._1 } == base)
  }

  test("query spans are deterministic substrings of the query (P5)") {
    val qs = Seq("what is the capital of assyria", "spark structured streaming")
      .toDF("query")
    val spans = Augment.querySpans(qs, k = 3).collect()
    assert(spans.nonEmpty)
    spans.foreach { r =>
      assert(r.getString(0).contains(r.getString(1)))
    }
    val again = Augment.querySpans(qs, k = 3).collect()
    assert(spans.toSeq == again.toSeq)
  }

  test("doc windows cover windowSize tokens (P6)") {
    val w = Augment.docWindows(docs, windowSize = 16, maxW = 3)
    val sizes = w.select(size(split(col("window_text"), " ")).as("n"))
      .agg(min("n"), max("n")).head
    assert(sizes.getInt(1) <= 16)
    assert(sizes.getInt(0) >= 1)
  }

  test("subsample keeps ~90% and re-ids contiguously (P10)") {
    val m = Augment.subsampleMapping(docs, dropPct = 10)
    val n = m.count()
    assert(n > docs.count() * 0.8 && n < docs.count())
    val ids = m.select("new_id").orderBy("new_id").collect().map(_.getLong(0))
    assert(ids.toSeq == (0L until n).toSeq)
  }

  test("query-gen pool backfill reaches minPerDoc within rounds (A8)") {
    val initial = Seq((1L, "q1a"), (2L, "q2a"), (2L, "q2b"), (3L, "q3a"))
      .toDF("doc_id", "query")
    // deterministic generator: one new query per needing doc per round
    def gen(need: org.apache.spark.sql.DataFrame, round: Int) =
      need.select(col("doc_id"),
        concat(lit("gen"), col("doc_id"), lit("_r"), lit(round)).as("query"))
    val pool = QueryGenPool.backfill(initial, minPerDoc = 3, maxRounds = 5)(gen)
    val rows = pool.orderBy("doc_id").collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getInt(2) >= 3, r.toString))
    // existing queries retained
    assert(rows(1).getSeq[String](1).contains("q2a"))
  }

  test("corpus diff labels added/removed/changed; identical snapshots diff empty") {
    import spark.implicits._
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val cur = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val d = CorpusDiff.diff(prev, cur)
      .as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    assert(CorpusDiff.diff(prev, prev).count() == 0)
    // work-list is change-sized: unchanged ids never appear
    assert(!d.contains(2L))
  }

  test("multimodal decode: unknown containers get NULL metadata, never fabricated dims") {
    val rows = Multimodal.decode(Multimodal.asMedia(docs.limit(20))).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(!r.getBoolean(1)) // text bytes are no image → decoded = false
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) &&
        r.isNullAt(5) && r.isNullAt(6)) // no plausible-looking numbers
    }
    // recognizable containers still decode with real metadata
    val gen = org.apache.spark.sql.functions.udf(
      (id: Long) => Multimodal.syntheticImageBytes(id))
    val media = docs.limit(20).select(col("doc_id"),
      gen(col("doc_id")).as("payload"), lit("image/x").as("media_type"))
    Multimodal.decode(media).collect().foreach { r =>
      assert(r.getBoolean(1) && !r.isNullAt(2) && r.getInt(3) > 0)
    }
  }

  test("fakeFeatures (explicit test helper): fixed-dim and deterministic") {
    val rows = Multimodal.fakeFeatures(Multimodal.asMedia(docs.limit(20))).collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getSeq[Float](1).length == 16))
    val again = Multimodal.fakeFeatures(Multimodal.asMedia(docs.limit(20))).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("image header codec reads real PNG/JPEG/GIF bytes and rejects corrupt ones") {
    // round-trip the generator through the parser for each format family
    val png = Multimodal.syntheticImageBytes(6L) // 6%3=0 png, 6%4=2 → grey+alpha
    assert(ImageHeaders.parse(png).contains(
      ImageHeaders.Meta("png", (1 + 6 * 7 % 2000), (1 + 6 * 13 % 1500), 2, 8)))
    val jpg = Multimodal.syntheticImageBytes(4L) // 4%3=1 jpeg, even → 3 comp
    assert(ImageHeaders.parse(jpg).contains(
      ImageHeaders.Meta("jpeg", (1 + 4 * 7 % 2000), (1 + 4 * 13 % 1500), 3, 8)))
    val gif = Multimodal.syntheticImageBytes(5L) // 5%3=2 gif
    assert(ImageHeaders.parse(gif).contains(
      ImageHeaders.Meta("gif", (1 + 5 * 7 % 2000), (1 + 5 * 13 % 1500), 3, 8)))

    // a real-world PNG IHDR (not our generator): 1×1 grey, header bytes
    // from the published spec example layout
    val ihdrData = Array[Byte]('I', 'H', 'D', 'R',
      0, 0, 0, 1, 0, 0, 0, 1, 8, 0, 0, 0, 0)
    val crc = new java.util.zip.CRC32; crc.update(ihdrData)
    val real = java.nio.ByteBuffer.allocate(33)
      .put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      .putInt(13).put(ihdrData).putInt(crc.getValue.toInt).array()
    assert(ImageHeaders.parse(real).contains(ImageHeaders.Meta("png", 1, 1, 1, 8)))

    // corrupt PNG: flip one IHDR byte → CRC mismatch → None, not garbage
    val bad = png.clone(); bad(17) = (bad(17) ^ 0x40).toByte
    assert(ImageHeaders.parse(bad).isEmpty)
    // truncated payloads and wrong signatures
    assert(ImageHeaders.parse(png.take(20)).isEmpty)
    assert(ImageHeaders.parse(jpg.take(3)).isEmpty)
    assert(ImageHeaders.parse("not an image at all".getBytes).isEmpty)
    assert(ImageHeaders.parse(Array.empty[Byte]).isEmpty)
    // JPEG with SOS before any SOFn carries no frame header
    val headless = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xda.toByte, 0, 2)
    assert(ImageHeaders.parse(headless).isEmpty)
  }

  test("PNG pixel codec: encode/decode roundtrip across all filters and channel counts") {
    val rng = new scala.util.Random(41)
    for (ch <- Seq(1, 2, 3, 4); filter <- 0 to 4) {
      val (w, h) = (13, 7)
      val px = Array.fill(w * h * ch)(rng.nextInt(256).toByte)
      val bytes = PngCodec.encode(w, h, ch, px, _ => filter)
      val img = PngCodec.decode(bytes).getOrElse(
        fail(s"decode failed for ch=$ch filter=$filter"))
      assert(img.width == w && img.height == h && img.channels == ch)
      assert(img.pixels.toSeq == px.toSeq,
        s"pixel mismatch at ch=$ch filter=$filter")
      // the metadata parser agrees with the pixel decoder on the header
      val meta = ImageHeaders.parse(bytes).get
      assert((meta.width, meta.height, meta.channels) == (w, h, ch))
    }
    // per-row filter mix (the synthetic generator's shape)
    val px = Array.tabulate(16 * 8 * 3)(i => (i * 37 % 256).toByte)
    val mixed = PngCodec.encode(16, 8, 3, px, y => y % 5)
    assert(PngCodec.decode(mixed).get.pixels.toSeq == px.toSeq)

    // corrupt IDAT byte → chunk CRC mismatch → None, never garbage pixels
    val bad = mixed.clone()
    bad(mixed.length - 20) = (bad(mixed.length - 20) ^ 0x11).toByte
    assert(PngCodec.decode(bad).isEmpty)
    // truncated stream and non-PNG input
    assert(PngCodec.decode(mixed.take(40)).isEmpty)
    assert(PngCodec.decode("plain text".getBytes).isEmpty)
    // a bare 16-bit header (no IDAT, no IEND) is still refused — the
    // 16-bit PATH itself roundtrips in its own spec below
    val ihdrData = java.nio.ByteBuffer.allocate(17)
      .put("IHDR".getBytes).putInt(4).putInt(4)
      .put(16.toByte).put(0.toByte) // bitDepth 16, grey
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val crc = new java.util.zip.CRC32; crc.update(ihdrData)
    val deep = java.nio.ByteBuffer.allocate(33)
      .put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      .putInt(13).put(ihdrData).putInt(crc.getValue.toInt).array()
    assert(PngCodec.decodeEx(deep) == Left("truncated"))

    // the synthetic query generator roundtrips with the stated means
    val img6 = PngCodec.decode(Multimodal.syntheticPixelPng(6L)).get
    assert((img6.width, img6.height, img6.channels) == (7, 7, 1)) // 6%16+1, 6%8+1, 6%3=0→1ch
    val expected = (for (y <- 0 until 7; x <- 0 until 7)
      yield (x * 7 + y * 13 + 6 * 3) % 256).sum.toDouble / 49
    val sums = img6.pixels.map(_ & 0xff).sum.toDouble / 49
    assert(sums == expected)
  }

  test("PNG palette codec: PLTE roundtrip expands indices to RGB; corrupt palette refuses") {
    val rng = new scala.util.Random(47)
    for (entries <- Seq(2, 16, 256); filter <- 0 to 4) {
      val (w, h) = (9, 5)
      val palette = Array.fill(entries * 3)(rng.nextInt(256).toByte)
      val indices = Array.fill(w * h)(rng.nextInt(entries).toByte)
      val bytes = PngCodec.encodePalette(w, h, palette, indices, _ => filter)
      val img = PngCodec.decode(bytes).getOrElse(
        fail(s"palette decode failed entries=$entries filter=$filter"))
      assert((img.width, img.height, img.channels) == (w, h, 3))
      val expected = indices.flatMap { ib =>
        val i = ib & 0xff
        Seq(palette(i * 3), palette(i * 3 + 1), palette(i * 3 + 2))
      }
      assert(img.pixels.toSeq == expected.toSeq,
        s"rgb mismatch entries=$entries filter=$filter")
    }
    // index pointing past the palette: refuse, never read garbage colours
    val shortPal = Array.fill(2 * 3)(7.toByte)
    val oob = PngCodec.encodePalette(2, 2, shortPal, Array[Byte](0, 1, 3, 0))
    assert(PngCodec.decodeEx(oob) == Left("palette_oob"))
    // corrupt PLTE byte → chunk CRC mismatch
    val good = PngCodec.encodePalette(2, 2, shortPal, Array[Byte](0, 1, 1, 0))
    val bad = good.clone(); bad(45) = (bad(45) ^ 0x20).toByte
    assert(PngCodec.decode(bad).isEmpty)
    // the synthetic generator decodes to its stated palette arithmetic
    val img7 = PngCodec.decode(Multimodal.syntheticPalettePng(7L)).get
    assert((img7.width, img7.height, img7.channels) == (9, 2, 3)) // 2+7%9, 1+7%6, rgb
    val entries7 = 2 << (7 % 4) // 16
    for (y <- 0 until 2; x <- 0 until 9; c <- 0 until 3) {
      val idx = (x * 3 + y * 7 + 7) % entries7
      val want = (idx * 41 + c * 17 + 7 * 5) % 256
      assert((img7.pixels((y * 9 + x) * 3 + c) & 0xff) == want)
    }
  }

  test("decodeEx names every refusal; the skip fixtures hit their stated reasons") {
    assert(PngCodec.decodeEx("plain text".getBytes) == Left("not_png"))
    assert(PngCodec.decodeEx(Multimodal.syntheticSkipPng(8L)).isRight)  // plain
    assert(PngCodec.decodeEx(Multimodal.syntheticSkipPng(9L)).isRight)  // palette
    assert(PngCodec.decodeEx(Multimodal.syntheticSkipPng(10L)).isRight) // 16-bit
    assert(PngCodec.decodeEx(Multimodal.syntheticSkipPng(11L)).isRight) // Adam7
    assert(PngCodec.decodeEx(Multimodal.syntheticSkipPng(12L)) == Left("not_png"))
    assert(PngCodec.decodeEx(Multimodal.syntheticSkipPng(13L)) == Left("truncated"))
    assert(PngCodec.decodeEx(Multimodal.syntheticSkipPng(14L)) == Left("bad_crc"))
    assert(PngCodec.decodeEx(Multimodal.syntheticSkipPng(15L)) == Left("bit_depth"))
    // pixelDecodeStats: counted reasons match the fixture mix over a range
    val gen = org.apache.spark.sql.functions.udf(
      (id: Long) => Multimodal.syntheticSkipPng(id))
    val media = spark.range(0, 80).select(col("id").as("doc_id"),
      gen(col("id")).as("payload"), lit("image/mixed").as("media_type"))
    val counts = Multimodal.pixelDecodeStats(media).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("ok" -> 40L, "not_png" -> 10L,
      "truncated" -> 10L, "bad_crc" -> 10L, "bit_depth" -> 10L))
  }

  test("PNG Adam7 interlace: seven-pass storage decodes to the identical raster") {
    val rng = new scala.util.Random(59)
    // dims straddling the pass grid: singletons, sub-8, and >8 in both
    // axes (empty passes must contribute zero scanlines)
    for ((w, h) <- Seq((1, 1), (3, 2), (8, 8), (13, 7), (17, 10), (5, 9));
         ch <- Seq(1, 3, 4)) {
      val px = Array.fill(w * h * ch)(rng.nextInt(256).toByte)
      val bytes = PngCodec.encode(w, h, ch, px, y => y % 5, interlaced = true)
      val img = PngCodec.decode(bytes).getOrElse(
        fail(s"interlaced decode failed w=$w h=$h ch=$ch"))
      assert(img.pixels.toSeq == px.toSeq, s"raster mismatch w=$w h=$h ch=$ch")
    }
    // interlaced + palette compose
    val pal = Array.tabulate(8 * 3)(i => (i * 23 % 256).toByte)
    val idx = Array.fill(11 * 6)(rng.nextInt(8).toByte)
    val pBytes = PngCodec.encodePalette(11, 6, pal, idx, y => (y + 1) % 5,
      interlaced = true)
    val pImg = PngCodec.decode(pBytes).get
    assert(pImg.channels == 3)
    val expected = idx.flatMap { ib =>
      val i = ib & 0xff
      Seq(pal(i * 3), pal(i * 3 + 1), pal(i * 3 + 2))
    }
    assert(pImg.pixels.toSeq == expected.toSeq)
    // interlace method > 1 refuses by name
    val weird = PngCodec.encode(4, 4, 1, new Array[Byte](16))
    // patch IHDR interlace byte (offset 8+8+4+4+4+1+1+1+1 = 28) and re-CRC
    val patched = weird.clone()
    patched(28) = 2.toByte
    val crc = new java.util.zip.CRC32
    crc.update(patched, 12, 17)
    val cv = crc.getValue.toInt
    patched(29) = (cv >> 24).toByte; patched(30) = (cv >> 16).toByte
    patched(31) = (cv >> 8).toByte; patched(32) = cv.toByte
    assert(PngCodec.decodeEx(patched) == Left("bad_interlace"))
  }

  test("PNG 16-bit: big-endian samples reduce to high bytes (strip-16)") {
    val rng = new scala.util.Random(61)
    for (ch <- Seq(1, 3, 4); interlaced <- Seq(false, true)) {
      val (w, h) = (9, 6)
      val samples = Array.fill(w * h * ch)(rng.nextInt(65536))
      val bytes = PngCodec.encode16(w, h, ch, samples, y => y % 5, interlaced)
      val img = PngCodec.decode(bytes).getOrElse(
        fail(s"16-bit decode failed ch=$ch interlaced=$interlaced"))
      assert((img.width, img.height, img.channels) == (w, h, ch))
      assert(img.pixels.toSeq == samples.map(v => (v >> 8).toByte).toSeq,
        s"strip-16 mismatch ch=$ch interlaced=$interlaced")
    }
    // the synthetic generator decodes to its stated high-byte arithmetic
    val img5 = PngCodec.decode(Multimodal.syntheticPng16(5L)).get
    assert((img5.width, img5.height, img5.channels) == (6, 1, 4)) // 1+5%8, 1+5%5, 5%3=2→4
    for (x <- 0 until 6; c <- 0 until 4) {
      val v = (x * 131 + c * 89 + 5 * 7) % 65536
      assert((img5.pixels(x * 4 + c) & 0xff) == v / 256)
    }
  }

  test("WAV codec: encode/decode roundtrip across bit depths and channel layouts") {
    val rng = new scala.util.Random(43)
    for (ch <- Seq(1, 2); bits <- Seq(8, 16)) {
      val lim = if (bits == 8) 128 else 32768
      val samples = Array.fill(37 * ch)(rng.nextInt(2 * lim) - lim)
      val bytes = WavCodec.encode(22050, ch, bits, samples)
      val audio = WavCodec.decode(bytes).getOrElse(
        fail(s"decode failed for ch=$ch bits=$bits"))
      assert(audio.sampleRate == 22050 && audio.channels == ch &&
        audio.bitsPerSample == bits && audio.frames == 37)
      assert(audio.samples.toSeq == samples.toSeq,
        s"sample mismatch at ch=$ch bits=$bits")
    }

    // unknown chunks before data are skipped like any RIFF reader's,
    // including the odd-length word-alignment pad
    val samples = Array(100, -200, 300)
    val plain = WavCodec.encode(8000, 1, 16, samples)
    val fmtAndRest = plain.drop(12)
    val listChunk = java.nio.ByteBuffer.allocate(8 + 5 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes).putInt(5)
      .put(Array[Byte](1, 2, 3, 4, 5)).put(0.toByte).array()
    val withList = java.nio.ByteBuffer
      .allocate(12 + listChunk.length + fmtAndRest.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(4 + listChunk.length + fmtAndRest.length)
      .put("WAVE".getBytes).put(listChunk).put(fmtAndRest).array()
    assert(WavCodec.decode(withList).get.samples.toSeq == samples.toSeq)

    // rejections: never garbage samples
    assert(WavCodec.decode("RIFFxxxxAVI ".getBytes).isEmpty) // not WAVE
    assert(WavCodec.decode(plain.take(30)).isEmpty)          // truncated chunk
    assert(WavCodec.decode(Array.empty[Byte]).isEmpty)
    val nonPcm = plain.clone(); nonPcm(20) = 3 // format code 3 = IEEE float
    assert(WavCodec.decode(nonPcm).isEmpty)
    val deep = plain.clone(); deep(34) = 24 // 24-bit: out of scope
    assert(WavCodec.decode(deep).isEmpty)
    // stereo data chunk with a dangling half-frame: refuse
    val stereo = WavCodec.encode(8000, 2, 16, Array(1, 2, 3, 4))
    val partial = stereo.dropRight(2)
    val fixed = java.nio.ByteBuffer.wrap(partial)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fixed.putInt(4, partial.length - 8)  // RIFF size
    fixed.putInt(40, 6)                  // data size = 1.5 frames
    assert(WavCodec.decode(fixed.array()).isEmpty)
  }

  test("decodeAudio computes waveform stats over decoded samples") {
    import spark.implicits._
    // stereo 16-bit: L = +10,−10,+10,−10 (3 sign flips), R = 5,6,7,8 (0)
    val wav = WavCodec.encode(16000, 2, 16,
      Array(10, 5, -10, 6, 10, 7, -10, 8))
    val media = Seq((1L, wav), (2L, "not audio".getBytes))
      .toDF("doc_id", "payload")
    val rows = Multimodal.decodeAudio(media).collect()
    assert(rows.length == 1) // non-WAV payload drops
    val r = rows.head
    assert((r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
      r.getInt(4)) == ((1L, 16000, 2, 16, 4)))
    assert(r.getSeq[Double](5) == Seq(0.0, 6.5))
    assert(r.getSeq[Long](6) == Seq(10L, 8L))
    assert(r.getSeq[Long](7) == Seq(3L, 0L))

    // the synthetic query generator roundtrips with the stated formula
    val audio7 = WavCodec.decode(Multimodal.syntheticWav(7L)).get
    assert((audio7.sampleRate, audio7.channels, audio7.bitsPerSample,
      audio7.frames) == ((20000, 2, 16, 47)))
    for (i <- 0 until 47; c <- 0 until 2)
      assert(audio7.samples(i * 2 + c) ==
        (i * 131 + c * 37 + 7 * 11) % 16001 - 8000)
    val audio6 = WavCodec.decode(Multimodal.syntheticWav(6L)).get // 8-bit mono
    assert((audio6.channels, audio6.bitsPerSample) == ((1, 8)))
    for (i <- 0 until audio6.frames)
      assert(audio6.samples(i) == (i * 17 + 6 * 13) % 241 - 120)
  }

  test("GIF LZW codec: roundtrip with dictionary growth, resets, and KwKwK runs") {
    val rng = new scala.util.Random(47)
    // long random stream over 16 symbols: the dictionary grows through
    // every code width and past 4096 (clear-code reset exercised)
    val big = Array.fill(30000)((rng.nextInt(16)).toByte)
    assert(GifCodec.lzwDecode(4, GifCodec.lzwEncode(4, big), big.length)
      .get.toSeq == big.toSeq)
    // single-symbol run: the classic KwKwK self-reference stream
    val run = Array.fill(500)(1.toByte)
    assert(GifCodec.lzwDecode(2, GifCodec.lzwEncode(2, run), run.length)
      .get.toSeq == run.toSeq)
    // repetitive text-like data (dense dictionary hits)
    val rep = Array.tabulate(5000)(i => ((i % 7) ^ (i / 11 % 3)).toByte)
    assert(GifCodec.lzwDecode(3, GifCodec.lzwEncode(3, rep), rep.length)
      .get.toSeq == rep.toSeq)
    // tiny edge cases
    assert(GifCodec.lzwDecode(2, GifCodec.lzwEncode(2, Array[Byte](3)), 1)
      .get.toSeq == Seq(3.toByte))
    assert(GifCodec.lzwDecode(2, GifCodec.lzwEncode(2, Array.empty[Byte]), 0)
      .get.isEmpty)
    // corrupt stream: a code pointing past the table refuses
    assert(GifCodec.lzwDecode(2, Array[Byte](0xFF.toByte, 0xFF.toByte), 10).isEmpty)
  }

  test("GIF container: animated encode/decode roundtrip and strict rejections") {
    val palette = Array.tabulate(4 * 3)(i => (i * 19 % 256).toByte)
    val f0 = Array.tabulate(6 * 4)(i => (i % 4).toByte)
    val f1 = Array.tabulate(6 * 4)(i => ((i + 1) % 4).toByte)
    val bytes = GifCodec.encode(6, 4, palette, Seq((10, f0), (25, f1)))
    val gif = GifCodec.decode(bytes).getOrElse(fail("decode failed"))
    assert(gif.width == 6 && gif.height == 4)
    assert(gif.palette.toSeq == palette.toSeq)
    assert(gif.frames.map(_.delayCs) == Seq(10, 25))
    assert(gif.frames(0).indices.toSeq == f0.toSeq)
    assert(gif.frames(1).indices.toSeq == f1.toSeq)
    // the header parser agrees on the screen descriptor
    assert(ImageHeaders.parse(bytes).contains(
      ImageHeaders.Meta("gif", 6, 4, 3, 8)))

    // rejections: never garbage frames
    assert(GifCodec.decodeEx(bytes.take(20)) == Left("truncated")) // mid-palette
    assert(GifCodec.decodeEx(bytes.dropRight(2)) == Left("truncated")) // no trailer
    assert(GifCodec.decodeEx("GIF89a but not really".getBytes).isLeft)
    assert(GifCodec.decodeEx(Array.empty[Byte]) == Left("not_gif"))
  }

  test("GIF LCT + interlace: per-frame palettes override, four-pass rows de-interleave") {
    val global = Array.tabulate(4 * 3)(i => (i * 19 % 256).toByte)
    val lct = Array.tabulate(8 * 3)(i => (i * 37 % 256).toByte)
    val rng = new scala.util.Random(53)
    val (w, h) = (7, 11) // odd height exercises every interlace pass
    val plain = Array.fill(w * h)(rng.nextInt(4).toByte)
    val withLct = Array.fill(w * h)(rng.nextInt(8).toByte)
    val inter = Array.tabulate(w * h)(i => ((i / w) % 4).toByte) // row-coded
    val bytes = GifCodec.encodeEx(w, h, global, Seq(
      GifCodec.FrameSpec(5, plain),
      GifCodec.FrameSpec(6, withLct, localPalette = Some(lct)),
      GifCodec.FrameSpec(7, inter, interlaced = true),
      GifCodec.FrameSpec(8, withLct, localPalette = Some(lct),
        interlaced = true)))
    val gif = GifCodec.decode(bytes).getOrElse(fail("decode failed"))
    assert(gif.frames.map(_.delayCs) == Seq(5, 6, 7, 8))
    // frame 0: global palette, plain rows
    assert(gif.frames(0).indices.toSeq == plain.toSeq)
    assert(gif.frames(0).palette.toSeq == global.toSeq)
    // frame 1: the LCT overrides (8 entries — indices 4..7 are legal
    // here and would be palette_oob against the 4-entry global table)
    assert(gif.frames(1).indices.toSeq == withLct.toSeq)
    assert(gif.frames(1).palette.toSeq == lct.toSeq)
    // frame 2: stored in four-pass order, decoded back to raster order —
    // the row-coded pattern makes any row-order slip visible
    assert(gif.frames(2).indices.toSeq == inter.toSeq)
    // frame 3: both at once
    assert(gif.frames(3).indices.toSeq == withLct.toSeq)
    assert(gif.frames(3).palette.toSeq == lct.toSeq)
    // interlaceRowOrder is the published GIF89a §20 pass structure
    assert(GifCodec.interlaceRowOrder(11).toSeq ==
      Seq(0, 8, 4, 2, 6, 10, 1, 3, 5, 7, 9))
    // an index past the effective table still refuses: hand-assemble a
    // stream whose LZW min-code-size (3) exceeds the 4-entry palette —
    // the one layout where a well-formed LZW stream can carry an index
    // the palette cannot map
    val oob = new java.io.ByteArrayOutputStream()
    oob.write("GIF89a".getBytes)
    oob.write(Array[Byte](2, 0, 1, 0)) // 2×1 canvas
    oob.write(0x80 | 0x70 | 1) // GCT, 4 entries
    oob.write(0); oob.write(0)
    oob.write(Array.tabulate(4 * 3)(i => (i * 11).toByte)) // GCT
    oob.write(0x2c) // descriptor: full canvas, no LCT
    oob.write(Array[Byte](0, 0, 0, 0, 2, 0, 1, 0, 0))
    oob.write(3) // minCodeSize 3: literals 0..7 against a 4-entry palette
    val lzwOob = GifCodec.lzwEncode(3, Array[Byte](0, 5)) // index 5 → oob
    oob.write(lzwOob.length); oob.write(lzwOob); oob.write(0)
    oob.write(0x3b)
    assert(GifCodec.decodeEx(oob.toByteArray) == Left("palette_oob"))
  }

  test("GIF skip fixtures hit their stated reasons; gifDecodeStats counts them") {
    assert(GifCodec.decodeEx(Multimodal.syntheticSkipGif(6L)).isRight)  // plain
    assert(GifCodec.decodeEx(Multimodal.syntheticSkipGif(7L)).isRight)  // ext
    assert(GifCodec.decodeEx(Multimodal.syntheticSkipGif(8L)).isRight)  // ext
    assert(GifCodec.decodeEx(Multimodal.syntheticSkipGif(9L)) == Left("not_gif"))
    assert(GifCodec.decodeEx(Multimodal.syntheticSkipGif(10L)) == Left("truncated"))
    assert(GifCodec.decodeEx(Multimodal.syntheticSkipGif(11L)) == Left("bad_lzw"))
    val gen = org.apache.spark.sql.functions.udf(
      (id: Long) => Multimodal.syntheticSkipGif(id))
    val media = spark.range(0, 60).select(col("id").as("doc_id"),
      gen(col("id")).as("payload"), lit("image/mixed").as("media_type"))
    val counts = Multimodal.gifDecodeStats(media).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("ok" -> 30L, "not_gif" -> 10L,
      "truncated" -> 10L, "bad_lzw" -> 10L))
  }

  test("decodeGifFrames maps palette-indexed frames to per-frame RGB means") {
    import spark.implicits._
    // 2×1 frame, palette: color0=(0,100,200), color1=(50,150,250);
    // indices [0,1] → means (25, 125, 225)
    val palette = Array[Byte](0, 100, (200 & 0xff).toByte,
      50, (150 & 0xff).toByte, (250 & 0xff).toByte)
    val gif = GifCodec.encode(2, 1, palette,
      Seq((7, Array[Byte](0, 1))))
    val media = Seq((1L, gif), (2L, "not a gif".getBytes))
      .toDF("doc_id", "payload")
    val rows = Multimodal.decodeGifFrames(media).collect()
    assert(rows.length == 1) // non-GIF payload drops
    val r = rows.head
    assert((r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
      r.getInt(4)) == ((1L, 0, 2, 1, 7)))
    assert(r.getSeq[Double](5) == Seq(25.0, 125.0, 225.0))

    // the synthetic query generator roundtrips with the stated formulas
    val g7 = GifCodec.decode(Multimodal.syntheticGif(7L)).get
    assert((g7.width, g7.height, g7.frames.length) == ((4, 4, 4))) // 3+7%6, 2+7%5, 1+7%4
    for ((f, fi) <- g7.frames.zipWithIndex) {
      assert(f.delayCs == 5 + fi * 3 + 7 % 7)
      for (y <- 0 until 4; x <- 0 until 4)
        assert((f.indices(y * 4 + x) & 0xff) == (x * 3 + y * 5 + fi * 7 + 7) % 4)
    }
    for (j <- 0 until 4)
      assert((g7.palette(j * 3) & 0xff) == (j * 53 + 7 * 7) % 256)
  }

  test("resizeStats samples nearest-neighbor over decoded pixels") {
    import spark.implicits._
    // 2×2 grey image upscaled to 8×8: each source pixel repeats 16× —
    // the thumbnail mean equals the plain 4-pixel mean
    val quad = PngCodec.encode(2, 2, 1,
      Array[Byte](10, 20, 30, 40), _ => 4) // Paeth rows, why not
    // 16×1 image to 8×8: ⌊x'·16/8⌋ samples the even columns only
    val wide = PngCodec.encode(16, 1, 1,
      Array.tabulate(16)(i => (i * 10).toByte), _ => 1)
    val media = Seq((1L, quad), (2L, wide), (3L, "not a png".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.resizeStats(media, tw = 8, th = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getSeq[Double](4).head)).toMap
    assert(out.keySet == Set(1L, 2L)) // undecodable payload drops
    assert(out(1L) == ((2, 2, 25.0)))
    assert(out(2L) == ((16, 1, (0 until 16 by 2).map(_ * 10).sum / 8.0)))
  }
}
