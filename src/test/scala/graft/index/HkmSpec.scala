package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HkmSpec extends SparkSpec {
  import spark.implicits._

  test("assignment is the per-node argmin walk (local replica check)") {
    val rng = new scala.util.Random(31)
    val df = (0 until 300).map(i =>
      (i.toLong, Array.fill(6)(rng.nextGaussian().toFloat)))
      .toDF("doc_id", "vec").cache()
    val tree = HierarchicalKMeans.fit(df, "vec", k = 3, depth = 2,
      seed = 42L, maxIter = 10)
    val got = HierarchicalKMeans.assign(df, tree)
      .as[(Long, Seq[Int])].collect().toMap
    val data = df.as[(Long, Array[Float])].collect()
    data.foreach { case (id, v) =>
      assert(got(id) == tree.assign(v), s"doc $id")
      assert(got(id).nonEmpty && got(id).length <= 2)
      assert(got(id).forall(c => c >= 0 && c < 3))
    }
    // sibling subtrees genuinely differ (a trie, not a K-ary product):
    // two level-1 nodes with different centroid sets
    val kids = tree.root.children.flatten
    assert(kids.length >= 2)
    assert(!java.util.Arrays.deepEquals(
      kids(0).cents.asInstanceOf[Array[AnyRef]],
      kids(1).cents.asInstanceOf[Array[AnyRef]]))
  }

  test("driver-tree fit fails fast above the driver byte budget, pointing at fitLevels") {
    val rng = new scala.util.Random(7)
    val df = (0 until 400).map(i =>
      (i.toLong, Array.fill(6)(rng.nextGaussian().toFloat)))
      .toDF("doc_id", "vec").cache()
    // k=4 level-1 width up to 4 nodes × 4 × 6 floats × 4B = 384 bytes —
    // a 64-byte budget must trip BEFORE any centroid collect, with the
    // remediation in the message (the K=32/depth-4/768-d reference
    // geometry is ~3 GB against the 256 MB default, same trip path)
    val e = intercept[IllegalArgumentException] {
      HierarchicalKMeans.fit(df, "vec", k = 4, depth = 2,
        seed = 42L, maxIter = 5, driverBudgetBytes = 64L)
    }
    assert(e.getMessage.contains("fitLevels"), e.getMessage)
    assert(e.getMessage.contains("budget"), e.getMessage)
    // the default budget comfortably admits the bounded fixture geometry
    val tree = HierarchicalKMeans.fit(df, "vec", k = 4, depth = 2,
      seed = 42L, maxIter = 5)
    assert(tree.root.cents.length == 4)
    // the reference fan-out's projected leaf level (32^3 nodes × 32 ×
    // 768-d) exceeds the default 256 MB budget — the arithmetic the
    // guard runs, pinned here so nobody "fixes" the default upward past
    // the geometry it exists to catch
    val refBytes = math.pow(32, 3).toLong * 32L * 768L * 4L
    assert(refBytes > (256L << 20))
  }

  test("empty input reaches the graceful empty-corpus path, not the budget probe") {
    // the r8 budget guard ran head() on the input to learn dim — which
    // threw NoSuchElementException on an empty frame BEFORE fit's own
    // "empty corpus" require could fire (round-8 advice)
    val empty = Seq.empty[(Long, Array[Float])].toDF("doc_id", "vec")
    val e = intercept[IllegalArgumentException] {
      HierarchicalKMeans.fit(empty, "vec", k = 2, depth = 2)
    }
    assert(e.getMessage.contains("empty corpus"), e.getMessage)
    // a null first vector must not NPE the dim probe either
    val nullVec = Seq((1L, Option.empty[Array[Float]]))
      .toDF("doc_id", "vec")
    val e2 = intercept[IllegalArgumentException] {
      HierarchicalKMeans.fit(nullVec, "vec", k = 2, depth = 2)
    }
    assert(e2.getMessage.contains("empty corpus"), e2.getMessage)
  }

  test("undersized clusters become leaves (variable-depth paths)") {
    val rng = new scala.util.Random(7)
    // 3 points far out at (+50, ...) — below the 2k=6 split threshold —
    // plus 300 points near the origin
    val far = (0 until 3).map(i =>
      (1000L + i, Array(50f + i, 50f, 0f, 0f)))
    val near = (0 until 300).map(i =>
      (i.toLong, Array.fill(4)(rng.nextGaussian().toFloat)))
    val df = (far ++ near).toDF("doc_id", "vec").cache()
    val tree = HierarchicalKMeans.fit(df, "vec", k = 3, depth = 2,
      seed = 42L, maxIter = 10)
    val paths = HierarchicalKMeans.assign(df, tree)
      .as[(Long, Seq[Int])].collect().toMap
    val farLens = far.map { case (id, _) => paths(id).length }.toSet
    assert(farLens == Set(1), s"far cluster should be a leaf: $farLens")
    assert(near.exists { case (id, _) => paths(id).length == 2 },
      "dense region should split to depth 2")
  }

  test("full-width beam contains the greedy assignment path; scores sorted") {
    val rng = new scala.util.Random(17)
    val data = (0 until 250).map(i =>
      (i.toLong, Array.fill(5)(rng.nextGaussian().toFloat)))
    val df = data.toDF("doc_id", "vec").cache()
    val tree = HierarchicalKMeans.fit(df, "vec", k = 3, depth = 2,
      seed = 42L, maxIter = 10)
    data.take(25).foreach { case (_, v) =>
      val beams = tree.k * tree.k // full width at depth 2
      val out = HierarchicalKMeans.beamSearch(tree, v, beams)
      assert(out.map(_._2).sliding(2).forall(s =>
        s.length < 2 || s.head >= s(1)), "scores must be non-increasing")
      assert(out.map(_._1).contains(tree.assign(v)),
        "greedy path must appear in the full-width beam")
      // every path is a valid trie walk
      out.map(_._1).foreach { p =>
        var n: Option[HierarchicalKMeans.Node] = Some(tree.root)
        p.foreach { c =>
          assert(n.isDefined && c >= 0 && c < tree.k)
          n = n.get.children(c)
        }
      }
    }
  }

  test("beam keeps at most `beams` paths and is deterministic") {
    val rng = new scala.util.Random(23)
    val df = (0 until 200).map(i =>
      (i.toLong, Array.fill(4)(rng.nextGaussian().toFloat)))
      .toDF("doc_id", "vec").cache()
    val tree = HierarchicalKMeans.fit(df, "vec", k = 4, depth = 2,
      seed = 9L, maxIter = 10)
    val q = df.limit(6)
      .select(col("doc_id").as("query_id"), col("vec").as("qvec"))
    val a = HierarchicalKMeans.beamSearchDf(q, tree, beams = 3).collect()
    assert(a.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    val b = HierarchicalKMeans.beamSearchDf(q.repartition(5), tree, beams = 3)
      .collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }

  test("bounded node sampling stays partitioning-independent") {
    val rng = new scala.util.Random(41)
    val df = (0 until 600).map(i =>
      (i.toLong, Array.fill(4)(rng.nextGaussian().toFloat)))
      .toDF("doc_id", "vec")
    // sampleCap far below the root size: the fit must pick the SAME
    // lowest-scrambled-rank sample regardless of how rows are partitioned
    val a = HierarchicalKMeans.fit(df, "vec", k = 3, depth = 2,
      seed = 8L, maxIter = 8, sampleCap = 64)
    val b = HierarchicalKMeans.fit(df.repartition(17), "vec", k = 3,
      depth = 2, seed = 8L, maxIter = 8, sampleCap = 64)
    def flat(t: HierarchicalKMeans.Tree): Seq[(String, Seq[Float])] =
      t.nodesByPrefix.map { case (p, n) =>
        (p, n.cents.flatten.toSeq)
      }
    assert(flat(a) == flat(b),
      "trees diverged across partitionings under bounded sampling")
  }

  test("fitLevels/assignByLevels == fit/assign (distributed path parity)") {
    val rng = new scala.util.Random(19)
    // includes the variable-depth case: a far 3-point clump stays a leaf
    val far = (0 until 3).map(i => (1000L + i, Array(50f + i, 50f, 0f, 0f)))
    val near = (0 until 400).map(i =>
      (i.toLong, Array.fill(4)(rng.nextGaussian().toFloat)))
    val df = (far ++ near).toDF("doc_id", "vec").cache()
    val tree = HierarchicalKMeans.fit(df, "vec", k = 3, depth = 3,
      seed = 42L, maxIter = 10)
    val levels = HierarchicalKMeans.fitLevels(df, "vec", k = 3, depth = 3,
      seed = 42L, maxIter = 10)
    // identical codebooks node for node...
    val fromTree = tree.nodesByPrefix
      .map { case (p, n) => (p, n.cents.flatten.toSeq) }.toMap
    val fromLevels = levels.select("prefix", "cents")
      .as[(String, Seq[Seq[Float]])].collect()
      .map { case (p, c) => (p, c.flatten) }.toMap
    assert(fromLevels == fromTree, "trained codebooks diverged")
    // ...and identical assignments doc for doc (incl. short leaf paths)
    val a = HierarchicalKMeans.assign(df, tree)
      .as[(Long, Seq[Int])].collect().toMap
    val b = HierarchicalKMeans.assignByLevels(df, levels, depth = 3)
      .as[(Long, Seq[Int])].collect().toMap
    assert(a == b, "assignment paths diverged between tree and join descent")
  }

  test("assignment is partitioning-independent given a trained tree") {
    val rng = new scala.util.Random(3)
    val df = (0 until 200).map(i =>
      (i.toLong, Array.fill(4)(rng.nextGaussian().toFloat)))
      .toDF("doc_id", "vec").cache()
    val tree = HierarchicalKMeans.fit(df, "vec", k = 2, depth = 3,
      seed = 5L, maxIter = 5)
    val a = HierarchicalKMeans.assign(df, tree).collect().toSet
    val b = HierarchicalKMeans.assign(df.repartition(13), tree).collect().toSet
    assert(a == b)
  }
}
