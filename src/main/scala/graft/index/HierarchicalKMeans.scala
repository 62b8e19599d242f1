package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchical k-means document ids — the reference's NON-RQ id scheme
  * (the NCI-style semantic ids its trie-constrained decoding walks:
  * SURVEY §1.1 "for the non-RQ (hierarchical-KMeans id) variant, a
  * broadcast trie"). Where RQ quantizes full-width RESIDUALS against one
  * codebook per level, HKM descends a TREE: the root KMeans partitions
  * the corpus, then each cluster trains its OWN child KMeans on its
  * members, recursively — sibling subtrees have different centroids, so
  * the id space is a genuine trie, not a complete K-ary product.
  *
  * Nodes with fewer than `2·k` members stop splitting (a k-means over
  * fewer points than centroids is degenerate), so paths are
  * variable-length — exactly the tree shape the reference's trie mask
  * exists for (generation_utils.py:801-819).
  *
  * Scale: depth-d training runs Σ K^i ≤ K^d MLlib fits, each over a
  * partition-pruned subset (the driver recursion holds only centroids —
  * K^d × dim floats, codebook-sized); assignment is one broadcast-tree
  * UDF pass, zero shuffle.
  */
object HierarchicalKMeans {

  /** A trie node: K centroids + per-code child (None = leaf below). */
  case class Node(cents: Array[Array[Float]],
      children: Array[Option[Node]]) extends Serializable

  case class Tree(root: Node, k: Int, depth: Int) extends Serializable {
    /** Walk: per level argmin-L2 over THIS node's centroids (double fold,
      * ties → lowest code), descend that child; stop at leaves. */
    def assign(vec: Array[Float]): Seq[Int] = {
      val path = scala.collection.mutable.ArrayBuffer.empty[Int]
      var node: Option[Node] = Some(root)
      while (node.isDefined) {
        val n = node.get
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < n.cents.length) {
          val cent = n.cents(c)
          var d = 0.0
          var j = 0
          while (j < vec.length) {
            val diff = vec(j).toDouble - cent(j).toDouble
            d += diff * diff
            j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        path += best
        node = n.children(best)
      }
      path.toSeq
    }

    /** (path-prefix string → node) pairs in DFS order — the oracle
      * generator's walk. Root prefix is "". */
    def nodesByPrefix: Seq[(String, Node)] = {
      def walk(prefix: String, n: Node): Seq[(String, Node)] =
        (prefix, n) +: n.children.zipWithIndex.flatMap {
          case (Some(ch), c) =>
            walk(if (prefix.isEmpty) c.toString else s"$prefix,$c", ch)
          case (None, _) => Seq.empty
        }.toSeq
      walk("", root)
    }
  }

  /** Train the tree. Each node's KMeans seed derives from its DFS index
    * (deterministic, partitioning-independent). `docs`: (doc_id, vecCol).
    */
  def fit(docs: DataFrame, vecCol: String, k: Int, depth: Int,
      seed: Long = 42L, maxIter: Int = 20): Tree = {
    require(k >= 2 && depth >= 1)
    var nodeCounter = 0L

    def fitNode(subset: DataFrame, level: Int): Node = {
      val nodeSeed = seed + 1000L * nodeCounter
      nodeCounter += 1
      val cb = RQTrainer.fit(subset, vecCol, numLevels = 1, k = k,
        seed = nodeSeed, maxIter = maxIter)
      val cents = cb.levels(0)
      val children: Array[Option[Node]] =
        if (level + 1 >= depth) Array.fill(k)(None)
        else {
          val assigned = CodeAssigner.assign(subset
            .select(col("doc_id"), col(vecCol)), cb, vecCol = vecCol)
            .select(col("doc_id"), col("codes").getItem(0).as("c"))
          val withC = subset.join(assigned, Seq("doc_id")).persist()
          withC.count()
          val out = (0 until k).map { c =>
            val members = withC.where(col("c") === c)
              .select(col("doc_id"), col(vecCol))
            // degenerate split guard: fewer than 2k members → leaf
            if (members.count() < 2L * k) None
            else Some(fitNode(members, level + 1))
          }.toArray
          withC.unpersist()
          out
        }
      Node(cents, children)
    }

    Tree(fitNode(docs.select(col("doc_id"), col(vecCol)), 0), k, depth)
  }

  /** (idCol, path ARRAY<INT>) with a broadcast tree — zero shuffle. */
  def assign(docs: DataFrame, tree: Tree, idCol: String = "doc_id",
      vecCol: String = "vec"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(tree)
    val assignUdf = udf { (vec: Array[Float]) => bc.value.assign(vec) }
    docs.select(col(idCol), assignUdf(col(vecCol)).as("path"))
  }

  /** Beam search over the trie — the generation-side analog of the
    * reference's trie-constrained decoding (generation_utils.py:709-1011)
    * with the engine's V6 substitution semantics: per node, scores are
    * the log-softmax of −‖q − child‖² over THAT node's children
    * (CodebookBeamSearch's "prod" mode), accumulated along the path; the
    * trie mask is structural (only existing children expand; a beam on a
    * leaf carries unchanged and competes on its shorter-path score).
    * Ties → lexicographically smallest path. All folds run in code order
    * (raws, max, Σexp) so the oracle replays them bit-exactly.
    */
  def beamSearch(tree: Tree, qvec: Array[Float], beams: Int)
      : Seq[(Seq[Int], Double)] = {
    require(beams >= 1)
    import scala.math.Ordering.Implicits.seqOrdering
    var frontier: Seq[(Seq[Int], Option[Node], Double)] =
      Seq((Seq.empty, Some(tree.root), 0.0))
    while (frontier.exists(_._2.isDefined)) {
      val expanded = frontier.flatMap {
        case (path, Some(n), cum) =>
          val raws = n.cents.map { cent =>
            var d = 0.0
            var j = 0
            while (j < qvec.length) {
              val diff = qvec(j).toDouble - cent(j).toDouble
              d += diff * diff
              j += 1
            }
            -d
          }
          val mx = raws.max
          var sumExp = 0.0
          raws.foreach(r => sumExp += math.exp(r - mx)) // code order
          val logz = mx + math.log(sumExp)
          raws.zipWithIndex.map { case (r, c) =>
            (path :+ c, n.children(c), cum + r - logz)
          }.toSeq
        case leaf => Seq(leaf)
      }
      frontier = expanded
        .sortBy { case (p, _, cum) => (-cum, p) }
        .take(beams)
    }
    frontier.map { case (p, _, cum) => (p, cum) }
  }

  /** (query_id, rank, path ARRAY<INT>, score) — top-`beams` trie paths
    * per query vector, broadcast tree, zero shuffle. */
  def beamSearchDf(queries: DataFrame, tree: Tree, beams: Int,
      qidCol: String = "query_id", qvecCol: String = "qvec"): DataFrame = {
    val bc = queries.sparkSession.sparkContext.broadcast(tree)
    val beamUdf = udf { (qvec: Array[Float]) =>
      beamSearch(bc.value, qvec, beams)
    }
    queries
      .select(col(qidCol), posexplode(beamUdf(col(qvecCol)))
        .as(Seq("pos", "b")))
      .select(col(qidCol), (col("pos") + 1).cast("long").as("rank"),
        col("b._1").as("path"), col("b._2").as("score"))
  }
}
