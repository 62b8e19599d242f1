package graft.index

/** Codebook alignment across re-clusterings (V11, MEVI/pq.py:600-611):
  * match new centroids to old ones so code ids stay stable when the
  * codebook is refreshed. The reference uses `linear_sum_assignment`; at
  * K ≤ 32 a driver-local exact-greedy assignment on the K×K cost matrix is
  * equivalent in practice and dependency-free (SURVEY §2.8 V11 note).
  */
object CodebookAligner {

  /** Returns perm where perm(newCode) = oldCode, minimizing Σ ‖c_new −
    * c_old‖² greedily (global-min pick per step — deterministic).
    */
  def align(oldLevel: Array[Array[Float]], newLevel: Array[Array[Float]]): Array[Int] = {
    val k = oldLevel.length
    require(newLevel.length == k)
    val cost = Array.tabulate(k, k) { (n, o) =>
      var s = 0.0
      var j = 0
      val a = newLevel(n); val b = oldLevel(o)
      while (j < a.length) {
        val d = a(j).toDouble - b(j).toDouble
        s += d * d
        j += 1
      }
      s
    }
    val perm = Array.fill(k)(-1)
    val usedOld = Array.fill(k)(false)
    val usedNew = Array.fill(k)(false)
    var step = 0
    while (step < k) {
      var bn = -1; var bo = -1; var best = Double.MaxValue
      var n = 0
      while (n < k) {
        if (!usedNew(n)) {
          var o = 0
          while (o < k) {
            if (!usedOld(o) && cost(n)(o) < best) { best = cost(n)(o); bn = n; bo = o }
            o += 1
          }
        }
        n += 1
      }
      perm(bn) = bo
      usedNew(bn) = true
      usedOld(bo) = true
      step += 1
    }
    perm
  }

  /** Re-label a refreshed codebook so its code ids align with `old`. */
  def alignCodebook(old: Codebook, fresh: Codebook): Codebook = {
    val levels = old.levels.indices.map { m =>
      val perm = align(old.levels(m), fresh.levels(m))
      val out = new Array[Array[Float]](perm.length)
      perm.indices.foreach(n => out(perm(n)) = fresh.levels(m)(n))
      out
    }.toArray
    Codebook(levels)
  }
}
