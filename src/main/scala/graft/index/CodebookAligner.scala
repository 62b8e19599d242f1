package graft.index

/** Codebook alignment across re-clusterings (V11, MEVI/pq.py:600-611):
  * match new centroids to old ones so code ids stay stable when the
  * codebook is refreshed. The reference uses `linear_sum_assignment`;
  * [[alignOptimal]] is the equivalent exact O(K³) Hungarian assignment
  * (shortest augmenting path with potentials) — K ≤ 256, driver-local,
  * dependency-free. The greedy [[align]] remains as the cheap
  * approximation; on adversarial refreshes it can mis-pair and silently
  * churn code ids, so [[alignCodebook]] uses the optimal form.
  */
object CodebookAligner {

  private def costMatrix(oldLevel: Array[Array[Float]],
      newLevel: Array[Array[Float]]): Array[Array[Double]] = {
    val k = oldLevel.length
    require(newLevel.length == k)
    Array.tabulate(k, k) { (n, o) =>
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
  }

  /** Exact minimum-cost assignment (Hungarian, shortest-augmenting-path
    * formulation): perm(newCode) = oldCode minimizing Σ ‖c_new − c_old‖²
    * — the same optimum as the reference's `linear_sum_assignment`
    * (maximize similarity ≡ minimize distance).
    */
  def alignOptimal(oldLevel: Array[Array[Float]],
      newLevel: Array[Array[Float]]): Array[Int] = {
    val cost = costMatrix(oldLevel, newLevel)
    val k = cost.length
    val inf = Double.MaxValue / 4
    // rows = new codes, cols = old codes; 1-based with col 0 as scratch
    val u = new Array[Double](k + 1)
    val v = new Array[Double](k + 1)
    val p = new Array[Int](k + 1) // p(j): row currently matched to col j
    val way = new Array[Int](k + 1)
    var i = 1
    while (i <= k) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(k + 1)(inf)
      val used = Array.fill(k + 1)(false)
      var augmenting = true
      while (augmenting) {
        used(j0) = true
        val i0 = p(j0)
        var delta = inf
        var j1 = -1
        var j = 1
        while (j <= k) {
          if (!used(j)) {
            val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
            if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
            if (minv(j) < delta) { delta = minv(j); j1 = j }
          }
          j += 1
        }
        j = 0
        while (j <= k) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
          j += 1
        }
        j0 = j1
        augmenting = p(j0) != 0
      }
      while (j0 != 0) { p(j0) = p(way(j0)); j0 = way(j0) }
      i += 1
    }
    val perm = new Array[Int](k)
    var j = 1
    while (j <= k) { perm(p(j) - 1) = j - 1; j += 1 }
    perm
  }

  /** Returns perm where perm(newCode) = oldCode, minimizing Σ ‖c_new −
    * c_old‖² greedily (global-min pick per step — deterministic).
    */
  def align(oldLevel: Array[Array[Float]], newLevel: Array[Array[Float]]): Array[Int] = {
    val cost = costMatrix(oldLevel, newLevel)
    val k = cost.length
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

  /** Re-label a refreshed codebook so its code ids align with `old`
    * (optimal assignment, matching the reference exactly). */
  def alignCodebook(old: Codebook, fresh: Codebook): Codebook = {
    require(old.numLevels == fresh.numLevels,
      s"level-count mismatch: old has ${old.numLevels} levels, " +
        s"fresh has ${fresh.numLevels} — alignment is per-level")
    val levels = old.levels.indices.map { m =>
      val perm = alignOptimal(old.levels(m), fresh.levels(m))
      val out = new Array[Array[Float]](perm.length)
      perm.indices.foreach(n => out(perm(n)) = fresh.levels(m)(n))
      out
    }.toArray
    Codebook(levels)
  }
}
