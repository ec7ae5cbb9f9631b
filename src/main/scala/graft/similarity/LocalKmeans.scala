package graft.similarity

/** Driver-local k-means (k-means++ seeding + Lloyd iterations) for
  * TRAINING-SAMPLE-sized inputs — the Faiss practice: quantizer
  * codebooks are trained on a bounded sample (~100–256 points per
  * centroid), never the full corpus, because beyond that more data adds
  * cost, not centroid quality (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011, §V; Faiss trains on
  * `min(n, 256·k)` points by default). At a few thousand points ×
  * a few dozen dims the whole fit is microseconds of driver CPU — far
  * below the scheduling cost of even ONE distributed job, let alone the
  * m × maxIter jobs an MLlib fit per subspace schedules. The model
  * (k × dim doubles) was always driver-resident anyway (the codebook
  * memo collects it), so this moves no data the pipeline didn't already
  * move — it deletes the corpus-sized training read.
  *
  * Deterministic: seeded rng, stable input order required from the
  * caller. Empty clusters re-seed to the point farthest from its
  * assigned centroid (the standard repair).
  */
private[graft] object LocalKmeans {

  import scala.math.Ordering.Implicits.seqOrdering


  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** k-means++ seeding: first center from rng, each next center drawn
    * with probability ∝ squared distance to the nearest chosen center
    * (Arthur & Vassilvitskii, SODA 2007).
    */
  private def seedPlusPlus(pts: Array[Array[Double]], k: Int,
      rng: java.util.Random): Array[Array[Double]] = {
    val n = pts.length
    val centers = new Array[Array[Double]](k)
    centers(0) = pts(rng.nextInt(n)).clone()
    val best = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var i = 0
      var total = 0.0
      while (i < n) {
        val d = d2(pts(i), centers(c - 1))
        if (d < best(i)) best(i) = d
        total += best(i); i += 1
      }
      var r = rng.nextDouble() * total
      var pick = 0
      i = 0
      while (i < n - 1 && r > best(i)) { r -= best(i); i += 1 }
      pick = i
      centers(c) = pts(pick).clone()
      c += 1
    }
    centers
  }

  /** Fit `k` centroids over `pts` (each `dim` doubles). Returns k
    * centroids in a deterministic order (sorted lexicographically at
    * the end so the caller's code ids don't depend on rng history).
    *
    * `spherical = true` renormalizes each centroid to unit length after
    * every update — SPHERICAL k-means (Dhillon & Modha 2001): on
    * unit-norm inputs, Euclidean assignment (d² = 2 − 2·cos) IS cosine
    * assignment, so the renormalized loop optimizes cosine similarity —
    * the quantizer an IVF cosine index needs. A zero-mass centroid
    * re-seeds like an empty cluster.
    */
  def fit(pts: Array[Array[Double]], k: Int, maxIter: Int,
      seed: Long, spherical: Boolean = false): Array[Array[Double]] = {
    require(pts.nonEmpty, "LocalKmeans.fit: no training points")
    val n = pts.length
    val dim = pts(0).length
    if (n <= k)
      // fewer points than centroids: every point is a centroid, pad by
      // repeating the first (searches only ever take argmin — dup
      // centroids are harmless)
      return Array.tabulate(k)(i => pts(i % n).clone()).sortBy(_.toSeq)
    val rng = new java.util.Random(seed)
    var centers = seedPlusPlus(pts, k, rng)
    val assign = new Array[Int](n)
    var it = 0
    var moved = true
    while (it < maxIter && moved) {
      moved = false
      // assignment
      var i = 0
      while (i < n) {
        var bi = 0; var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          val d = d2(pts(i), centers(c))
          if (d < bd) { bd = d; bi = c }
          c += 1
        }
        if (assign(i) != bi || it == 0) { assign(i) = bi; moved = true }
        i += 1
      }
      // update
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      i = 0
      while (i < n) {
        val c = assign(i); counts(c) += 1
        val s = sums(c); val p = pts(i)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        i += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          val s = sums(c)
          var j = 0
          while (j < dim) { s(j) /= counts(c); j += 1 }
          if (spherical) {
            var n2 = 0.0; j = 0
            while (j < dim) { n2 += s(j) * s(j); j += 1 }
            val nrm = math.sqrt(n2)
            if (nrm > 0) { j = 0; while (j < dim) { s(j) /= nrm; j += 1 } }
          }
          centers(c) = s
        } else {
          // empty cluster: re-seed to the point farthest from its
          // current centroid
          var far = 0; var fd = -1.0
          var i2 = 0
          while (i2 < n) {
            val d = d2(pts(i2), centers(assign(i2)))
            if (d > fd) { fd = d; far = i2 }
            i2 += 1
          }
          centers(c) = pts(far).clone()
        }
        c += 1
      }
      it += 1
    }
    centers.sortBy(_.toSeq)
  }
}
