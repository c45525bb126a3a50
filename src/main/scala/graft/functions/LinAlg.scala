package graft.functions

/** Tiny dense linear algebra for DRIVER-side work on dim-bounded
  * matrices (covariance eigendecomposition for PCA). Everything here
  * operates on dim×dim arrays — KB-sized at embedding dims — so none
  * of it touches Spark; the distributed side only ever materializes
  * the dim-bounded aggregates that feed it.
  */
object LinAlg {

  /** Eigendecomposition of a symmetric matrix by cyclic Jacobi
    * rotations — numerically robust for the small well-conditioned
    * matrices PCA sees, with no external dependency. Returns
    * (eigenvalues, eigenvectors) as parallel arrays, UNSORTED;
    * eigenvector i (a row in the result) satisfies A·vᵢ = λᵢ·vᵢ.
    * Converges when the off-diagonal Frobenius mass drops below
    * 1e-12 of the diagonal's, or after `maxSweeps` full sweeps.
    */
  def symmetricEigen(a0: Array[Array[Double]],
                     maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += 2 * a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    def diagMass(): Double = {
      var s = 0.0; var i = 0
      while (i < n) { s += a(i)(i) * a(i)(i); i += 1 }
      math.max(s, 1e-300)
    }
    var sweep = 0
    while (sweep < maxSweeps && offDiag() > 1e-12 * diagMass()) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            // classic two-sided rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            // |theta| > ~1.3e154 overflows theta² to Infinity, which
            // would collapse the quotient to 0.0 and (in the old
            // `case 0.0 => 1.0` form) mis-rotate 45° where a near-zero
            // rotation was meant; use the asymptotic tan ≈ 1/(2θ)
            // there and reserve the 45° case for a true zero.
            val t =
              if (theta == 0.0) 1.0 // 45° rotation
              else if (math.abs(theta) > 1e150) 1 / (2 * theta)
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val vals = Array.tabulate(n)(i => a(i)(i))
    val vecs = Array.tabulate(n)(i => Array.tabulate(n)(k => v(k)(i)))
    (vals, vecs)
  }
}
