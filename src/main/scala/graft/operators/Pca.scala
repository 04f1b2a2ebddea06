package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Principal-component extraction for embedding columns.
  *
  * The scale shape: ONE `treeAggregate` pass over the corpus
  * accumulates the packed upper-triangular second-moment matrix plus
  * the column sums — O(n·d²) executor work, d·(d+3)/2 doubles to the
  * driver, independent of n — then the d×d eigenproblem is solved
  * driver-side by power iteration (d is an embedding dimension, a few
  * hundred to a few thousand; the driver matrix is behind a loud cap,
  * the DriverBoundsSpec discipline). The corpus itself is never
  * collected; at 100 TB the single pass is the whole cost.
  *
  * Power iteration is deterministic: fixed uniform start vector,
  * fixed iteration count, and a sign pin (largest-|component| made
  * positive). Repeated fits on the same corpus agree to rounding
  * precision — the iteration itself is a pure function of the
  * moments, but treeAggregate's combOp order over double sums
  * depends on task completion order, so the moments (and hence the
  * fit) can differ in low-order bits between runs. Consumers that
  * need stable output round projections before comparing (the
  * PcaSpec discipline).
  */
object Pca {

  /** Driver-side d×d covariance cap: 2048² doubles = 32 MiB packed. */
  val MaxDim = 2048

  /** First principal component of the `embCol` vectors.
    *
    * @param vector   unit-norm PC1 direction (length d)
    * @param eigenvalue variance along PC1 (λ₁ of the covariance)
    * @param trace    total variance (trace of the covariance)
    * @param mean     column means (length d)
    * @param n        row count
    */
  final case class Pc1(vector: Array[Double], eigenvalue: Double,
    trace: Double, mean: Array[Double], n: Long) {
    def explainedVarianceRatio: Double =
      if (trace > 0) eigenvalue / trace else 0.0
  }

  /** Covariance of packed upper-triangular moments; exposed for the
    * residual pin in PcaSpec. */
  private[graft] def covariance(p: Pc1Raw): Array[Array[Double]] = {
    val d = p.dim
    val c = Array.ofDim[Double](d, d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val cov = p.m2(idx) / p.n - (p.s1(i) / p.n) * (p.s1(j) / p.n)
        c(i)(j) = cov
        c(j)(i) = cov
        idx += 1
        j += 1
      }
      i += 1
    }
    c
  }

  private[graft] final case class Pc1Raw(dim: Int, n: Long,
    s1: Array[Double], m2: Array[Double])

  /** One corpus pass: n, Σx, and packed upper-triangular Σ x xᵀ. */
  private[graft] def moments(df: DataFrame, embCol: String): Pc1Raw = {
    import df.sparkSession.implicits._
    val vecs = df.select(col(embCol)).na.drop()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case x => x.toString.toDouble
      }.toArray)
    val first = vecs.head(1)
    require(first.nonEmpty, "PCA on an EMPTY embedding corpus: nothing " +
      "to fit — guard the call or skip the projection stage")
    val dim = first(0).length
    require(dim <= MaxDim,
      s"embedding dimension $dim exceeds the $MaxDim driver cap: the " +
        s"d×d covariance (${dim.toLong * dim} doubles) would not fit " +
        "driver memory — project or chunk the embedding first")
    val tri = dim * (dim + 1) / 2
    val (n, s1, m2) = vecs.rdd.treeAggregate(
      (0L, new Array[Double](dim), new Array[Double](tri)))(
      seqOp = { case ((cnt, s, m), x) =>
        require(x.length == dim,
          s"ragged embedding: expected $dim dims, found ${x.length}")
        var i = 0
        var idx = 0
        while (i < dim) {
          s(i) += x(i)
          var j = i
          while (j < dim) { m(idx) += x(i) * x(j); idx += 1; j += 1 }
          i += 1
        }
        (cnt + 1, s, m)
      },
      combOp = { case ((c1, s1a, m1), (c2, s2a, m2a)) =>
        var i = 0
        while (i < dim) { s1a(i) += s2a(i); i += 1 }
        var k = 0
        while (k < tri) { m1(k) += m2a(k); k += 1 }
        (c1 + c2, s1a, m1)
      })
    Pc1Raw(dim, n, s1, m2)
  }

  /** Fit PC1 by power iteration on the covariance of `embCol`.
    * Iterates to a fixed-point tolerance (‖v − v'‖ ≤ 1e-13) under a
    * hard cap — both deterministic functions of the input, so the fit
    * is reproducible. */
  def fitPc1(df: DataFrame, embCol: String, maxIters: Int = 5000): Pc1 = {
    val raw = moments(df, embCol)
    val c = covariance(raw)
    val d = raw.dim
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += c(i)(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      var nrm = 0.0
      var k = 0
      while (k < d) { nrm += w(k) * w(k); k += 1 }
      nrm = math.sqrt(nrm)
      if (nrm == 0.0) converged = true // zero covariance: keep v
      else {
        // sign-insensitive fixed point: the iterate may flip sign each
        // step when the dominant eigenvalue is negative, so compare
        // against both ±v as whole vectors
        var dPlus = 0.0
        var dMinus = 0.0
        var k2 = 0
        while (k2 < d) {
          w(k2) /= nrm
          dPlus = math.max(dPlus, math.abs(w(k2) - v(k2)))
          dMinus = math.max(dMinus, math.abs(w(k2) + v(k2)))
          k2 += 1
        }
        v = w
        converged = math.min(dPlus, dMinus) <= 1e-13
        it += 1
      }
    }
    // sign pin: the largest-|component| coordinate is made positive so
    // the direction (defined only up to ±) is reproducible
    var big = 0
    var i = 1
    while (i < d) { if (math.abs(v(i)) > math.abs(v(big))) big = i; i += 1 }
    if (v(big) < 0) { var k = 0; while (k < d) { v(k) = -v(k); k += 1 } }
    var lambda = 0.0
    var trace = 0.0
    var r = 0
    while (r < d) {
      var s = 0.0
      var j = 0
      while (j < d) { s += c(r)(j) * v(j); j += 1 }
      lambda += v(r) * s
      trace += c(r)(r)
      r += 1
    }
    val mean = raw.s1.map(_ / raw.n)
    Pc1(v, lambda, trace, mean, raw.n)
  }
}
