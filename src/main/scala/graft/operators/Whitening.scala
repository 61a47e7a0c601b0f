package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** ZCA whitening for embedding corpora — the preprocessing that makes
  * quantizers honest: product/scalar quantization (q69/q70/q72, q101)
  * allocates its budget per-dimension, so correlated or badly-scaled
  * dimensions waste code space (the motivation behind OPQ, Ge et al.
  * 2013). Whitening maps x → W·(x − μ) with W = V·Λ^(−1/2)·Vᵀ from the
  * corpus covariance's eigendecomposition: the output has identity
  * covariance, and among all whitening maps ZCA's stays closest to the
  * original basis (Bell & Sejnowski 1997).
  *
  * Scale shape: ONE corpus pass — a typed Aggregator accumulates the
  * d-dim sum and the d(d+1)/2 upper-triangle co-moment buffer map-side
  * (at d = 64 that is 2 144 doubles per task, metadata scale; n×d rows
  * are never exploded). The eigendecomposition runs on the DRIVER over
  * the d×d covariance (d ≤ a few thousand — microseconds at 64, the
  * same driver-bounded contract as the PQ codebooks and SQ8 rails), and
  * the fitted (W, μ) ships back as ONE referenced object inside a
  * codegen'd row-local [[graft.functions.MatVecTransform]] — zero
  * shuffle to apply.
  *
  * Not SQL-expressible (the eigensolve), so spec-gated rather than
  * oracle-gated, like `trainHashedLogisticSparse` and the curation
  * driver: `WhiteningSpec` asserts the whitened corpus covariance is the
  * identity, eigenpairs satisfy A·v = λ·v, W is symmetric (the ZCA
  * signature), and the codegen'd transform matches driver-side algebra
  * bit-for-bit. */
object Whitening {

  case class MomentBuf(var sum: Array[Double], var co: Array[Double], var n: Long)

  /** Single-pass (mean, covariance) over an `array<float>` column.
    * Population covariance: cov = E[x·xᵀ] − μ·μᵀ. */
  class Moments(dim: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Seq[Float], MomentBuf, MomentBuf] {
    override def zero: MomentBuf =
      MomentBuf(new Array[Double](dim), new Array[Double](dim * (dim + 1) / 2), 0L)

    override def reduce(b: MomentBuf, a: Seq[Float]): MomentBuf = {
      if (a != null && a.length >= dim) {
        var i = 0
        var t = 0
        while (i < dim) {
          val xi = a(i).toDouble
          b.sum(i) += xi
          var j = 0
          while (j <= i) { b.co(t) += xi * a(j); t += 1; j += 1 }
          i += 1
        }
        b.n += 1
      }
      b
    }

    override def merge(x: MomentBuf, y: MomentBuf): MomentBuf = {
      var i = 0
      while (i < x.sum.length) { x.sum(i) += y.sum(i); i += 1 }
      i = 0
      while (i < x.co.length) { x.co(i) += y.co(i); i += 1 }
      x.n += y.n
      x
    }

    override def finish(b: MomentBuf): MomentBuf = b
    override def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
    override def outputEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
  }

  /** (mean, covariance) of the corpus — one aggregation action. */
  def moments(df: DataFrame, vecCol: Column, dim: Int): (Array[Double], Array[Array[Double]]) = {
    require(dim >= 1, s"dim must be positive, got $dim")
    import df.sparkSession.implicits._
    val fn = udaf(new Moments(dim))
    val b = df.select(vecCol.cast("array<float>").as("value"))
      .select(fn(col("value")).as("b"))
      .select(col("b.*")).as[MomentBuf].head()
    require(b.n > 1, s"need at least 2 complete ${dim}-dim vectors, got ${b.n}")
    val mean = b.sum.map(_ / b.n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0; var t = 0
    while (i < dim) {
      var j = 0
      while (j <= i) {
        val c = b.co(t) / b.n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    (mean, cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (Golub & Van
    * Loan §8.5): returns (eigenvalues, eigenvectors as COLUMNS). Driver-
    * side, O(d³) per sweep — microseconds at d = 64, fine to ~4k. */
  def jacobiEigen(a0: Array[Array[Double]],
                  maxSweeps: Int = 64,
                  tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            // 2×2 symmetric Schur rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
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
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { if (i != j) s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** ZCA map W = V·(Λ+ε)^(−1/2)·Vᵀ from a covariance matrix. ε regularizes
    * near-null directions (an exactly-degenerate dimension would blow up
    * 1/√λ; with ε it maps toward zero instead). */
  def zcaMatrix(cov: Array[Array[Double]], eps: Double = 1e-9): Array[Array[Double]] = {
    require(eps > 0, s"eps must be positive, got $eps")
    val d = cov.length
    val (lam, v) = jacobiEigen(cov)
    val inv = lam.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))
    // W[i][j] = Σ_k v[i][k] · inv[k] · v[j][k]
    Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += v(i)(k) * inv(k) * v(j)(k); k += 1 }
      s
    }
  }

  /** Fit on the corpus, apply row-locally: adds `outCol` = W·(x − μ) as
    * `array<double>`. One aggregation action to fit; zero-shuffle apply. */
  def whiten(df: DataFrame, vecCol: String, dim: Int,
             outCol: String = "whitened", eps: Double = 1e-9): DataFrame = {
    val (mean, cov) = moments(df, col(vecCol), dim)
    val w = zcaMatrix(cov, eps)
    df.withColumn(outCol, graft.functions.MatVecFunction.matVec(col(vecCol), w, mean))
  }
}
