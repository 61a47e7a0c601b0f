package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ZCA whitening: eigensolver exactness, the identity-covariance
  * postcondition on the real embedding corpus, the ZCA symmetry
  * signature, and codegen/driver algebra parity for the fitted
  * transform. */
class WhiteningSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen solves A·v = λ·v on a hand-checkable symmetric matrix") {
    // eigenvalues of [[2,1],[1,2]] are 3 and 1
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (lam, v) = Whitening.jacobiEigen(a)
    assert(lam.sorted.zip(Seq(1.0, 3.0)).forall { case (g, w) => math.abs(g - w) < 1e-12 })
    // residual ‖A·v − λ·v‖ per eigenpair
    (0 until 2).foreach { k =>
      (0 until 2).foreach { i =>
        val av = (0 until 2).map(j => a(i)(j) * v(j)(k)).sum
        assert(math.abs(av - lam(k) * v(i)(k)) < 1e-12, s"pair $k row $i")
      }
    }
    // orthonormal columns
    val dot01 = (0 until 2).map(i => v(i)(0) * v(i)(1)).sum
    assert(math.abs(dot01) < 1e-12)
  }

  test("whitened corpus covariance is the identity; W is symmetric (the ZCA signature)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val (mean, cov) = Whitening.moments(e, col("embedding"), 64)
    assert(mean.length === 64 && cov.length === 64)
    val w = Whitening.zcaMatrix(cov)
    (0 until 64).foreach { i =>
      (0 until i).foreach { j =>
        assert(math.abs(w(i)(j) - w(j)(i)) < 1e-9, s"W must be symmetric at ($i,$j)")
      }
    }
    val whitened = Whitening.whiten(e, "embedding", 64)
    // recompute moments over the whitened output (cast path: array<double>)
    val (m2, c2) = Whitening.moments(whitened, col("whitened"), 64)
    (0 until 64).foreach { i =>
      // the recompute casts the double output back to float (the moments
      // input contract), so tolerances are float-rounding-bounded
      assert(math.abs(m2(i)) < 1e-6, s"whitened mean dim $i = ${m2(i)}")
      (0 to i).foreach { j =>
        val want = if (i == j) 1.0 else 0.0
        assert(math.abs(c2(i)(j) - want) < 1e-6,
          s"whitened cov($i,$j) = ${c2(i)(j)}, want $want")
      }
    }
  }

  test("the fitted transform matches driver-side algebra row for row (codegen parity)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val (mean, cov) = Whitening.moments(
      spark.read.parquet(s"$sf/embeddings.parquet"), col("embedding"), 64)
    val w = Whitening.zcaMatrix(cov)
    val engine = Whitening.whiten(
      spark.read.parquet(s"$sf/embeddings.parquet"), "embedding", 64)
      .where(col("vec_id") < 50)
      .select(col("vec_id"), col("whitened")).as[(Long, Seq[Double])]
      .collect().toMap
    val local = e.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap.map { case (id, x) =>
        val cen = (0 until 64).map(j => x(j).toDouble - mean(j))
        id -> (0 until 64).map(i => (0 until 64).map(k => w(i)(k) * cen(k)).sum)
      }
    local.foreach { case (id, want) =>
      val got = engine(id)
      (0 until 64).foreach { i =>
        assert(math.abs(got(i) - want(i)) < 1e-12, s"vec $id dim $i")
      }
    }
  }

  test("whitening recovers SQ8's per-dim budget on stretched data (the OPQ value case)") {
    // stretch dim 0 by 20×: quantizeInt8's per-vector max-abs scale is then
    // set by dim 0, so the other 63 dims share a step ~20× too coarse for
    // their variance. Metric: mean over dims of (quantization MSE / dim
    // variance) — the starved dims dominate it. Whitening equalizes the
    // variances, so every dim gets an honest share of the 8-bit budget.
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val stretch = Array.tabulate(64, 64)((i, j) =>
      if (i == j) { if (i == 0) 20.0 else 1.0 } else 0.0)
    val corr = e.select(col("vec_id"),
      graft.functions.MatVecFunction.matVec(
        col("embedding"), stretch, new Array[Double](64)).as("v"))
    def normalizedMse(df: org.apache.spark.sql.DataFrame, vc: String): Double = {
      val orig = df.select(col("vec_id"), col(vc)).as[(Long, Seq[Double])]
        .collect().toMap
      val qs = Similarity.quantizeInt8(df.select(col("vec_id"), col(vc).as("embedding")))
        .as[(Long, Long, Long, Double)].collect()
        .groupBy(_._1)
      val dims = 64
      val errSum = new Array[Double](dims)
      val valSum = new Array[Double](dims)
      val sqSum = new Array[Double](dims)
      var n = 0L
      orig.foreach { case (id, x) =>
        val recon = qs(id).map(r => (r._2.toInt, r._3 * r._4)).toMap
        (0 until dims).foreach { d =>
          val err = recon(d) - x(d)
          errSum(d) += err * err
          valSum(d) += x(d); sqSum(d) += x(d) * x(d)
        }
        n += 1
      }
      (0 until dims).map { d =>
        val varD = sqSum(d) / n - math.pow(valSum(d) / n, 2)
        errSum(d) / n / varD
      }.sum / dims
    }
    val raw = normalizedMse(corr, "v")
    val wht = normalizedMse(Whitening.whiten(corr, "v", 64, "w"), "w")
    assert(wht < raw * 0.2,
      s"whitened normalized MSE $wht must be ≥5× below the stretched $raw")
  }

  test("guards: degenerate corpus, bad eps, bad dim") {
    intercept[IllegalArgumentException] {
      Whitening.moments(Seq(Seq.fill(64)(1f)).toDF("embedding"), col("embedding"), 64)
    }
    intercept[IllegalArgumentException] {
      Whitening.zcaMatrix(Array(Array(1.0)), eps = 0.0)
    }
    intercept[IllegalArgumentException] {
      Whitening.moments(spark.read.parquet(s"$sf/embeddings.parquet"),
        col("embedding"), 0)
    }
  }
}
