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
