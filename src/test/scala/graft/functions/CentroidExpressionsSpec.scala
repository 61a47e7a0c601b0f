package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The fused [[CentroidTopN]] kernel replaced the literal
  * `array_max(array(struct(cosine, id), …))` shape as the coarse
  * quantizer's evaluator, so the cluster column of every STORED index now
  * comes from it — parity with the literal shape is load-bearing, not
  * cosmetic. These tests pin bit-parity on real embeddings and on the
  * adversarial cases where the two shapes could diverge: exact cosine
  * ties (must resolve to the LARGER centroid id, the max-struct rule),
  * NaN cosines from zero-norm vectors and zero-norm centroids (NaN ranks
  * ABOVE finite values under compareDoubles, as struct ordering does),
  * null vector elements (skipped on BOTH accumulators, the two-sided
  * [[VectorCosine]] rule), and n > k truncation. */
class CentroidExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(s"$sf/embeddings.parquet").limit(200).cache()

  private def litTop1(c: Array[Array[Double]]) =
    Similarity.nearestCentroidLiteral(col("embedding"), c)
  private def kerTop1(c: Array[Array[Double]]) =
    CentroidFunctions.centroidTopN(col("embedding"), c, 1).getItem(0)

  test("kernel argmax matches the literal shape on real embeddings (k=4, 16)") {
    Seq(4, 16).foreach { k =>
      val cents = Similarity.ivfCentroids(emb, k = k, iters = 1)
      val mismatches = emb.select(
          litTop1(cents).as("lit"), kerTop1(cents).as("ker"))
        .where(col("lit") =!= col("ker")).count()
      assert(mismatches == 0L, s"k=$k: $mismatches argmax mismatches")
    }
  }

  test("probe top-n matches the literal sort/slice shape, order included") {
    val cents = Similarity.ivfCentroids(emb, k = 8, iters = 1)
    Seq(1, 3, 8).foreach { n =>
      val mism = emb.select(
          Similarity.probeCentroidsLiteral(col("embedding"), cents, n).as("lit"),
          CentroidFunctions.centroidTopN(col("embedding"), cents, n).as("ker"))
        .where(col("lit") =!= col("ker")).count()
      assert(mism == 0L, s"nprobe=$n: ordered top-n mismatch")
    }
  }

  test("exact cosine tie resolves to the larger centroid id (both shapes)") {
    // duplicate centroid: ids 1 and 2 are the same vector → identical cos
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(0.0, 1.0))
    val df = Seq(Tuple1(Array(0.1f, 0.9f)), Tuple1(Array(0.9f, 0.1f)))
      .toDF("embedding")
    val rows = df.select(litTop1(cents).as("lit"), kerTop1(cents).as("ker"))
      .as[(Int, Int)].collect()
    assert(rows.toSet == Set((2, 2), (0, 0)))
  }

  test("NaN ranks above finite: zero-norm centroid wins; zero vector takes max id") {
    // centroid 1 has zero norm → cos NaN for every vector → argmax = 1
    val cents = Array(Array(1.0, 0.0), Array(0.0, 0.0), Array(0.0, 1.0))
    val df = Seq(Tuple1(Array(0.9f, 0.1f))).toDF("embedding")
    val r = df.select(litTop1(cents).as("lit"), kerTop1(cents).as("ker"))
      .as[(Int, Int)].collect().head
    assert(r == ((1, 1)), s"zero-norm centroid must rank first, got $r")
    // zero VECTOR → all cosines NaN → tie cascade → largest id
    val cents2 = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val z = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("embedding")
    val rz = z.select(litTop1(cents2).as("lit"), kerTop1(cents2).as("ker"))
      .as[(Int, Int)].collect().head
    assert(rz == ((1, 1)), s"zero vector must take the largest id, got $rz")
  }

  test("null vector elements are skipped two-sided, matching vector_cosine") {
    val cents = Array(Array(1.0, 1.0, 0.0), Array(0.0, 1.0, 1.0))
    val df = Seq(Tuple1(Seq[java.lang.Float](1.0f, null, 1.0f)))
      .toDF("embedding")
    val r = df.select(litTop1(cents).as("lit"), kerTop1(cents).as("ker"))
      .as[(Int, Int)].collect().head
    assert(r._1 == r._2, s"null-element parity broke: $r")
  }

  test("n > k returns all k, like slice on a k-array; n capped output length") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(Tuple1(Array(0.6f, 0.4f))).toDF("embedding")
    val r = df.select(
        CentroidFunctions.centroidTopN(col("embedding"), cents, 5).as("ker"),
        Similarity.probeCentroidsLiteral(col("embedding"), cents, 5).as("lit"))
      .as[(Seq[Int], Seq[Int])].collect().head
    assert(r._1 == r._2 && r._1.length == 2, s"n>k shape mismatch: $r")
  }

  test("kernel is usable at k=1024 where the literal shape is not attempted") {
    // 1024 centroids × 64 dims: plan must build and evaluate promptly —
    // the literal shape at this k spends minutes in plan compile
    val rnd = new scala.util.Random(7)
    val cents = Array.fill(1024)(Array.fill(64)(rnd.nextGaussian()))
    val n = emb.select(kerTop1(cents).as("c"))
      .where(col("c").between(0, 1023)).count()
    assert(n == emb.count())
  }

  test("interpreted eval agrees with codegen (filter pushes into parquet scan barrier)") {
    val cents = Similarity.ivfCentroids(emb, k = 4, iters = 1)
    val viaKernel = emb.select(col("vec_id"), kerTop1(cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // interpreted: evaluate the expression directly per row on the driver
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray)
      val expr = CentroidTopN(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          arr, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, containsNull = false)),
        cents, 1)
      val out = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].getInt(0)
      assert(out == viaKernel(r.getLong(0)),
        s"interpreted/codegen divergence at vec_id=${r.getLong(0)}")
    }
  }
}
