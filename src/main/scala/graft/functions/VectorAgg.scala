package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed aggregators over `array<float>` embedding columns — the
  * `Aggregator[IN, BUF, OUT]` tier of the extension ladder (custom
  * aggregation state that composes with groupBy/window like any built-in).
  *
  * [[VectorSum]] accumulates element-wise into one mutable double buffer per
  * group per partition (map-side combined), so a mean over n d-dim vectors
  * shuffles k×d doubles instead of n×d exploded rows.
  *
  * Note on determinism: double accumulation order follows partition layout,
  * like every floating-point aggregate; pipelines that hash-compare results
  * across engines should use the decimal-sum formulation instead (see
  * Similarity.ivfCentroids). This aggregator is the high-throughput path.
  */
object VectorAgg {

  case class Buf(var sum: Array[Double], var n: Long)

  /** Element-wise sum + count; mean = finish. Dimension fixed up front. */
  class VectorMean(dim: Int) extends Aggregator[Seq[Float], Buf, Seq[Double]] {
    override def zero: Buf = Buf(new Array[Double](dim), 0L)

    override def reduce(b: Buf, a: Seq[Float]): Buf = {
      if (a != null) {
        val n = math.min(dim, a.length); var i = 0
        while (i < n) { b.sum(i) += a(i); i += 1 }
        b.n += 1
      }
      b
    }

    override def merge(x: Buf, y: Buf): Buf = {
      var i = 0
      while (i < dim) { x.sum(i) += y.sum(i); i += 1 }
      x.n += y.n
      x
    }

    override def finish(b: Buf): Seq[Double] =
      if (b.n == 0) null else b.sum.map(_ / b.n).toSeq

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** Column-function form: `df.groupBy(k).agg(vectorMean(64)(col("emb")))`. */
  def vectorMean(dim: Int): Column => Column = {
    val fn = udaf(new VectorMean(dim))
    (c: Column) => fn(c)
  }

  /** [[VectorMean]] over `array<double>` inputs — the gradient-accumulator
    * shape ([[graft.operators.QualityModel]] aggregates per-row gradient
    * contributions, which are double-typed): identical buffer/merge
    * algebra, one mutable double buffer per group per partition. */
  class VectorMeanDouble(dim: Int) extends Aggregator[Seq[Double], Buf, Seq[Double]] {
    override def zero: Buf = Buf(new Array[Double](dim), 0L)

    override def reduce(b: Buf, a: Seq[Double]): Buf = {
      if (a != null) {
        val n = math.min(dim, a.length); var i = 0
        while (i < n) { b.sum(i) += a(i); i += 1 }
        b.n += 1
      }
      b
    }

    override def merge(x: Buf, y: Buf): Buf = {
      var i = 0
      while (i < dim) { x.sum(i) += y.sum(i); i += 1 }
      x.n += y.n
      x
    }

    override def finish(b: Buf): Seq[Double] =
      if (b.n == 0) null else b.sum.map(_ / b.n).toSeq

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** Column-function form of [[VectorMeanDouble]]. */
  def vectorMeanDouble(dim: Int): Column => Column = {
    val fn = udaf(new VectorMeanDouble(dim))
    (c: Column) => fn(c)
  }
}
