package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Kernel for [[SparseDot]]: Σ x·w[b] over (bucket, value) entries.
  * Called from generated code via the object's static forwarder. */
object SparseDotKernel {
  def dot(entries: ArrayData, w: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = entries.numElements()
    while (i < n) {
      val s = entries.getStruct(i, 2)
      acc += s.getDouble(1) * w(s.getInt(0))
      i += 1
    }
    acc
  }
}

/** Sparse dot product against a FIXED dense weight vector — the scoring
  * kernel of [[graft.operators.QualityModel.trainHashedLogisticSparse]]'s
  * iteration loop. The weight vector rides along as a referenced object
  * (serialized once per task, like a broadcast var) instead of a
  * dims-sized literal array: at fastText-scale dims (64k–10M buckets) an
  * `array(lit…)` literal is itself the plan — Θ(dims) expression nodes
  * ANALYZED AND CODEGEN'D PER ITERATION — while this node is constant
  * plan size with Θ(nnz) work per row. Input: `array<struct<b int,
  * x double>>` (bucket, value) entries; buckets must be in [0, dims) —
  * the caller constructs them with `md5_long(t) mod dims`, so the bound
  * holds by construction. */
case class SparseDot(child: Expression, weights: Array[Double])
  extends UnaryExpression {

  require(weights.nonEmpty, "sparse_dot requires a non-empty weight vector")

  override def prettyName: String = "sparse_dot"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == IntegerType && b.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<int, double>> entries, got " +
        other.catalogString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    SparseDotKernel.dot(input.asInstanceOf[ArrayData], weights)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("sparseDotW", weights, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SparseDotKernel.dot($c, $wRef)")
  }
}

object SparseDotFunction {
  def sparseDot(entries: Column, weights: Array[Double]): Column =
    ColumnBridge.column(SparseDot(ColumnBridge.expression(entries), weights))
}
