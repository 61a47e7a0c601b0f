package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Dense affine map y = M·(x − μ) over an embedding column — the apply
  * stage of [[graft.operators.Whitening]] (and any other fitted linear
  * transform: PCA projection, rotation for OPQ-style quantization).
  *
  * The matrix and mean ride the plan as REFERENCED OBJECTS (the
  * [[CentroidTopN]]/[[SparseDot]] pattern): one java object per task, no
  * per-row literal folding, constant plan size in the dimension. Codegen'd
  * — the d² multiply-adds run inside whole-stage codegen as two plain java
  * loops. Row-local, zero shuffle: at 100 TB the transform is
  * embarrassingly parallel per row-group. */
case class MatVecTransform(child: Expression,
                           mat: Array[Array[Double]],
                           mean: Array[Double]) extends UnaryExpression {
  require(mat.nonEmpty && mat.forall(_.length == mean.length),
    s"matrix is ${mat.length} rows of ${mat.headOption.map(_.length)}, mean is ${mean.length}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "matvec_transform"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"matvec_transform requires array<float|double>, got ${other.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val d = mean.length
    val n = math.min(d, x.numElements())
    val centered = new Array[Double](d)
    var j = 0
    while (j < n) {
      val xv = if (x.isNullAt(j)) 0.0
        else if (elemIsFloat) x.getFloat(j).toDouble else x.getDouble(j)
      centered(j) = xv - mean(j)
      j += 1
    }
    val out = new Array[Double](mat.length)
    var i = 0
    while (i < mat.length) {
      val row = mat(i)
      var acc = 0.0; var k = 0
      while (k < d) { acc += row(k) * centered(k); k += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("matvecMat", mat, "double[][]")
    val meanRef = ctx.addReferenceObj("matvecMean", mean, "double[]")
    val d = mean.length
    nullSafeCodeGen(ctx, ev, x => {
      val get = if (elemIsFloat) s"(double) $x.getFloat" else s"$x.getDouble"
      val m = ctx.freshName("m"); val mu = ctx.freshName("mu")
      val cen = ctx.freshName("cen"); val out = ctx.freshName("out")
      val nn = ctx.freshName("nn"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val acc = ctx.freshName("acc"); val row = ctx.freshName("row")
      s"""
         |final double[][] $m = $matRef;
         |final double[] $mu = $meanRef;
         |final double[] $cen = new double[$d];
         |final int $nn = java.lang.Math.min($d, $x.numElements());
         |for (int $j = 0; $j < $nn; $j++) {
         |  $cen[$j] = ($x.isNullAt($j) ? 0.0 : $get($j)) - $mu[$j];
         |}
         |final double[] $out = new double[$m.length];
         |for (int $i = 0; $i < $m.length; $i++) {
         |  final double[] $row = $m[$i];
         |  double $acc = 0.0;
         |  for (int $k = 0; $k < $d; $k++) { $acc += $row[$k] * $cen[$k]; }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }
}

object MatVecFunction {
  def matVec(c: Column, mat: Array[Array[Double]], mean: Array[Double]): Column =
    ColumnBridge.column(MatVecTransform(ColumnBridge.expression(c), mat, mean))
}
