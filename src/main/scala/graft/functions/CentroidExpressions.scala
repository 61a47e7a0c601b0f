package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused top-n-nearest-centroids kernel — the large-k coarse quantizer.
  *
  * The literal shape ([[graft.operators.Similarity.nearestCentroid]]'s
  * original `array_max(array(struct(cosine, id), …))`) spends Θ(k·dim)
  * expression NODES: k copies of the cosine kernel plus k struct
  * constructions per row, and a k-way struct comparison tree. That is the
  * right shape for tens of clusters but collapses past ~k≈64 — plan
  * compile/codegen cost grows with k, and at the k ≈ √N a fourth-decade
  * corpus wants (k ≈ 1400 at 2 M vectors) the plan never finishes
  * building. This expression is the scale shape: ONE node whose k×dim
  * centroid matrix rides along as a referenced object (like a broadcast
  * var: serialized once per task, not once per expression), generating a
  * primitive double loop — constant code size in k, Θ(k·dim) WORK per row,
  * no allocation until the n-element result.
  *
  * Bit-parity with the literal path is load-bearing (stored indexes — the
  * cluster column IS the partition layout — must not move when the
  * evaluation shape changes; spec-asserted in CentroidExpressionsSpec):
  *  - per-centroid cosine follows [[VectorCosine]] exactly: common-prefix
  *    length, skip-if-either-null elements (a centroid row is never null,
  *    so this reduces to the vector's nulls — but BOTH norms skip the
  *    position, as the two-sided kernel does), index-ascending double
  *    accumulation, `dot/(√na·√nb)` (NaN when either norm is 0);
  *  - ranking is descending (cos, id) under SQLOrderingUtil.compareDoubles
  *    — the SAME comparator codegen'd struct ordering uses: NaN ranks
  *    above everything (a zero-norm centroid outranks all finite cosines,
  *    exactly as the struct array_max does), −0.0 ties 0.0, and cosine
  *    ties resolve to the LARGER centroid id (the max-struct tie);
  *  - n > k returns all k, matching `slice(…, 1, n)` on a k-array.
  */
case class CentroidTopN(child: Expression, centroids: Array[Array[Double]], n: Int)
  extends UnaryExpression {

  require(n > 0, s"centroid_top_n requires n > 0, got $n")
  require(centroids.nonEmpty, "centroid_top_n requires at least one centroid")

  override def prettyName: String = "centroid_top_n"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> vector, got ${other.catalogString}")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Rank of (cos, id) pairs: positive when a outranks b. Descending cos
    * under compareDoubles; ties to the larger id. */
  @inline private def outranks(cosA: Double, idA: Int, cosB: Double, idB: Int): Boolean = {
    val c = org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(cosA, cosB)
    c > 0 || (c == 0 && idA > idB)
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val k = centroids.length
    val m = math.min(n, k)
    val topCos = new Array[Double](m)
    val topId = new Array[Int](m)
    var filled = 0
    var i = 0
    while (i < k) {
      val c = centroids(i)
      val nn = math.min(x.numElements(), c.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < nn) {
        if (!x.isNullAt(j)) {
          val xv = if (isF) x.getFloat(j).toDouble else x.getDouble(j)
          val cv = c(j)
          dot += xv * cv; na += xv * xv; nb += cv * cv
        }
        j += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      // insertion position: first slot this candidate outranks. Iterating
      // ids ascending means an equal-cos candidate always outranks the
      // sitting entry (larger id) — the max-struct tie, preserved by <=
      var p = filled
      while (p > 0 && outranks(cos, i, topCos(p - 1), topId(p - 1))) p -= 1
      if (p < m) {
        val last = math.min(filled, m - 1)
        var q = last
        while (q > p) { topCos(q) = topCos(q - 1); topId(q) = topId(q - 1); q -= 1 }
        topCos(p) = cos; topId(p) = i
        if (filled < m) filled += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topId, filled))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centroidMat", centroids, "double[][]")
    val m = math.min(n, centroids.length)
    nullSafeCodeGen(ctx, ev, x => {
      val get = if (elemIsFloat) s"(double) $x.getFloat" else s"$x.getDouble"
      val kv = ctx.freshName("k"); val iv = ctx.freshName("i"); val jv = ctx.freshName("j")
      val cRow = ctx.freshName("cRow"); val nn = ctx.freshName("nn")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val cv = ctx.freshName("cv")
      val cos = ctx.freshName("cos"); val cmp = ctx.freshName("cmp")
      val topCos = ctx.freshName("topCos"); val topId = ctx.freshName("topId")
      val filled = ctx.freshName("filled"); val p = ctx.freshName("p")
      val q = ctx.freshName("q"); val last = ctx.freshName("last")
      s"""
         |final double[][] ${cRow}s = $matRef;
         |final int $kv = ${cRow}s.length;
         |final double[] $topCos = new double[$m];
         |final int[] $topId = new int[$m];
         |int $filled = 0;
         |for (int $iv = 0; $iv < $kv; $iv++) {
         |  final double[] $cRow = ${cRow}s[$iv];
         |  final int $nn = java.lang.Math.min($x.numElements(), $cRow.length);
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $jv = 0; $jv < $nn; $jv++) {
         |    if (!$x.isNullAt($jv)) {
         |      final double $xv = $get($jv);
         |      final double $cv = $cRow[$jv];
         |      $dot += $xv * $cv; $na += $xv * $xv; $nb += $cv * $cv;
         |    }
         |  }
         |  final double $cos = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  int $p = $filled;
         |  while ($p > 0) {
         |    final int $cmp = org.apache.spark.sql.catalyst.util.SQLOrderingUtil
         |      .compareDoubles($cos, $topCos[$p - 1]);
         |    if ($cmp > 0 || ($cmp == 0 && $iv > $topId[$p - 1])) $p--; else break;
         |  }
         |  if ($p < $m) {
         |    final int $last = java.lang.Math.min($filled, $m - 1);
         |    for (int $q = $last; $q > $p; $q--) {
         |      $topCos[$q] = $topCos[$q - 1]; $topId[$q] = $topId[$q - 1];
         |    }
         |    $topCos[$p] = $cos; $topId[$p] = $iv;
         |    if ($filled < $m) $filled++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($topId, $filled));
       """.stripMargin
    })
  }
}

object CentroidFunctions {
  /** Top-n nearest centroid ids (descending cosine), as `array<int>`. */
  def centroidTopN(vec: Column, centroids: Array[Array[Double]], n: Int): Column =
    ColumnBridge.column(CentroidTopN(ColumnBridge.expression(vec), centroids, n))
}
