package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Nearest-centroid assignment over a literal codebook: returns the cluster
  * id (from `ids`) of the centroid minimizing squared L2 distance to the
  * input `array<float>` vector; distance ties keep the earlier (lower-id)
  * centroid, matching the `least(struct(cdist, cl))` formulation this
  * replaces.
  *
  * Why native: the composable assignment builds k parallel
  * `sqrt(aggregate(zip_with(...)))` subtrees and `least()`s k structs — at
  * k = 8 (sim03's IVF) that is tolerable, but the expression tree grows
  * LINEARLY in k and every zip_with/aggregate lambda is interpreted
  * (higher-order functions have no codegen). At dd13's k ~ N/512 the plan
  * takes minutes to CONSTRUCT and evaluation falls off codegen entirely
  * (measured: 119 s of driver-side build + interpreted scoring for k = 97
  * at sf1.0). This expression is one codegen'd loop over a
  * reference-carried double[k][dim] — O(k·dim) per row with no
  * allocation, no expression-tree growth, and whole-stage codegen kept.
  *
  * Comparison detail: distances compare as SQUARED L2 (sqrt is monotone,
  * so the argmin is identical; skipping sqrt also avoids merging
  * near-ties that only rounding made equal). A centroid whose dimension
  * count differs from the input is skipped; an empty codebook yields null.
  */
case class NearestCentroid(child: Expression,
    cents: Array[Array[Double]], ids: Array[Int])
    extends UnaryExpression with ExpectsInputTypes {

  require(cents.length == ids.length,
    s"codebook/id length mismatch: ${cents.length} vs ${ids.length}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      if (cv.length == n) {
        var d = 0.0
        var i = 0
        while (i < n) {
          val dv = x.getFloat(i).toDouble - cv(i)
          d += dv * dv
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
      }
      c += 1
    }
    if (best < 0) null else ids(best)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val idsRef = ctx.addReferenceObj("ids", ids, "int[]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val dv = ctx.freshName("dv")
      s"""
        |final int $n = $x.numElements();
        |int $best = -1;
        |double $bestD = Double.POSITIVE_INFINITY;
        |for (int $c = 0; $c < $centsRef.length; $c++) {
        |  final double[] $cv = $centsRef[$c];
        |  if ($cv.length == $n) {
        |    double $d = 0.0;
        |    for (int $i = 0; $i < $n; $i++) {
        |      final double $dv = (double) $x.getFloat($i) - $cv[$i];
        |      $d += $dv * $dv;
        |    }
        |    if ($d < $bestD) { $bestD = $d; $best = $c; }
        |  }
        |}
        |if ($best < 0) { ${ev.isNull} = true; }
        |else { ${ev.value} = $idsRef[$best]; }
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidFunctions {
  def nearest_centroid(vec: Column, cents: Array[Array[Double]],
      ids: Array[Int]): Column =
    ExpressionUtils.column(
      NearestCentroid(ExpressionUtils.expression(vec), cents, ids))
}
