package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** [[NearestCentroid]] restricted to one GROUP of a two-level codebook:
  * given the vector and its coarse group id, scan only that group's
  * sub-centroids (reference-carried double[group][sub][dim]) and return
  * the group's sub id (int, from `ids[group]`); ties keep the earlier
  * (lower-id) sub-centroid, same rule as the flat kernel.
  *
  * This is the assignment kernel that keeps k ~ N/TargetM cluster counts
  * (dd13's SemDeDup regime) off the O(N*k) cliff: a flat scan against
  * k = N/512 centroids is N^2/512 distance evaluations — ~2e15 at 1e9
  * vectors, the single quadratic left in the dd13 plan. Two-level
  * assignment (nearest of ~sqrt(k) coarse centroids via [[NearestCentroid]],
  * then nearest sub-centroid within that group via this kernel) costs
  * N * 2*sqrt(k) — at 1e9 vectors ~5e4x less work, and each level stays
  * one codegen'd primitive-array loop.
  *
  * An out-of-range or null group id, or a group with no centroid matching
  * the vector's dimension count, yields null (callers treat it as
  * "unassigned", which cannot happen for ids produced by the coarse
  * kernel over the same codebook).
  */
case class NearestCentroidInGroup(left: Expression, right: Expression,
    cents: Array[Array[Array[Double]]], ids: Array[Array[Int]])
    extends BinaryExpression with ExpectsInputTypes {

  require(cents.length == ids.length,
    s"codebook/id group count mismatch: ${cents.length} vs ${ids.length}")
  require(cents.indices.forall(g => cents(g).length == ids(g).length),
    "codebook/id length mismatch within a group")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), IntegerType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid_in_group"

  override def nullSafeEval(vec: Any, group: Any): Any = {
    val g = group.asInstanceOf[Int]
    if (g < 0 || g >= cents.length) return null
    val x = vec.asInstanceOf[ArrayData]
    val n = x.numElements()
    val cs = cents(g)
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cs.length) {
      val cv = cs(c)
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
    if (best < 0) null else ids(g)(best)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][][]")
    val idsRef = ctx.addReferenceObj("ids", ids, "int[][]")
    nullSafeCodeGen(ctx, ev, (x, g) => {
      val n = ctx.freshName("n")
      val cs = ctx.freshName("cs")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val dv = ctx.freshName("dv")
      s"""
        |if ($g < 0 || $g >= $centsRef.length) { ${ev.isNull} = true; }
        |else {
        |  final int $n = $x.numElements();
        |  final double[][] $cs = $centsRef[$g];
        |  int $best = -1;
        |  double $bestD = Double.POSITIVE_INFINITY;
        |  for (int $c = 0; $c < $cs.length; $c++) {
        |    final double[] $cv = $cs[$c];
        |    if ($cv.length == $n) {
        |      double $d = 0.0;
        |      for (int $i = 0; $i < $n; $i++) {
        |        final double $dv = (double) $x.getFloat($i) - $cv[$i];
        |        $d += $dv * $dv;
        |      }
        |      if ($d < $bestD) { $bestD = $d; $best = $c; }
        |    }
        |  }
        |  if ($best < 0) { ${ev.isNull} = true; }
        |  else { ${ev.value} = $idsRef[$g][$best]; }
        |}
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidInGroupFunctions {
  def nearest_centroid_in_group(vec: Column, group: Column,
      cents: Array[Array[Array[Double]]],
      ids: Array[Array[Int]]): Column =
    ExpressionUtils.column(NearestCentroidInGroup(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(group),
      cents, ids))
}
