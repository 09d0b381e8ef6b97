package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the graft engine. Hosted under
  * `org.apache.spark.sql` because the Expression/Column bridge
  * (`ExpressionUtils`) and `AbstractDataType` are `private[sql]` — the
  * standard placement for Spark extension expressions.
  */

/** Native cosine similarity over two `array<float>` columns.
  *
  * The composable formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * is correct but materializes an intermediate array per row and walks the
  * data three times (dot, |a|, |b|). This expression fuses everything into
  * one allocation-free pass and participates in whole-stage codegen via
  * [[doGenCode]] — the hot kernel of every ANN query, where at 100 TB the
  * brute-force score stage is pure CPU.
  *
  * Semantics are bit-identical to the composable version (and the DuckDB
  * oracle): elements promote to double, accumulators fold strictly
  * left-to-right, result = dot / (sqrt(na) * sqrt(nb)). Null input, length
  * mismatch, or a zero-norm side yields null.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
        |final int $n = $x.numElements();
        |if ($n != $y.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    final double $xi = (double) $x.getFloat($i);
        |    final double $yi = (double) $y.getFloat($i);
        |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        |  }
        |  final double $denom =
        |    java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        |  if ($denom == 0.0) { ${ev.isNull} = true; }
        |  else { ${ev.value} = $dot / $denom; }
        |}
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object functions {
  /** Column-API entry point for [[CosineSim]]. */
  def cosine_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
