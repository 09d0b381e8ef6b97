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

/** Native left-to-right double dot product over two `array<float>` columns.
  * Same fold order as [[CosineSim]]'s dot accumulator, so
  * `dot_product(a,b) / (l2_norm(a) * l2_norm(b))` is bit-identical to
  * `cosine_sim(a,b)` — the decomposition that lets all-pairs scoring
  * precompute each vector's norm ONCE instead of re-deriving both norms
  * inside every pair (3x the flops at O(N^2) pairs). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        |final int $n = $x.numElements();
        |if ($n != $y.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i);
        |  }
        |  ${ev.value} = $dot;
        |}
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Native L2 norm of an `array<float>` column: sqrt of the left-to-right
  * double sum of squares — exactly [[CosineSim]]'s per-side accumulator. */
case class L2Norm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      s += xi * xi
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val xi = ctx.freshName("xi")
      s"""
        |final int $n = $x.numElements();
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final double $xi = (double) $x.getFloat($i);
        |  $s += $xi * $xi;
        |}
        |${ev.value} = java.lang.Math.sqrt($s);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object functions {
  /** Column-API entry point for [[CosineSim]]. */
  def cosine_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column-API entry point for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column-API entry point for [[L2Norm]]. */
  def l2_norm(a: Column): Column =
    ExpressionUtils.column(L2Norm(ExpressionUtils.expression(a)))
}
