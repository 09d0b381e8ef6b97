package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Product-quantization encoder: all M subspace codes for a vector in ONE
  * pass (array<int>, code m = id of the nearest centroid of codebook m
  * over dimension slice [m*dsub, (m+1)*dsub), L2², ties to the lower id).
  *
  * The learned codebook rides along as a plain object reference
  * (`addReferenceObj`) — the inner distance loops run over primitive
  * arrays inside whole-stage codegen. Replaces the lambda formulation
  * (M × Kc zip_with+aggregate trees per row): HOFs have no codegen, and
  * at 128 interpreted evaluations per row they dominated the PQ build —
  * this kernel is ~flops-bound, the right shape for encoding a 100 TB
  * corpus. See [[graft.operators.ProductQuantizer]] for the trainer.
  */
case class PQCodes(child: Expression,
    cents: Seq[Seq[(Int, Seq[Double])]], dsub: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(dsub >= 1 && cents.nonEmpty && cents.forall(_.nonEmpty))
  // uniform-width contract: every centroid spans exactly dsub dims. The
  // trainer derives centroids from slice(embedding, ...) — a corpus with a
  // short vector would yield a narrow centroid and silently misalign the
  // row-major reads below (vals is indexed with off = j * dsub).
  require(cents.forall(_.forall(_._2.length == dsub)),
    s"every centroid must have exactly dsub=$dsub dims " +
      "(non-uniform-width embedding corpus?)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  // flattened per-subspace codebooks: ids + row-major centroid values
  // (primitive arrays — no per-row boxing in the distance loops)
  @transient private lazy val ids: Array[Array[Int]] =
    cents.map(_.map(_._1).toArray).toArray
  @transient private lazy val vals: Array[Array[Double]] =
    cents.map(_.flatMap(_._2).toArray).toArray

  def computeCodes(v: Array[Float]): GenericArrayData = {
    val m = ids.length
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val cv = vals(mi)
      val nc = ids(mi).length
      val base = mi * dsub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < nc) {
        var d2 = 0.0
        var d = 0
        val off = j * dsub
        while (d < dsub) {
          // vectors shorter than (m+1)*dsub pad with 0 — callers slice
          // uniform-width embeddings, so this is just bounds safety
          val x = if (base + d < v.length) v(base + d).toDouble else 0.0
          val diff = x - cv(off + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = ids(mi)(j) } // ties: first wins
        j += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    computeCodes(input.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PQCodes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.computeCodes($c.toFloatArray());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column entry point. */
object PQCodesFunctions {
  def pq_codes(c: Column, cents: Seq[Seq[(Int, Seq[Double])]],
      dsub: Int): Column =
    ExpressionUtils.column(PQCodes(ExpressionUtils.expression(c), cents, dsub))
}
