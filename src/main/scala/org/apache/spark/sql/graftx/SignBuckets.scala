package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** All sign-LSH bucket ids for a vector, across `tables` independent hash
  * tables of `planes` pseudo-random hyperplanes each, in ONE pass.
  *
  * The hyperplane matrix is derived from a splitmix64-style hash of
  * (table, plane, dim) — deterministic, identical on every executor, no
  * broadcast side state. Output: array<long> of length `tables`; bit p of
  * element t is the sign of the projection onto plane (t, p).
  *
  * Replaces a per-(table,plane) lambda formulation that walked the vector
  * L*B times interpreted (HOFs have no codegen); this walks it once per
  * table with the inner plane loop unrolled over registers, inside
  * whole-stage codegen — the indexing kernel for ANN at 100 TB.
  */
case class SignBuckets(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(planes >= 1 && planes <= 62 && tables >= 1 && tables <= 64)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_buckets"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    new GenericArrayData(SignBuckets.compute(v.toFloatArray(), planes, tables))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = SignBuckets.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |  $cls.compute($c.toFloatArray(), $planes, $tables));
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBuckets {
  /** splitmix64 finalizer over the packed (table, plane, dim) index —
    * a high-quality deterministic pseudo-random sign source. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def compute(v: Array[Float], planes: Int, tables: Int): Array[Long] = {
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        var proj = 0.0
        var d = 0
        val base = (t.toLong << 32) | (p.toLong << 16)
        while (d < v.length) {
          val sign = if ((mix(base | d) & 1L) == 1L) 1.0 else -1.0
          proj += v(d) * sign
          d += 1
        }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }
}

/** Column entry point (see also [[GraftFunctions]]). */
object SignBucketsFunctions {
  def sign_buckets(c: Column, planes: Int, tables: Int): Column =
    ExpressionUtils.column(
      SignBuckets(ExpressionUtils.expression(c), planes, tables))
}
