package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** Deterministic real-AVI (MPNG: PNG-compressed frames) payload from a
  * media id — the video sibling of [[PngSynth]]/[[WavSynth]], same
  * rationale: an Expression keeps the media catalog a pure columnar plan
  * so metadata-only consumers never encode a container, and
  * CodegenFallback is deliberate because the per-row cost IS the
  * container+PNG encoder. */
case class AviSynth(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "avi_synth"

  override def nullSafeEval(id: Any): Any =
    graft.operators.MediaCodec.aviBytes(id.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AviSynthFunctions {
  def avi_synth(id: Column): Column =
    ExpressionUtils.column(AviSynth(ExpressionUtils.expression(id)))
}
