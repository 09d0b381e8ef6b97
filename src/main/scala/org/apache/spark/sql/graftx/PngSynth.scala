package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** Deterministic real-PNG payload from a media id — the fixture-side
  * kernel of the multimodal tier ([[graft.operators.MediaCodec]]). An
  * Expression rather than a mapPartitions stage so the media CATALOG
  * stays a pure columnar plan: Catalyst prunes the payload column away
  * for metadata-only consumers (mm01/mm03 never encode a single PNG),
  * which an object-boundary stage would forfeit. CodegenFallback is
  * deliberate: the per-row cost IS the PNG encoder; interpreter dispatch
  * is noise next to it, and the surrounding projection still codegens. */
case class PngSynth(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "png_synth"

  override def nullSafeEval(id: Any): Any =
    graft.operators.MediaCodec.pngBytes(id.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PngSynthFunctions {
  def png_synth(id: Column): Column =
    ExpressionUtils.column(PngSynth(ExpressionUtils.expression(id)))
}
