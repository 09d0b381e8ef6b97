package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** Deterministic real-WAV payload from a media id — [[PngSynth]]'s audio
  * twin ([[graft.operators.MediaCodec]] closed-form PCM → JDK RIFF/WAVE
  * writer). An Expression for the same reason: the media catalog stays a
  * pure columnar plan and metadata-only consumers prune the payload away
  * without ever encoding a WAV. CodegenFallback: the per-row cost is the
  * codec, not dispatch. */
case class WavSynth(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "wav_synth"

  override def nullSafeEval(id: Any): Any =
    graft.operators.MediaCodec.wavBytes(id.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavSynthFunctions {
  def wav_synth(id: Column): Column =
    ExpressionUtils.column(WavSynth(ExpressionUtils.expression(id)))
}
