package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * polynomial rolling hashes of every K-byte gram, then the minimum hash of
  * each W-wide window, deduplicated — the classic plagiarism/near-dup
  * fingerprint guaranteeing a match for any shared substring of length
  * >= W + K - 1.
  *
  * Implemented as a native UnaryExpression with codegen: the rolling
  * update is O(1) per byte (one multiply-add plus one subtract), so
  * fingerprinting is a single linear pass over the UTF-8 bytes with no
  * intermediate allocation — at 100 TB this runs inside the scan
  * projection at I/O speed, where a lambda/UDF formulation would dominate
  * CPU.
  *
  * Static parameters: K = 24-byte grams (short grams on a small-vocabulary
  * corpus are shared by nearly every document pair and explode the
  * fingerprint join; ~25-50 bytes is the standard plagiarism-detection
  * noise threshold), W = 16-gram windows, base 257, 64-bit wraparound
  * arithmetic (overflow is intentional and identical in eval and codegen
  * paths).
  */
case class WinnowFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  @inline private def compute(bytes: Array[Byte]): Array[Long] =
    WinnowFingerprint.winnow(bytes)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(compute(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = WinnowFingerprint.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |  $cls.winnow($c.getBytes()));
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprint {
  final val K = 24 // gram length in bytes
  final val W = 16 // window size in grams
  final val Base = 257L

  /** Shared kernel for both eval and codegen paths. */
  def winnow(bytes: Array[Byte]): Array[Long] = {
    val n = bytes.length
    if (n < K) return Array.empty[Long]
    val nGrams = n - K + 1
    // rolling polynomial hashes of every K-gram
    val hs = new Array[Long](nGrams)
    var pow = 1L // Base^(K-1)
    var i = 1
    while (i < K) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < K) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    hs(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * Base + (bytes(i + K - 1) & 0xff)
      hs(i) = h
      i += 1
    }
    // min of each W-window of gram hashes, deduplicated on repeat picks
    // (robust winnowing's rightmost-min tie rule)
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var lastPick = -1
    val lastWin = math.max(nGrams - W, 0)
    var w0 = 0
    while (w0 <= lastWin) {
      val end = math.min(w0 + W, nGrams)
      var mi = w0
      var j = w0 + 1
      while (j < end) { if (hs(j) <= hs(mi)) mi = j; j += 1 }
      if (mi != lastPick) { out += hs(mi); lastPick = mi }
      w0 += 1
    }
    out.toArray
  }
}

/** SQL-function registration hooks, wired by [[GraftExtensions]]. */
object GraftFunctions {
  def winnow_fingerprint(c: Column): Column =
    ExpressionUtils.column(WinnowFingerprint(ExpressionUtils.expression(c)))
}
