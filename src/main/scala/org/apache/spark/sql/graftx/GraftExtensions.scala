package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions exposing the graft native expressions to SQL:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "org.apache.spark.sql.graftx.GraftExtensions")
  * // then: SELECT cosine_sim(a.embedding, b.embedding), winnow_fingerprint(text) ...
  * }}}
  *
  * Registration-only — per SURVEY.md §4/§7.3 no custom optimizer Rule or
  * SparkStrategy is required for parity with the reference (it has no
  * optimizer at all); the custom surface here is scalar kernels, which is
  * the correct (cheapest) extension tier for these semantics.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprint"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName,
        "winnow_fingerprint"),
      (children: Seq[Expression]) => WinnowFingerprint(children.head)))
  }
}
