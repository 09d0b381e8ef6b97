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
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) =>
        WordShingles(children(0), intLit(children(1), "word_shingles"))))
    ext.injectFunction((
      FunctionIdentifier("sign_buckets"),
      new ExpressionInfo(classOf[SignBuckets].getName, "sign_buckets"),
      (children: Seq[Expression]) => SignBuckets(children(0),
        intLit(children(1), "sign_buckets"),
        intLit(children(2), "sign_buckets"))))
  }

  /** Static parameters must be integer literals in SQL calls. */
  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal parameter, got $other")
  }
}
