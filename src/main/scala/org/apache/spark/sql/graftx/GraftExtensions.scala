package org.apache.spark.sql.graftx

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
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
  * For an already-built session (e.g. the CLI), use
  * [[GraftExtensions.registerAll]].
  *
  * Registration-only — per SURVEY.md §4/§7.3 no custom optimizer Rule or
  * SparkStrategy is required for parity with the reference (it has no
  * optimizer at all); the custom surface here is scalar kernels, which is
  * the correct (cheapest) extension tier for these semantics.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("org.apache.spark.sql.graftx", name),
        builder))
    }
}

object GraftExtensions {

  /** Static parameters must be integer literals in SQL calls. */
  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal parameter, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> ((es: Seq[Expression]) => CosineSim(es(0), es(1))),
    "dot_product" -> ((es: Seq[Expression]) => DotProduct(es(0), es(1))),
    "l2_norm" -> ((es: Seq[Expression]) => L2Norm(es.head)),
    "winnow_fingerprint" -> ((es: Seq[Expression]) =>
      WinnowFingerprint(es.head)),
    "word_shingles" -> ((es: Seq[Expression]) =>
      WordShingles(es(0), intLit(es(1), "word_shingles"))),
    "sign_buckets" -> ((es: Seq[Expression]) => SignBuckets(es(0),
      intLit(es(1), "sign_buckets"), intLit(es(2), "sign_buckets"))),
    "char_ngram_counts" -> ((es: Seq[Expression]) =>
      CharNGramCounts(es(0), intLit(es(1), "char_ngram_counts"))),
    "minhash_sig" -> ((es: Seq[Expression]) =>
      MinHashSig(es(0), intLit(es(1), "minhash_sig"))),
    "word_grams" -> ((es: Seq[Expression]) =>
      WordShingles(es(0), intLit(es(1), "word_grams"), distinct = false)),
    // aggregate: the analyzer wraps a bare AggregateFunction returned
    // from a registry builder
    "bounded_collect_long" -> ((es: Seq[Expression]) =>
      BoundedCollectLong(es(0), intLit(es(1), "bounded_collect_long"))))

  /** Register every graft function on a live session's registry. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
