package graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.scalatest.funsuite.AnyFunSuite

/** The GraftExtensions SQL surface: all four native functions callable
  * from SQL text. (Registered through the same builders the extensions
  * class injects — a fresh session with spark.sql.extensions is not
  * possible here because the test JVM shares one SparkContext.)
  */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()

  private def register(name: String, b: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, b, "built-in")

  test("native functions work through SQL text") {
    import org.apache.spark.sql.graftx._
    register("cosine_sim", es => CosineSim(es(0), es(1)))
    register("winnow_fingerprint", es => WinnowFingerprint(es.head))
    register("word_shingles", es => WordShingles(es(0),
      es(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
        .value.asInstanceOf[Int]))
    register("sign_buckets", es => SignBuckets(es(0),
      es(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
        .value.asInstanceOf[Int],
      es(2).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
        .value.asInstanceOf[Int]))

    graft.core.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val r = spark.sql("""
      SELECT cosine_sim(a.embedding, a.embedding) AS self_cos,
             size(sign_buckets(a.embedding, 6, 8)) AS n_tables
      FROM embeddings a WHERE a.vec_id = 0""").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getInt(1) == 8)

    val w = spark.sql("""
      SELECT size(word_shingles(text, 3)) AS n_sh,
             size(winnow_fingerprint(text)) AS n_fp
      FROM documents WHERE doc_id = 0""").collect()(0)
    assert(w.getInt(0) > 0 && w.getInt(1) > 0)
  }
}
