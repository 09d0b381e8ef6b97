package graft

import org.scalatest.funsuite.AnyFunSuite

/** The GraftExtensions SQL surface: all four native functions callable
  * from SQL text via the same builders the extensions class injects. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()

  test("native functions work through SQL text") {
    org.apache.spark.sql.graftx.GraftExtensions.registerAll(spark)
    graft.core.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val r = spark.sql("""
      SELECT cosine_sim(a.embedding, a.embedding) AS self_cos,
             size(sign_buckets(a.embedding, 6, 8)) AS n_tables
      FROM embeddings a WHERE a.vec_id = 0""").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getInt(1) == 8)

    val w = spark.sql("""
      SELECT size(word_shingles(text, 3)) AS n_sh,
             size(winnow_fingerprint(text)) AS n_fp,
             size(word_grams(text, 2)) AS n_bg
      FROM documents WHERE doc_id = 0""").collect()(0)
    assert(w.getInt(0) > 0 && w.getInt(1) > 0)
    // non-distinct mode: exactly tokens-1 bigrams
    val nTok = spark.sql(
      "SELECT size(word_grams(text, 1)) FROM documents WHERE doc_id = 0")
      .collect()(0).getInt(0)
    assert(w.getInt(2) == nTok - 1)

    // the bounded collect aggregate is SQL-callable and caps its list
    val bc = spark.sql("""
      SELECT lang, size(bounded_collect_long(doc_id, 3)) AS n
      FROM documents GROUP BY lang""").collect()
    assert(bc.nonEmpty && bc.forall(_.getInt(1) <= 3))
  }

  test("non-literal static parameter is rejected with a clear error") {
    org.apache.spark.sql.graftx.GraftExtensions.registerAll(spark)
    graft.core.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, doc_id::INT) FROM documents")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
