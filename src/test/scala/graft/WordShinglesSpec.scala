package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{WordShingles, WordShinglesFunctions}
import org.scalatest.funsuite.AnyFunSuite

/** The native WordShingles kernel must produce exactly the same shingle
  * SETS as the composable lambda formulation the DuckDB oracle mirrors. */
class WordShinglesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()
  val sf = "/root/testdata/sf0.001"

  test("native == lambda formulation on the real corpus (as sets)") {
    val docs = graft.core.Tables(spark, sf, "documents")
    val lambda = docs
      .withColumn("w", expr(graft.operators.TextAnalysis.tokensExpr))
      .withColumn("sh",
        expr("""CASE WHEN size(w) >= 3 THEN
                 array_distinct(transform(sequence(0, size(w) - 3),
                   i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
               ELSE array() END"""))
      .select(col("doc_id"), col("sh"))
    val native = docs.select(col("doc_id"),
      WordShinglesFunctions.word_shingles(col("text"), 3).as("sh"))
    val l = lambda.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val n = native.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(n == l)
  }

  test("kernel edge cases") {
    assert(WordShingles.shingle("", 3).isEmpty)
    assert(WordShingles.shingle("one two", 3).isEmpty)
    assert(WordShingles.shingle("A b-C,d", 2).toSeq ==
      Seq("a b", "b c", "c d"))
    assert(WordShingles.shingle("x x x x", 3).toSeq == Seq("x x x"))
    assert(WordShingles.shingle("  lots   of   gaps  ", 2).toSeq ==
      Seq("lots of", "of gaps"))
  }
}
