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

  test("unicode: native == lambda on accents, CJK, symbols") {
    import org.apache.spark.sql.graftx.WordShinglesFunctions
    val texts = Seq(
      "café au lait très bon café au lait",
      "你好 world one two three 世界 four five six",
      "MIXED Case TOKENS with UPPER and lower and 123 456 789",
      "emoji 😀 splits one two three four 😀 five six",
      "Kelvin signs one two three four")
    val df = spark.createDataFrame(texts.zipWithIndex.map(_.swap))
      .toDF("doc_id", "text")
    val lambda = df
      .withColumn("w", expr(graft.operators.TextAnalysis.tokensExpr))
      .withColumn("sh",
        expr("""CASE WHEN size(w) >= 3 THEN
                 array_distinct(transform(sequence(0, size(w) - 3),
                   i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
               ELSE array() END"""))
      .select(col("doc_id"), col("sh")).collect()
      .map(r => r.getInt(0) -> r.getSeq[String](1).toSet).toMap
    val native = df.select(col("doc_id"),
      WordShinglesFunctions.word_shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toSet).toMap
    assert(native == lambda)
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
