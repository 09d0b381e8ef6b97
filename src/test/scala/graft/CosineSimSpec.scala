package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions

/** The native CosineSim expression must be bit-identical to the composable
  * lambda formulation (which the DuckDB oracles mirror), in both codegen
  * and interpreted paths. */
class CosineSimSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()
  val sf = "/root/testdata/sf0.001"

  private def pairs = {
    val e = graft.core.Tables(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
  }

  test("native == composable, bit for bit") {
    val d = pairs.select(
      VectorFunctions.cosine(col("qv"), col("embedding")).as("native"),
      VectorFunctions.cosineComposable(col("qv"), col("embedding"))
        .as("composable"))
    assert(d.filter(col("native") =!= col("composable")).count() == 0)
    assert(d.filter(col("native").isNull).count() == 0)
  }

  test("interpreted path (eval) matches codegen path") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = pairs
        .select(VectorFunctions.cosine(col("qv"), col("embedding")).as("c"))
        .agg(sum("c")).collect()(0).getDouble(0)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = pairs
        .select(VectorFunctions.cosine(col("qv"), col("embedding")).as("c"))
        .agg(sum("c")).collect()(0).getDouble(0)
      assert(interp == gen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null semantics: mismatched length and zero norm give null") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f))
    ).toDF("a", "b")
    val out = df.select(VectorFunctions.cosine(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
