package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.{PQCodes, PQCodesFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit gate for the native PQ encoder: the DataFrame (whole-stage
  * codegen) path must agree with interpreted nullSafeEval, ties must
  * break to the lower code id, and the uniform-width contract must be
  * enforced at construction (a narrow centroid would silently misalign
  * the row-major codebook reads).
  */
class PQCodesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()

  // 2 subspaces of width 2, 2 centroids each (id-sorted, as the trainer
  // emits them)
  private val cb: Seq[Seq[(Int, Seq[Double])]] = Seq(
    Seq(0 -> Seq(0.0, 0.0), 1 -> Seq(10.0, 10.0)),
    Seq(0 -> Seq(-5.0, 0.0), 1 -> Seq(5.0, 0.0)))

  private def lit(e: Seq[Float]) =
    org.apache.spark.sql.catalyst.expressions.Literal
      .create(e.toArray, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))

  private def interpreted(v: Seq[Float]): Seq[Int] =
    PQCodes(lit(v), cb, dsub = 2)
      .nullSafeEval(new GenericArrayData(v.toArray))
      .asInstanceOf[GenericArrayData].toIntArray().toSeq

  test("interpreted eval and codegen agree on every corpus vector") {
    import spark.implicits._
    val vecs: Seq[Seq[Float]] = Seq(
      Seq(1f, 1f, 4f, 0f), Seq(9f, 8f, -6f, 1f),
      Seq(0f, 0f, 0f, 0f), Seq(5f, 6f, 2f, -3f))
    val viaCodegen = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        PQCodesFunctions.pq_codes(col("embedding"), cb, 2).as("codes"))
      .orderBy("vec_id").collect()
      .map(_.getAs[scala.collection.Seq[Int]]("codes").toSeq).toSeq
    assert(viaCodegen == vecs.map(interpreted))
    // and spot-check the geometry: (1,1) nearer (0,0) than (10,10);
    // (4,0) nearer (5,0) than (-5,0)
    assert(viaCodegen.head == Seq(0, 1))
  }

  test("equidistant centroids break ties to the lower code id") {
    // (5,5) is equidistant from (0,0) and (10,10); (0,0) from (-5,0)/(5,0)
    assert(interpreted(Seq(5f, 5f, 0f, 0f)) == Seq(0, 0))
  }

  test("codes index surviving ids, not positions, after a cell drops") {
    // codebook where id 0 dropped out (empty cell): nearest must report
    // the surviving id, and the LUT slot it names must line up
    val gapped = Seq(Seq(1 -> Seq(0.0, 0.0), 3 -> Seq(10.0, 10.0)))
    val got = PQCodes(lit(Seq(9f, 9f)), gapped, dsub = 2)
      .nullSafeEval(new GenericArrayData(Array(9f, 9f)))
      .asInstanceOf[GenericArrayData].toIntArray().toSeq
    assert(got == Seq(3))
  }

  test("a centroid narrower than dsub is rejected at construction") {
    val bad = Seq(Seq(0 -> Seq(0.0, 0.0), 1 -> Seq(10.0)))
    val e = intercept[IllegalArgumentException] {
      PQCodes(lit(Seq(1f, 1f)), bad, dsub = 2)
    }
    assert(e.getMessage.contains("dsub"))
  }
}
