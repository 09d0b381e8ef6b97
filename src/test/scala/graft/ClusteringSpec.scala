package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clustering

/** Lloyd's k-means: monotone improvement, determinism, full assignment. */
class ClusteringSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()
  val sf = "/root/testdata/sf0.001"

  private def embeddings = graft.core.Tables(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("empty input degrades to empty relations without crashing") {
    val e = embeddings.filter(col("vec_id") < 0)
    val (a, c) = Clustering.kmeans(e, k = 4, iters = 2)
    assert(a.count() == 0 && c.count() == 0)
  }

  test("k=1 degenerates to a single cluster without crashing") {
    // least() needs >= 2 args; the single-centroid path must bypass it
    val e = embeddings
    val (a, c) = Clustering.kmeans(e, k = 1, iters = 2)
    assert(c.count() == 1)
    assert(a.select("cl").distinct().count() == 1)
    assert(a.count() == e.count())
  }

  test("bounded collect caps per-group state and matches collect_list " +
      "below the cap") {
    import spark.implicits._
    import org.apache.spark.sql.graftx.BoundedCollectFunctions.bounded_collect_long
    val df = (0L until 100L).map(i => (i % 7, i)).toDF("k", "v")
    val bounded = df.groupBy("k").agg(bounded_collect_long(col("v"), 50).as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    val exact = df.groupBy("k").agg(collect_list(col("v")).as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    assert(bounded == exact) // every group under the cap: identical
    val capped = df.groupBy("k").agg(bounded_collect_long(col("v"), 5).as("vs"))
      .collect().map(_.getSeq[Long](1))
    assert(capped.forall(_.size == 5)) // 100/7 > 5 everywhere: all capped
  }

  test("more iterations never worsen WSS, every vector assigned") {
    val e = embeddings
    val (a1, c1) = Clustering.kmeans(e, k = 8, iters = 1)
    val (a5, c5) = Clustering.kmeans(e, k = 8, iters = 5)
    val w1 = Clustering.wss(e, a1, c1)
    val w5 = Clustering.wss(e, a5, c5)
    assert(w5 <= w1 + 1e-9, s"wss got worse: $w1 -> $w5")
    assert(a5.count() == e.count())
    assert(a5.select("cl").distinct().count() <= 8)
  }

  test("deterministic across runs") {
    val e = embeddings
    val r1 = Clustering.kmeans(e, k = 4, iters = 3)._1
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val r2 = Clustering.kmeans(e, k = 4, iters = 3)._1
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(r1 == r2)
  }
}
