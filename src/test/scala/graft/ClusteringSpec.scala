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

  test("two-level: delegates to flat below the crossover") {
    val e = embeddings
    val flat = Clustering.kmeansFull(e, k = 6, iters = 2)._1
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    val auto = Clustering.kmeansTwoLevelFull(e, k = 6, iters = 2)._1
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(auto == flat) // k <= TwoLevelMinK: identical, same code path
  }

  test("two-level (forced): full assignment, consistent centroids, " +
      "deterministic, and near-identical vectors co-locate") {
    import spark.implicits._
    val e = embeddings
    def run() = Clustering.kmeansTwoLevelFull(e, k = 9, iters = 2,
      minK = 1)
    val (a, c) = run()
    // every vector assigned, to a centroid that exists
    assert(a.count() == e.count())
    val clIds = c.collect().map(_.getInt(0)).toSet
    val used = a.select("cl").distinct().collect().map(_.getInt(0)).toSet
    assert(used.subsetOf(clIds), s"dangling cluster ids: ${used -- clIds}")
    // deterministic across runs (fresh plan both times)
    val s1 = run()._1.collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    val s2 = run()._1.collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(s1 == s2)
    // planted near-duplicates (1e-4 perturbation of corpus vectors, ids
    // far above the corpus) land in their source's cluster — the
    // co-location property dd13's within-cell windows rely on
    val base = e.limit(5).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val planted = base.map { case (id, v) =>
      (id + 1000000L, v.toArray.zipWithIndex.map { case (x, i) =>
        if (i == 0) x + 1e-4f else x }.toSeq)
    }
    val withPlanted = e.unionByName(
      spark.createDataset(planted.toSeq).toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding")))
    val (ap, _) = Clustering.kmeansTwoLevelFull(withPlanted, k = 9,
      iters = 2, minK = 1)
    val asg = ap.select("vec_id", "cl").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    base.foreach { case (id, _) =>
      assert(asg(id + 1000000L) == asg(id),
        s"planted twin of $id split across cells")
    }
  }

  test("nearest_centroid_in_group matches a driver-side argmin") {
    import org.apache.spark.sql.graftx.NearestCentroidInGroupFunctions._
    val rows = embeddings.limit(40).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cents: Array[Array[Array[Double]]] = Array(
      rows.take(3).map(_._2.map(_.toDouble)),
      rows.slice(3, 5).map(_._2.map(_.toDouble)))
    val ids: Array[Array[Int]] = Array(Array(0, 1, 2), Array(0, 1))
    val df = embeddings.limit(40)
      .withColumn("g", (col("vec_id") % 2).cast("int"))
    val got = df.select(col("vec_id"), col("g"),
        nearest_centroid_in_group(col("embedding"), col("g"), cents, ids)
          .as("sub"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    rows.foreach { case (id, v) =>
      val g = (id % 2).toInt
      val want = cents(g).zipWithIndex.map { case (cv, j) =>
        (cv.zip(v).map { case (c, x) => (x - c) * (x - c) }.sum, j)
      }.minBy { case (d, j) => (d, j) }._2
      assert(got((id, g)) == ids(g)(want), s"vec $id group $g")
    }
  }
}
