package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.VectorFunctions.l2

/** Lloyd's k-means over an embedding column — the real coarse quantizer
  * behind an IVF index (sim03 builds its inverted lists from these cells).
  *
  * Deterministic by construction: initialization takes the k lowest
  * vec_ids (no RNG), assignment ties break on the lower centroid id, and
  * per-dimension means use exact scaled-integer sums (graft.core.Num
  * pattern) so results do not depend on partitioning.
  *
  * Centroids live driver-side between iterations (k x dim doubles — tiny),
  * so assignment is a pure projection: k fused l2 evaluations against
  * literal vectors and a least() over (cdist, cl) structs. No join, no
  * shuffle, no window — the corpus is touched exactly once per iteration
  * (vs the previous crossJoin + per-vec_id rank window, which shuffled the
  * whole corpus k-fold every round; that formulation made the IVF build
  * ~3x slower and would shuffle 100 TB per iteration at scale). The
  * returned assignment is recomputed against the FINAL centroids, so
  * (assignments, centroids) are mutually consistent — an IVF probe that
  * assigns a query to its nearest returned centroid searches exactly the
  * inverted list its members were assigned to.
  */
object Clustering {

  /** Nearest-centroid id as a projection over literal centroids; keeps the
    * embedding column so callers need no join back to the corpus.
    *
    * Assignment runs through the native [[NearestCentroid]] expression
    * (one codegen'd loop over a reference-carried double[k][dim]) rather
    * than `least()` over k `struct(l2, cl)` subtrees: the struct form's
    * expression tree grows linearly in k and its zip_with/aggregate
    * lambdas are interpreted, which made plan CONSTRUCTION alone take
    * minutes at dd13's k ~ 100 (119 s measured at sf1.0) and pushed
    * scoring off whole-stage codegen. Ties keep the lower cluster id in
    * both formulations. */
  private def assign(e: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame =
    e.select(col("vec_id"), col("embedding"),
      org.apache.spark.sql.graftx.NearestCentroidFunctions.nearest_centroid(
        col("embedding"),
        cents.map(_._2.toArray).toArray,
        cents.map(_._1).toArray).as("cl"))

  /** Returns (assignments: vec_id -> (embedding, cluster), centroids). */
  def kmeansFull(e: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(k >= 1 && iters >= 1)
    val s = e.sparkSession
    // The corpus is scanned iters+2 times (init, one mean pass per
    // iteration, final assignment) — materialize it once up front rather
    // than re-reading the source every pass. Stays persisted because the
    // returned assignment lazily references it; callers/benchmarks drop it
    // via clearCache.
    val ein = e.select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // init: the k lowest vec_ids (no RNG), re-keyed 0..k-1; float widens
    // to double exactly
    var cents: Seq[(Int, Seq[Double])] =
      ein.orderBy(col("vec_id")).limit(k).collect().toSeq
        .zipWithIndex
        .map { case (r, i) =>
          (i, r.getAs[scala.collection.Seq[Any]]("embedding")
            .map(_.asInstanceOf[Number].doubleValue).toSeq) }
    if (cents.isEmpty) {
      // empty input: no centroids exist — degrade to empty relations
      // (assign() over zero structs would otherwise crash)
      ein.unpersist(blocking = false)
      return (e.select(col("vec_id"), col("embedding"),
          lit(0).as("cl")).limit(0),
        s.createDataFrame(Seq.empty[(Int, Seq[Double])]).toDF("cl", "cvec"))
    }

    var it = 0
    while (it < iters) {
      // new centroids: per-dimension means via exact scaled-long sums
      // (order-independent; |v| <= O(1) so v*1e10 is far inside long range).
      // k x dim result rows — collected and regrouped driver-side.
      val rows = assign(ein, cents)
        .select(col("cl"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cl"), col("dim"))
        .agg((sum(graft.core.Num.scaledLong(col("v").cast("double"), 10))
          .cast("double") / 1e10 / count(lit(1))).as("cv"))
        .collect()
      // a cluster that loses all members drops out (k shrinks), matching
      // Lloyd's on empty cells
      cents = rows.groupBy(_.getInt(0)).toSeq.map { case (cl, rs) =>
        (cl, rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
      }.sortBy(_._1)
      it += 1
    }
    (assign(ein, cents), s.createDataFrame(cents).toDF("cl", "cvec"))
  }

  /** Returns (assignments: vec_id -> cluster, centroids: cluster -> vec). */
  def kmeans(e: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val (assigned, centroids) = kmeansFull(e, k, iters)
    (assigned.select(col("vec_id"), col("cl")), centroids)
  }

  /** Within-cluster sum of squared distances — the convergence metric. */
  def wss(e: DataFrame, assigned: DataFrame, centroids: DataFrame): Double =
    e.join(assigned, "vec_id").join(broadcast(centroids), "cl")
      .withColumn("d", l2(col("embedding"), col("cvec")))
      .select((col("d") * col("d")).as("d2"))
      .agg(sum(col("d2"))).collect()(0).getDouble(0)
}
