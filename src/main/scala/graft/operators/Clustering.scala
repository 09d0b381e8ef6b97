package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.l2

/** Lloyd's k-means over an embedding column — the real coarse quantizer
  * behind an IVF index (sim03 uses provided labels as a stand-in; this
  * builds the partition from the vectors themselves).
  *
  * Deterministic by construction: initialization takes the k lowest
  * vec_ids (no RNG), assignment ties break on the lower centroid id, and
  * per-dimension means are computed with decimal sums so results do not
  * depend on partitioning. Each iteration is two shuffles (assign is
  * map-side against broadcast centroids; update is one grouped aggregate
  * over (cluster, dim)) — the standard distributed k-means shape that
  * holds at any corpus size since only k*dim values cross the network per
  * round.
  */
object Clustering {

  /** Returns (assignments: vec_id -> cluster, centroids: cluster -> vec). */
  def kmeans(e: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(k >= 1 && iters >= 1)
    var centroids = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").cast("int").as("cl"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cvec"))
      // re-key clusters to 0..k-1 deterministically
      .withColumn("cl",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cl"))) - 1).cast("int"))

    var assigned: DataFrame = null
    var it = 0
    while (it < iters) {
      val wq = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id"))
        .orderBy(col("cdist").asc, col("cl").asc)
      assigned = e.crossJoin(broadcast(centroids))
        .withColumn("cdist", l2(col("embedding"), col("cvec")))
        .withColumn("r", row_number().over(wq)).filter(col("r") === 1)
        .select(col("vec_id"), col("embedding"), col("cl"))
      // new centroids: per-dimension decimal-sum means (order-independent)
      centroids = assigned
        .select(col("cl"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cl"), col("dim"))
        .agg((sum(col("v").cast("decimal(30,10)")).cast("double") /
          count(lit(1))).as("cv"))
        .groupBy(col("cl"))
        .agg(array_sort(collect_list(struct(col("dim"), col("cv"))))
          .as("pairs"))
        .select(col("cl"), expr("transform(pairs, p -> p.cv)").as("cvec"))
      it += 1
    }
    (assigned.select(col("vec_id"), col("cl")), centroids)
  }

  /** Within-cluster sum of squared distances — the convergence metric. */
  def wss(e: DataFrame, assigned: DataFrame, centroids: DataFrame): Double =
    e.join(assigned, "vec_id").join(broadcast(centroids), "cl")
      .select((l2(col("embedding"), col("cvec")) *
        l2(col("embedding"), col("cvec"))).as("d2"))
      .agg(sum(col("d2"))).collect()(0).getDouble(0)
}
