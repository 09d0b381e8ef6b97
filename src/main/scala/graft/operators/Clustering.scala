package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.l2

/** Lloyd's k-means over an embedding column — the real coarse quantizer
  * behind an IVF index (sim03 uses provided labels as a stand-in; this
  * builds the partition from the vectors themselves).
  *
  * Deterministic by construction: initialization takes the k lowest
  * vec_ids (no RNG), assignment ties break on the lower centroid id, and
  * per-dimension means are computed with decimal sums so results do not
  * depend on partitioning.
  *
  * Per iteration the centroid table (k x dim doubles — tiny) is collected
  * to the driver and re-broadcast as a literal, so plan lineage stays flat
  * across iterations and only k*dim values cross the network per round;
  * the corpus itself is touched once per iteration for the grouped mean.
  * The returned assignment is recomputed against the FINAL centroids, so
  * (assignments, centroids) are mutually consistent — an IVF probe that
  * assigns a query to its nearest returned centroid searches exactly the
  * inverted list its members were assigned to.
  */
object Clustering {

  private def assign(e: DataFrame, centroids: DataFrame): DataFrame = {
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("cdist").asc, col("cl").asc)
    e.crossJoin(broadcast(centroids))
      .withColumn("cdist", l2(col("embedding"), col("cvec")))
      .withColumn("r", row_number().over(wq)).filter(col("r") === 1)
      .select(col("vec_id"), col("embedding"), col("cl"))
  }

  /** Collect the (tiny) centroid table and rebuild it as a literal DF —
    * truncates the growing iteration lineage. */
  private def pinned(s: SparkSession, centroids: DataFrame): DataFrame = {
    val rows = centroids.collect()
      .map(r => (r.getAs[Int]("cl"), r.getSeq[Double](1)))
    s.createDataFrame(rows.toSeq).toDF("cl", "cvec")
  }

  /** Returns (assignments: vec_id -> cluster, centroids: cluster -> vec). */
  def kmeans(e: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(k >= 1 && iters >= 1)
    val s = e.sparkSession
    // no int cast on vec_id — ids may exceed Int range (ANSI would throw);
    // clusters are re-keyed 0..k-1 by row_number anyway
    var centroids = pinned(s, e.orderBy(col("vec_id")).limit(k)
      .withColumn("cl",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("vec_id"))) - 1).cast("int"))
      .select(col("cl"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cvec")))

    var it = 0
    while (it < iters) {
      val assigned = assign(e, centroids)
      // new centroids: per-dimension decimal-sum means (order-independent)
      centroids = pinned(s, assigned
        .select(col("cl"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cl"), col("dim"))
        .agg((sum(col("v").cast("decimal(30,10)")).cast("double") /
          count(lit(1))).as("cv"))
        .groupBy(col("cl"))
        .agg(array_sort(collect_list(struct(col("dim"), col("cv"))))
          .as("pairs"))
        .select(col("cl"), expr("transform(pairs, p -> p.cv)").as("cvec")))
      it += 1
    }
    // final assignment against the FINAL centroids
    (assign(e, centroids).select(col("vec_id"), col("cl")), centroids)
  }

  /** Within-cluster sum of squared distances — the convergence metric. */
  def wss(e: DataFrame, assigned: DataFrame, centroids: DataFrame): Double =
    e.join(assigned, "vec_id").join(broadcast(centroids), "cl")
      .withColumn("d", l2(col("embedding"), col("cvec")))
      .select((col("d") * col("d")).as("d2"))
      .agg(sum(col("d2"))).collect()(0).getDouble(0)
}
