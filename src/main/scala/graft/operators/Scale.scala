package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: skew-salted aggregation and bucketing helpers.
  *
  * The reference's only parallelism knob is `num_tasks` with sha1-mod
  * routing (reference src/Streaming/worker.py:256-262) — a hot key lands
  * on one task and stays there. These are the standard Spark counters to
  * that failure mode at 100 TB.
  */
object Scale {

  /** Two-phase (salted) aggregation: phase 1 aggregates on (key, salt) so
    * a hot key spreads over `salts` reducers; phase 2 merges the partials.
    * Correct for any commutative-monoid aggregate expressed as (partial,
    * merge) column pairs — here counts and sums, the common cases.
    *
    * AQE's skew handling covers joins; skewed *aggregation* keys still
    * concentrate partials on one reducer when cardinality is low — salting
    * is the fix the optimizer can't apply for you.
    */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
      aggs: (Column, String)*): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(spark_partition_id(), monotonically_increasing_id()),
        lit(salts)))
    val phase1 = salted.groupBy(key.as("__key"), col("__salt"))
      .agg(aggs.head._1.as(s"__p0"),
        aggs.tail.zipWithIndex.map { case ((c, _), i) =>
          c.as(s"__p${i + 1}")
        }: _*)
    // merge partials: counts and sums both merge by SUM
    phase1.groupBy(col("__key"))
      .agg(sum(col("__p0")).as(aggs.head._2),
        aggs.tail.zipWithIndex.map { case ((_, name), i) =>
          sum(col(s"__p${i + 1}")).as(name)
        }: _*)
      .withColumnRenamed("__key", "key")
  }

  /** Top-k rows per group via the custom whole-operator plan
    * ([[org.apache.spark.sql.graftx.TopKPerGroup]]): bounded per-group
    * heaps inside each input partition, then a shuffle carrying at most
    * k rows per (group x partition) — vs the window formulation's
    * shuffle-everything + full per-group sort. Supply a total order
    * (unique tie-break column last) for deterministic output. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], k: Int,
      orderBy: Column*): DataFrame =
    org.apache.spark.sql.graftx.TopKFunctions
      .topKPerGroup(df, groupCols, k, orderBy: _*)
}
