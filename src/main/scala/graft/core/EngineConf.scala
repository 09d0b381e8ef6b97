package graft.core

import org.apache.spark.sql.SparkSession

/** Engine-level AQE partition-sizing switches, shared by every runnable
  * main (Bench/Verify/JobProfile/PlanDump) and the test session — A/B
  * measurement plumbing for the r16 floor investigation (VERDICT r15
  * next-#2). BOTH DEFAULTS ARE THE SPARK DEFAULTS: the non-default arms
  * were measured and REJECTED as scale-unsafe, and the switches are kept
  * so the negative result is reproducible (OPTIMIZATION_r16.md):
  *
  *  - `SPARK_GRAFT_CACHED_AQE=true` sets
  *    `canChangeCachedPlanOutputPartitioning=true`, letting AQE coalesce
  *    partitions INSIDE cache materialization. At sf0.1/32 cores it cut
  *    the 24-query heavy subset 67.99 -> 60.48 s (min2 of 2 runs — the
  *    "32-task passes over MB-scale cached relations" floor is real and
  *    this is the lever that removes it). But at open sf2 the same flag
  *    REGRESSED the pair-kernel subset 44.6 -> 52.5 s (tx08 -3.2 s,
  *    dd17 -2.7 s): a coalesced cache loses its hashpartitioning(k,
  *    CPUS) output contract, so every downstream co-partitioned join
  *    that previously reused the cache's exchange re-shuffles REAL data.
  *    The sf0.1 win is a local-latency artifact; the sf2 loss is the
  *    100 TB truth. Rejected per the round's own rule (no local-only
  *    wins).
  *
  *  - `SPARK_GRAFT_PARALLELISM_FIRST=false` sets AQE's
  *    `coalescePartitions.parallelismFirst=false` (the Spark tuning
  *    guide's recommendation). Measured WITH cached-AQE at sf0.1/32c:
  *    66.86 vs 62.47 s for parallelism-first — the advisory-sized (64 MB)
  *    partitions serialize this engine's compute-dense post-shuffle
  *    stages (pair explodes over compact postings), which is also the
  *    wrong direction at scale for the same kernels. Rejected.
  */
object EngineConf {
  def apply(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "false"))
}
