package graft

import org.apache.spark.sql.execution.SparkPlan

/** Shared plan-walking helpers for the broadcast cardinality-class audit
  * (PlanAuditSpec). Separated so the walker can recurse through cached
  * plans and AQE wrappers in one place.
  */
object BroadcastAuditTool {

  /** Every node of the physical plan, recursing through InMemoryTableScan
    * cached plans (persist() hides the true build-side lineage behind an
    * InMemoryRelation) and AQE wrappers, plus subquery plans. */
  def expand(p: SparkPlan): Seq[SparkPlan] = {
    val extra: Seq[SparkPlan] = p match {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        Seq(s.relation.cachedPlan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case _ => Nil
    }
    p +: (p.children ++ extra ++ p.subqueries).flatMap(expand)
  }

  /** Scan nodes in the subtree that read one of the per-row base tables
    * (one row per document/vector/event — the relations that grow with the
    * corpus and must never be broadcast unreduced). */
  def bigTableScans(root: SparkPlan): Seq[SparkPlan] =
    expand(root).filter {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        val loc = f.relation.location.rootPaths.mkString(",")
        Seq("documents", "embeddings", "events").exists(t =>
          loc.contains(s"$t.parquet") || loc.endsWith(t))
      case _ => false
    }

  /** Does the subtree reduce per-row cardinality before the exchange?
    * Accepted reducers: any aggregate (grouped relations: profiles, stats,
    * centroids, counts), any limit/top-k, a window (rank-filter top-R), or
    * a scan-level pushed data filter beyond IsNotNull (the bounded
    * query-set contract, e.g. vec_id < 10). */
  def hasReducer(root: SparkPlan): Boolean =
    expand(root).exists {
      case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
      case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
      case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.LocalLimitExec => true
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _: org.apache.spark.sql.execution.window.WindowExec => true
      // the custom partial/final top-k operator caps output at k rows per
      // group — the same bounded-selection class as a window rank-filter
      case _: org.apache.spark.sql.graftx.TopKPerGroupExec => true
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.get("PushedFilters").exists(s =>
          s.replaceAll("IsNotNull\\([^)]*\\)", "").exists(_.isLetter))
      case _ => false
    }

  /** (exchange, offending scans) for every BroadcastExchange in the plan
    * whose build side scans a per-row base table without a reducer. */
  def offenders(root: SparkPlan): Seq[(SparkPlan, Seq[SparkPlan])] =
    expand(root).collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
          if bigTableScans(b.child).nonEmpty && !hasReducer(b.child) =>
        (b, bigTableScans(b.child))
    }
}
