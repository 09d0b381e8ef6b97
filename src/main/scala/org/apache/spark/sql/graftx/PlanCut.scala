package org.apache.spark.sql.graftx

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD

/** Severs a materialized DataFrame's logical lineage.
  *
  * A multi-stage pipeline that persists every stage but keeps building
  * on the SAME DataFrame objects accretes the full ancestor build plan
  * inside each InMemoryRelation — and every stage that consumes a
  * parent more than once (a self-join, a decontaminate probing both its
  * input and the base corpus, a rank kernel reading its ranged relation
  * twice) MULTIPLIES the embedded subtree count. Nine stages in, a
  * single `count()` on the graft pp01 capstone planned a ~1.1M-line
  * physical tree (139k rendered InMemoryTableScans): every action paid
  * ~15 s of driver-side analysis/optimization/planning on 2k rows, the
  * cost growing exponentially per stage and independent of data size —
  * the measured sf0.1-slower-than-sf1 inversion (VERDICT r12 "what's
  * wrong" #1).
  *
  * `cut` swaps the plan for a [[LogicalRDD]] leaf over the dataframe's
  * EXECUTED physical RDD. Call it only after the frame is persisted and
  * materialized: the executed RDD then roots at the InMemoryTableScan,
  * so downstream actions read the cached blocks through a one-leaf
  * logical plan. Recomputability survives — the physical RDD lineage
  * (cache scan → build plan → parent cut RDD → …) replays on block
  * loss, unlike `localCheckpoint` which truncates it. Partitioning and
  * ordering metadata ride along (fromDataset), so a downstream
  * aggregation on a pre-partitioned frame still skips its exchange. */
object PlanCut {
  def cut(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val qe = ds.queryExecution
    classic.Dataset.ofRows(ds.sparkSession,
      LogicalRDD.fromDataset(qe.toRdd, ds, isStreaming = false))
  }
}
