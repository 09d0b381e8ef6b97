package org.apache.spark.sql.graftx

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.util.BoundedPriorityQueue

/** Whole-operator custom plan: top-k rows per group.
  *
  * The composable formulation — `row_number() OVER (PARTITION BY g ORDER BY
  * o) <= k` — shuffles EVERY row to its group's reducer and fully sorts
  * each group, O(n log n) exchange+sort on the whole input. This operator
  * plans instead as
  *
  *   TopKPerGroupExec(final) <- Exchange(hash by g) <- TopKPerGroupExec(partial)
  *
  * where the partial pass keeps a bounded k-heap per group inside each
  * input partition, so the exchange carries at most k rows per (group x
  * input-partition) and nothing is ever fully sorted. At 100 TB with
  * k=10 this is the difference between shuffling the corpus and shuffling
  * a rounding error of it — the same partial/final contract Spark's own
  * aggregates use, expressed as a custom operator because Catalyst has no
  * logical node for "bounded per-group selection" (TakeOrderedAndProject
  * is global-only).
  *
  * This is the tier-(c) extension path (SURVEY.md §7.3): a logical node +
  * planner strategy + physical operator, registered per session (no
  * rewrite Rule is needed — the node is constructed explicitly by the API,
  * not pattern-matched out of user plans).
  *
  * Semantics: ties beyond position k are broken by the caller supplying a
  * total order (include a unique column last); with a total order the
  * result is deterministic and equals the window formulation row-for-row.
  */
case class TopKPerGroup(groupExprs: Seq[Expression], sortOrder: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder], k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprsB = groupExprs
    val sortOrderB = sortOrder
    val kB = k
    val partialB = partial
    val childOutput = child.output
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(groupExprsB, childOutput)
      // rank comparator: row1 "less than" row2 = row1 sorts first. The
      // bounded queue keeps its k LARGEST per its ordering, so feed it the
      // REVERSE: it then retains the k first-sorting rows and evicts the
      // current worst in O(log k).
      val rank = RowOrdering.create(sortOrderB, childOutput)
      val keep = rank.reverse
      val heaps = new java.util.HashMap[UnsafeRow, BoundedPriorityQueue[UnsafeRow]]()
      // Memory bound for the PARTIAL pass: at most MaxPartialGroups heaps
      // (~ MaxPartialGroups * k retained rows) per input partition. Rows
      // of further groups PASS THROUGH un-pruned — the partial pass is an
      // exchange-volume optimization, never required for correctness (the
      // final pass re-prunes every group), so degradation is graceful
      // where Spark's hash aggregate would have to spill. The final pass
      // takes no such cap: its retained state is its own output (<= k rows
      // per group of its exchange-assigned groups), the irreducible
      // result size.
      val maxGroups = if (partialB) TopKPerGroupExec.maxPartialGroups(kB)
                      else Int.MaxValue
      import scala.jdk.CollectionConverters._
      // Lazy pump: overflow rows are STREAMED out the moment they appear
      // (no buffering — that would just re-create the unbounded map), the
      // retained heaps flush after the input is exhausted.
      new Iterator[InternalRow] {
        private var flush: Iterator[InternalRow] = null
        private var pending: InternalRow = null
        private def pump(): Unit = {
          while (pending == null && iter.hasNext) {
            val row = iter.next().asInstanceOf[UnsafeRow]
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null && heaps.size() >= maxGroups) {
              // cap reached, unseen group: forward un-pruned. Copied — the
              // child iterator may reuse the UnsafeRow backing buffer, and
              // a buffering parent (sort, codegen consumer) must not see it
              // mutate. One copy per overflow row is cheap vs shuffle I/O.
              pending = row.copy()
            } else {
              if (heap == null) {
                heap = new BoundedPriorityQueue[UnsafeRow](kB)(
                  keep.asInstanceOf[Ordering[UnsafeRow]])
                heaps.put(key.copy(), heap)
              }
              heap += row.copy()
            }
          }
          if (pending == null && flush == null)
            flush = heaps.values().iterator().asScala.flatMap(_.iterator)
        }
        override def hasNext: Boolean = {
          pump(); pending != null || flush.hasNext
        }
        override def next(): InternalRow = {
          pump()
          if (pending != null) { val r = pending; pending = null; r }
          else flush.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** Retained-row budget for one partial-pass partition: heaps hold at most
    * ~MaxPartialRows rows total, so the per-group cap adapts to k
    * (k=1 -> 4M groups, k=100 -> 40k groups). Beyond it, new groups stream
    * through unpruned rather than grow the map. */
  val MaxPartialRows: Int = 4 << 20
  def maxPartialGroups(k: Int): Int = math.max(1, MaxPartialRows / k)
}

/** Plans [[TopKPerGroup]] as partial -> (exchange via EnsureRequirements)
  * -> final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, so, k, child) =>
      TopKPerGroupExec(g, so, k, partial = false,
        TopKPerGroupExec(g, so, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKFunctions {
  /** Top-k rows per group, ordered by `orderBy` (include a unique
    * tie-break column last for deterministic output). Self-registering:
    * installs [[TopKStrategy]] on the session if absent.
    *
    * Column -> resolved catalyst SortOrder goes through the analyzer (a
    * throwaway `df.sort` plan is analyzed and its order harvested) — the
    * Column/Expression bridge does not resolve or convert sort nodes
    * itself in Spark 4's split API. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], k: Int,
      orderBy: Column*): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val sortPlan = df.sort(orderBy: _*).queryExecution.analyzed
    val (so, child) = sortPlan match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort
          if s.child.output == df.queryExecution.analyzed.output =>
        (s.order, s.child)
      case other => throw new IllegalArgumentException(
        "orderBy must be plain (asc/desc) column references; got plan " +
          other.nodeName)
    }
    val resolver = spark.sessionState.analyzer.resolver
    def attr(name: String): Attribute =
      child.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name).mkString(",")}"))
    // Catalyst's NormalizeFloatingNumbers rule only rewrites Aggregate/
    // Window/Join keys, not custom nodes — normalize float/double group
    // keys here or 0.0 / -0.0 and distinct NaN bit patterns would land in
    // different groups AND different hash partitions.
    def normalized(a: Attribute): Expression = a.dataType match {
      case org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType =>
        org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero(a)
      case _ => a
    }
    org.apache.spark.sql.classic.Dataset.ofRows(spark,
      TopKPerGroup(groupCols.map(c => normalized(attr(c))), so, k, child))
  }
}
