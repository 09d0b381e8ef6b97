package org.apache.spark.sql.graftx

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.unsafe.Platform
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
  *
  * `dedupExprs` (optional): top-k DISTINCT-on-key selection. Rows agreeing
  * on the dedup key within a group are collapsed to one representative
  * INSIDE the bounded heaps — the caller contract is that such rows are
  * identical under the sort order (e.g. LSH candidate pairs colliding in
  * several hash tables: the rescore is deterministic, so every duplicate
  * carries the same score). This replaces the classic
  * `groupBy(pair).agg(max)` pre-dedup, whose final hash aggregate keys
  * the full pair domain — the ONE unbounded exchange in a kNN-graph plan.
  * With the dedup folded into the heaps, nothing in the plan holds more
  * than (groups-in-partition × k) rows: duplicates die in the partial
  * pass where they arise, the exchange still carries ≤ k rows per
  * (group × input-partition), and the final pass dedups across
  * partitions. Soundness of partial pruning is unchanged: a dropped row
  * is either a duplicate of a retained row (same key, identical order —
  * its representative survives) or is beaten by k rows with k DISTINCT
  * keys none equal to its own, so it cannot be in the global top-k
  * distinct.
  */
case class TopKPerGroup(groupExprs: Seq[Expression], sortOrder: Seq[SortOrder],
    k: Int, child: LogicalPlan,
    dedupExprs: Seq[Expression] = Nil) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder], k: Int, partial: Boolean, child: SparkPlan,
    dedupExprs: Seq[Expression] = Nil)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override def outputPartitioning = child.outputPartitioning

  /** Per-group bounded selection state: plain k-heap, or k-heap +
    * key-set when dedup keys are configured. */
  private sealed trait GroupHeap {
    def add(row: UnsafeRow): Unit
    def rows: Iterator[UnsafeRow]
  }
  private final class PlainHeap(kB: Int, keep: Ordering[UnsafeRow])
      extends GroupHeap {
    private val q = new BoundedPriorityQueue[UnsafeRow](kB)(keep)
    def add(row: UnsafeRow): Unit = q += row.copy()
    def rows: Iterator[UnsafeRow] = q.iterator
  }
  /** Arena heap for FIXED-WIDTH row schemas (every output column a
    * fixed-length type, <= 64 fields): the k retained rows live as raw
    * bytes in one per-group byte[], compared in place through two shared
    * pointer UnsafeRows — no per-row objects, no queue nodes, no key
    * set. Steady state allocates NOTHING (reject-below-worst is one
    * comparison; accept overwrites the worst slot in place), which is
    * what lets a partition hold 10^5-group state without the ~200 B/row
    * object tax that OOM'd the 32-thread/8 GiB sim09 sf4 run. k is
    * selection-sized (<= ~100), so worst-tracking and dedup are linear
    * scans — cache-resident and branch-friendly at this size, cheaper
    * than heap/hash maintenance. Dedup compares the key columns' raw
    * 8-byte words (writers zero-pad sub-word values; floating dedup
    * keys are routed to the object heap by eligibility, so bit-compare
    * is exact). */
  private final class CompactHeap(kB: Int, rowSize: Int,
      rank: Ordering[UnsafeRow], dedupOrds: Array[Int],
      sA: UnsafeRow, sB: UnsafeRow) extends GroupHeap {
    private val arena = new Array[Byte](kB * rowSize)
    private var size = 0
    private var worst = -1
    private def point(s: UnsafeRow, slot: Int): UnsafeRow = {
      s.pointTo(arena,
        Platform.BYTE_ARRAY_OFFSET + slot.toLong * rowSize, rowSize)
      s
    }
    // field word of a slot: 8 B null bitset (<= 64 fields), then 8 B words
    private def word(slot: Int, ord: Int): Long =
      Platform.getLong(arena,
        Platform.BYTE_ARRAY_OFFSET + slot.toLong * rowSize + 8L + ord * 8L)
    private def nullAt(slot: Int, ord: Int): Boolean =
      (Platform.getLong(arena,
        Platform.BYTE_ARRAY_OFFSET + slot.toLong * rowSize)
        & (1L << ord)) != 0
    private def sameKey(row: UnsafeRow, slot: Int): Boolean = {
      var i = 0
      while (i < dedupOrds.length) {
        val o = dedupOrds(i)
        val rn = row.isNullAt(o)
        if (rn != nullAt(slot, o)) return false
        if (!rn && row.getLong(o) != word(slot, o)) return false
        i += 1
      }
      true
    }
    private def copyIn(row: UnsafeRow, slot: Int): Unit =
      Platform.copyMemory(row.getBaseObject, row.getBaseOffset, arena,
        Platform.BYTE_ARRAY_OFFSET + slot.toLong * rowSize, rowSize)
    def add(row: UnsafeRow): Unit = {
      // O(1) fast path first: a row at-or-below the worst retained can
      // never enter — and if it is a duplicate, its twin is retained and
      // identical, so skipping the dedup scan is sound either way
      if (size == kB && rank.compare(row, point(sB, worst)) >= 0) return
      if (dedupOrds.length > 0) {
        var s = 0
        while (s < size) { if (sameKey(row, s)) return; s += 1 }
      }
      if (size < kB) {
        copyIn(row, size)
        if (worst < 0 ||
            rank.compare(point(sA, size), point(sB, worst)) > 0)
          worst = size
        size += 1
      } else {
        copyIn(row, worst)
        worst = 0
        var s = 1
        while (s < kB) {
          if (rank.compare(point(sA, s), point(sB, worst)) > 0) worst = s
          s += 1
        }
      }
    }
    def rows: Iterator[UnsafeRow] =
      (0 until size).iterator.map(s => point(sA, s).copy())
  }
  /** Head of the queue is the current WORST retained row (comparator =
    * reverse rank); the key set mirrors the heap's dedup keys exactly —
    * every poll removes the evicted row's key, so the heap can never
    * hold two rows of one key and a duplicate of an EVICTED row is
    * re-considered (and re-evicted, it compares identical) rather than
    * wrongly suppressed. Fallback tier for var-width schemas; fixed-width
    * rows take [[CompactHeap]]. */
  private final class DedupHeap(kB: Int, rank: Ordering[UnsafeRow],
      keyOf: UnsafeProjection) extends GroupHeap {
    private val q = new java.util.PriorityQueue[UnsafeRow](
      kB, rank.reverse)
    private val keys = new java.util.HashSet[UnsafeRow]()
    def add(row: UnsafeRow): Unit = {
      val key = keyOf(row) // projection buffer is reused — copy before
      if (!keys.contains(key)) { //   any further projection call
        if (q.size() < kB) {
          val kc = key.copy()
          q.add(row.copy()); keys.add(kc)
        } else if (rank.compare(row, q.peek()) < 0) {
          val kc = key.copy()
          keys.remove(keyOf(q.poll()))
          q.add(row.copy()); keys.add(kc)
        }
      }
    }
    def rows: Iterator[UnsafeRow] = {
      import scala.jdk.CollectionConverters._
      q.iterator().asScala
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprsB = groupExprs
    val sortOrderB = sortOrder
    val dedupExprsB = dedupExprs
    val kB = k
    val partialB = partial
    val childOutput = child.output
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(groupExprsB, childOutput)
      val dedupProj = if (dedupExprsB.isEmpty) null
        else UnsafeProjection.create(dedupExprsB, childOutput)
      // rank comparator: row1 "less than" row2 = row1 sorts first. The
      // bounded queue keeps its k LARGEST per its ordering, so feed it the
      // REVERSE: it then retains the k first-sorting rows and evicts the
      // current worst in O(log k).
      val rank = RowOrdering.create(sortOrderB, childOutput)
      val keep = rank.reverse
      // CompactHeap eligibility: all columns fixed-length, one null
      // bitset word, and every dedup key a direct non-floating column
      // reference (bit-compare exactness; floats arrive wrapped in
      // NormalizeNaNAndZero and fall through to the object tier).
      val fixedWidth = childOutput.length <= 64 &&
        childOutput.forall(a => UnsafeRow.isFixedLength(a.dataType))
      val dedupOrds: Array[Int] =
        if (dedupExprsB.isEmpty) Array.emptyIntArray
        else {
          val ords = dedupExprsB.map {
            case a: Attribute if !a.dataType.isInstanceOf[
                org.apache.spark.sql.types.FractionalType] =>
              childOutput.indexWhere(_.exprId == a.exprId)
            case _ => -1
          }
          if (ords.forall(_ >= 0)) ords.toArray else null // null = not ok
        }
      val compactOk = fixedWidth && dedupOrds != null
      val sA = new UnsafeRow(childOutput.length)
      val sB = new UnsafeRow(childOutput.length)
      var rowSize = -1 // fixed-width schema: constant, read off row 1
      def newHeap(): GroupHeap =
        if (compactOk)
          new CompactHeap(kB, rowSize,
            rank.asInstanceOf[Ordering[UnsafeRow]], dedupOrds, sA, sB)
        else if (dedupProj == null)
          new PlainHeap(kB, keep.asInstanceOf[Ordering[UnsafeRow]])
        else
          new DedupHeap(kB, rank.asInstanceOf[Ordering[UnsafeRow]], dedupProj)
      val heaps = new java.util.HashMap[UnsafeRow, GroupHeap]()
      // Memory bound for the PARTIAL pass: a per-task BYTE budget
      // (heap/4 split across the JVM's task slots — see
      // partialBudgetBytes), converted to a group cap from the first
      // row's actual width, and never above the legacy 4M-row cap. Rows
      // of further groups PASS THROUGH un-pruned — the partial pass is an
      // exchange-volume optimization, never required for correctness (the
      // final pass re-prunes every group), so degradation is graceful
      // where Spark's hash aggregate would have to spill. A row-count cap
      // alone was NOT graceful: at 32 concurrent tasks x 4M rows x
      // ~200 B/retained row the partial state alone exceeds an 8 GiB
      // heap (the r10 sim09 sf4 OOM decomposed to exactly this stage).
      // The final pass takes no cap: its retained state is its own
      // output (<= k rows per group of its exchange-assigned groups),
      // the irreducible result size.
      var maxGroups = if (partialB) -1 else Int.MaxValue // partial: lazy
      def resolveMaxGroups(first: UnsafeRow): Unit = {
        if (rowSize < 0) rowSize = first.getSizeInBytes
        if (maxGroups >= 0) return
        // Per-group estimate by tier. Compact: the arena plus ~160 B
        // (byte[] header, map entry, key row, heap object). Object tier:
        // ~160 B/row of UnsafeRow + queue-node + (dedup) key-set tax on
        // top of the payload. The budget is a safety bound, not an
        // accounting exercise.
        val perGroup =
          if (compactOk) kB.toLong * rowSize + 160L
          else kB.toLong * (rowSize + 160L) + 160L
        maxGroups = math.max(1L, math.min(
          TopKPerGroupExec.maxPartialGroups(kB).toLong,
          TopKPerGroupExec.partialBudgetBytes / perGroup)).toInt
      }
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
            resolveMaxGroups(row)
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
                heap = newHeap()
                heaps.put(key.copy(), heap)
              }
              heap.add(row)
            }
          }
          if (pending == null && flush == null)
            flush = heaps.values().iterator().asScala.flatMap(_.rows)
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
  /** Retained-row ceiling for one partial-pass partition: heaps hold at
    * most ~MaxPartialRows rows total, so the per-group cap adapts to k
    * (k=1 -> 4M groups, k=100 -> 40k groups). Beyond it, new groups stream
    * through unpruned rather than grow the map. The byte budget below is
    * usually the binding constraint; this stays as an absolute ceiling. */
  val MaxPartialRows: Int =
    Integer.getInteger("graft.topk.maxPartialRows", 4 << 20)
  def maxPartialGroups(k: Int): Int = math.max(1, MaxPartialRows / k)

  /** Per-TASK retained-byte budget for the partial pass: a third of the
    * JVM heap divided by the task slots sharing it (executor JVMs run
    * one task per core; local[n] runs n task threads in one JVM — both
    * give availableProcessors ~ slots). Sized so ALL concurrently
    * running partial passes together hold <= heap/3, leaving Spark's own
    * execution/storage pools the rest — the property a fixed row cap
    * cannot give, because it is blind to row width and to how many
    * siblings are running. heap/3 over heap/4 is an A/B'd choice
    * (sim09 sf4/8g/32 slots: 36.4 s at heap/4 -> 30.3 s at heap/3,
    * flat at heap/2 — retention saturates), defensible because compact
    * heaps hold REAL arena bytes, not object churn.
    * Override: -Dgraft.topk.partialBudgetBytes. */
  lazy val partialBudgetBytes: Long = {
    val prop = java.lang.Long.getLong("graft.topk.partialBudgetBytes", 0L)
    if (prop > 0L) prop
    else math.max(16L << 20, Runtime.getRuntime.maxMemory / 3 / taskSlots)
  }

  /** How many groups one partial-pass task can hold fully retained
    * under the byte budget, for a fixed-width row of `rowBytes` — the
    * number callers use to decide whether a single partial pass covers
    * their group domain or the work should be SLICED by group hash so
    * every slice is fully covered (sim09's kNN-graph selection: beyond
    * coverage, rows of unseen groups stream to the exchange un-pruned,
    * and at 800k sources that pass-through exchange exceeded a local
    * host's disk outright — see Similarity.knnGraphLsh's slicing note). */
  def coveredPartialGroups(k: Int, rowBytes: Int): Int =
    math.max(1, math.min(maxPartialGroups(k).toLong,
      partialBudgetBytes / (k.toLong * rowBytes + 160L)).toInt)

  /** Concurrent task slots sharing this JVM's heap: local[n]'s n, or
    * executor cores / task cpus — availableProcessors is only the LAST
    * fallback (no SparkEnv, unparsable master), because it overstates
    * slots whenever the JVM runs fewer tasks than machine cores
    * (local[4] on a 64-core host, spark.task.cpus > 1), which would
    * silently undersize the per-task budget by that ratio. */
  private[graftx] def taskSlots: Int = {
    val cores = Runtime.getRuntime.availableProcessors
    val byConf = Option(org.apache.spark.SparkEnv.get).flatMap { env =>
      val conf = env.conf
      conf.getOption("spark.master") match {
        case Some(m) if m.startsWith("local") =>
          // local / local[n] / local[*] / local[n, maxFailures]
          """local\[(\d+|\*)""".r.findFirstMatchIn(m)
            .map(g => if (g.group(1) == "*") cores else g.group(1).toInt)
            .orElse(Some(1))
        case Some(_) =>
          Some(conf.getInt("spark.executor.cores", cores) /
            math.max(1, conf.getInt("spark.task.cpus", 1)))
        case None => None
      }
    }
    math.max(1, byConf.getOrElse(cores))
  }
}

/** Plans [[TopKPerGroup]] as partial -> (exchange via EnsureRequirements)
  * -> final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, so, k, child, dd) =>
      TopKPerGroupExec(g, so, k, partial = false,
        TopKPerGroupExec(g, so, k, partial = true, planLater(child), dd),
        dd) :: Nil
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
      orderBy: Column*): DataFrame =
    topKPerGroupDistinct(df, groupCols, k, Nil, orderBy: _*)

  /** Top-k DISTINCT-on-`dedupCols` rows per group. Contract: rows equal
    * on (group, dedup key) must be identical under `orderBy` — the
    * operator keeps one representative inside its bounded heaps, which
    * removes the `groupBy(key).agg(max)` pre-dedup exchange a caller
    * would otherwise need (see [[TopKPerGroup]]'s scaladoc for the
    * soundness argument). */
  def topKPerGroupDistinct(df: DataFrame, groupCols: Seq[String], k: Int,
      dedupCols: Seq[String], orderBy: Column*): DataFrame = {
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
      TopKPerGroup(groupCols.map(c => normalized(attr(c))), so, k, child,
        dedupCols.map(c => normalized(attr(c)))))
  }
}
