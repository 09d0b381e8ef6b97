package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** [[PairsWithinRatio]]'s CROSS-GROUP sibling: every posting carries a
  * one-bit group flag (`len << 48 | flag << 47 | id`, see
  * [[CrossPairsWithinRatio.packFlagged]]) and only pairs whose flags
  * DIFFER are generated — the incremental-dedup shape ("new batch vs
  * existing corpus", dd16), where the full kernel's new x new and
  * old x old pairs are paid for and then thrown away by a filter.
  *
  * The point of a dedicated generator instead of `pairs_within_ratio +
  * filter(flagsDiffer)`: the scan cost itself drops from O(all in-ratio
  * pairs) to O(df + cross output). The sorted postings list is SPLIT into
  * the flagged run A and the unflagged run B (each stays sorted by
  * (len, id) — the split is a stable partition of a sorted array), and
  * each a in A emits only its in-ratio window of B. Window bounds are
  * monotone in len(a) (the symmetric AllPairs ratio test: min * 10000 >=
  * max * tauScaled), so two pointers advance amortized O(|B|) across the
  * whole scan, never rescanning. Per-key work is |new| * df-window, not
  * df^2/2 — at a 10% batch rate that is an order less generated AND
  * scanned work, and for a 1% increment two orders.
  *
  * Exactness contract (mirrors [[PairsWithinRatio]], same integer-exact
  * ratio test, same saturation semantics): emitted pairs are EXACTLY the
  * cross-flag subset of what `pairs_within_ratio` would emit on the same
  * list with flags stripped — asserted pairwise in the spec. Consumers
  * unpack with id = p & [[CrossPairsWithinRatio.IdMask47]] (NOT the
  * 48-bit mask: bit 47 is the flag), len = p >>> 48; the flag rides
  * through so downstream can tell the sides apart without re-deriving.
  * Ids must be non-negative and < 2^47 (1.4e14 — not a constraint at
  * 100 TB: that is ~1e11 documents even at 1 KB each).
  */
case class CrossPairsWithinRatio(child: Expression, tau: Double)
  extends Generator with UnaryLike[Expression] with ExpectsInputTypes
  with CodegenFallback {

  require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")

  private val tauScaled: Long = math.round(tau * 10000)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType, containsNull = false))

  /** Pairs stay packed like [[PairsWithinRatio]]'s (sizes + flag ride to
    * the consumer); ordered by ID (d1p's 47-bit id < d2p's), so the
    * ordering is identical to the full kernel's and a cross-snapshot
    * pair aggregates under the same (d1, d2) key either way. */
  override def elementSchema: StructType = StructType(Seq(
    StructField("d1p", LongType, nullable = false),
    StructField("d2p", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val data = arr.asInstanceOf[ArrayData].toLongArray()
    if (data.length < 2) return Nil
    java.util.Arrays.sort(data) // packed order = (len, flag, id)
    // stable split by flag: each side keeps ascending (len, id) order
    var nA = 0
    var k = 0
    while (k < data.length) {
      if (((data(k) >>> 47) & 1L) == 1L) nA += 1; k += 1
    }
    val nB = data.length - nA
    if (nA == 0 || nB == 0) return Nil
    val a = new Array[Long](nA)
    val b = new Array[Long](nB)
    var ia = 0; var ib = 0; k = 0
    while (k < data.length) {
      if (((data(k) >>> 47) & 1L) == 1L) { a(ia) = data(k); ia += 1 }
      else { b(ib) = data(k); ib += 1 }
      k += 1
    }

    def len(p: Long): Long = p >>> 48
    def id(p: Long): Long = p & CrossPairsWithinRatio.IdMask47
    // first index of b's saturated (len >= LenCap) suffix; nB if none
    var bSat = nB
    while (bSat > 0 && len(b(bSat - 1)) >= PairsWithinRatio.LenCap) bSat -= 1

    // For each a (ascending len), the in-ratio part of b's unsaturated
    // prefix is a contiguous window [lo, hi) under the symmetric AllPairs
    // test (min * 10000 >= max * tauScaled):
    //   lb <= la side: keep iff lb * 10000 >= la * tauScaled
    //   lb >= la side: keep iff lb * tauScaled <= la * 10000
    // Both thresholds are monotone nondecreasing in la, so lo/hi only
    // move forward — amortized O(|B|) pointer work across the whole
    // list, plus O(1) per emitted pair. The saturated suffix [bSat, nB)
    // is "length unknown, keep" (same degrade-to-no-prune semantics as
    // the full kernel); a saturated a keeps all of b. The flatMap is
    // lazy but strictly in-order, so the captured lo/hi advance exactly
    // once per a.
    var lo = 0
    var hi = 0
    a.iterator.flatMap { pa =>
      val la = len(pa)
      val window: Iterator[Long] =
        if (la >= PairsWithinRatio.LenCap) b.iterator
        else {
          while (lo < bSat && len(b(lo)) * 10000L < la * tauScaled) lo += 1
          if (hi < lo) hi = lo
          while (hi < bSat && len(b(hi)) * tauScaled <= la * 10000L) hi += 1
          (lo until hi).iterator.map(b(_)) ++
            (bSat until nB).iterator.map(b(_))
        }
      window.map { pb =>
        val row = new GenericInternalRow(2)
        if (id(pa) < id(pb)) { row.update(0, pa); row.update(1, pb) }
        else { row.update(0, pb); row.update(1, pa) }
        row
      }
    }
  }

  override def prettyName: String = "cross_pairs_within_ratio"
  override protected def withNewChildInternal(newChild: Expression): CrossPairsWithinRatio =
    copy(child = newChild)
}

object CrossPairsWithinRatio {
  /** 47-bit id mask: bit 47 carries the group flag (see
    * [[packFlagged]]), bits 48..62 the saturated length. */
  val IdMask47: Long = (1L << 47) - 1

  /** `min(len, LenCap) << 48 | flag << 47 | id`. Ids must be
    * non-negative and < 2^47; `flag` is any boolean column (true = the
    * "new"/probe side). Sorting packed longs orders by (len, flag, id) —
    * the flag perturbs id-order WITHIN a length class only, which the
    * window logic never depends on. */
  def packFlagged(id: Column, setLen: Column, flag: Column): Column = {
    import org.apache.spark.sql.functions._
    shiftleft(least(setLen.cast("long"), lit(PairsWithinRatio.LenCap)), 48) +
      shiftleft(flag.cast("long"), 47) + id
  }

  def cross_pairs_within_ratio(c: Column, tau: Double): Column =
    ExpressionUtils.column(
      CrossPairsWithinRatio(ExpressionUtils.expression(c), tau))
}
