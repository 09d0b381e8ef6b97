package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Pair generator with the AllPairs length prune built into GENERATION
  * (Bayardo et al., WWW'07): from a postings list of packed longs
  * (`len << 48 | id`, see [[PairsWithinRatio.pack]]), emits exactly the
  * ordered (d1 < d2 by id) pairs whose set-size ratio can reach a Jaccard
  * threshold `tau` — J(A,B) <= min(|A|,|B|) / max(|A|,|B|), so pairs
  * outside the ratio window are lossless drops.
  *
  * The point of doing it in the generator rather than `explode twice +
  * filter`: the double explode MATERIALIZES all df^2/2 pair rows and the
  * filter only shields the downstream aggregate (measured at sf1.0: the
  * filter formulation saved ~16% where generation-side pruning removes
  * the skipped pairs' cost entirely). Internally the list (bounded by the
  * caller's df cap, ~1e3) is sorted by packed value = (len, id), and per
  * element the scan emits its contiguous window of larger-length partners
  * within ratio plus the saturated suffix — O(sort + output), not
  * O(df^2).
  *
  * The ratio test is EXACT integer arithmetic: tau is scaled to
  * round(tau * 10000) and the comparison is `lj * tauScaled <=
  * li * 10000` — a floating `lj * tau` drops true boundary pairs (at
  * tau = 0.8, sizes 4 and 5: 0.8 * 5 rounds to 4.0000000000000002 > 4).
  * Tau is therefore treated as having at most 4 decimal digits.
  *
  * Saturation: lengths are capped at [[PairsWithinRatio.LenCap]] when
  * packed; a saturated length compares as "unknown, keep" (both the
  * window bound and membership), so oversized docs degrade to no-prune,
  * never to a wrong drop. Ids must be non-negative and < 2^48.
  */
case class PairsWithinRatio(child: Expression, tau: Double)
  extends Generator with UnaryLike[Expression] with ExpectsInputTypes
  with CodegenFallback {

  require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")

  private val tauScaled: Long = math.round(tau * 10000)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType, containsNull = false))

  /** The pair stays PACKED (`len << 48 | id`, id-ordered: d1p's id <
    * d2p's id): the set sizes ride to the consumer — letting Jaccard
    * skip the per-document size join-back (measured at sf1.0: two
    * shuffle joins over ~40M pair rows) — while the downstream
    * (d1p, d2p) aggregation shuffles and hashes two longs per row
    * instead of four. Unpack with id = p & IdMask, len = p >>> 48. */
  override def elementSchema: StructType = StructType(Seq(
    StructField("d1p", LongType, nullable = false),
    StructField("d2p", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val data = arr.asInstanceOf[ArrayData].toLongArray()
    val n = data.length
    if (n < 2) return Nil
    java.util.Arrays.sort(data) // packed order = (len, id), all positive
    // first index of the saturated (len = LenCap) suffix; n if none
    var sat = n
    while (sat > 0 && (data(sat - 1) >>> 48) >= PairsWithinRatio.LenCap)
      sat -= 1

    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      private var ready = seek()
      private def len(k: Int): Long = data(k) >>> 48
      private def id(k: Int): Long = data(k) & PairsWithinRatio.IdMask
      /** Advance (i, j) to the next valid pair; false when exhausted.
        * Valid j's for a given i are a contiguous in-ratio window
        * starting at i+1 (lengths sort ascending) plus the saturated
        * suffix [sat, n). */
      private def seek(): Boolean = {
        while (i < n - 1) {
          if (j < n) {
            val li = len(i)
            val inRatio = li >= PairsWithinRatio.LenCap ||
              len(j) >= PairsWithinRatio.LenCap ||
              len(j) * tauScaled <= li * 10000L
            if (inRatio) return true
            // past the window and unsaturated: jump to the saturated
            // suffix (or give this i up if already inside/past it)
            j = if (j < sat) sat else n
          } else {
            i += 1; j = i + 1
          }
        }
        false
      }
      override def hasNext: Boolean = ready
      override def next(): InternalRow = {
        val row = new GenericInternalRow(2)
        if (id(i) < id(j)) { row.update(0, data(i)); row.update(1, data(j)) }
        else { row.update(0, data(j)); row.update(1, data(i)) }
        j += 1
        ready = seek()
        row
      }
    }
  }

  override def prettyName: String = "pairs_within_ratio"
  override protected def withNewChildInternal(newChild: Expression): PairsWithinRatio =
    copy(child = newChild)
}

object PairsWithinRatio {
  /** Length saturation cap: 15 bits keeps packed longs positive (len
    * occupies bits 48..62; bit 63 stays 0) so a plain long sort orders by
    * (len, id). */
  val LenCap = 32767L
  val IdMask: Long = (1L << 48) - 1

  /** `min(len, LenCap) << 48 | id` — the packing [[PairsWithinRatio]]
    * consumes. Ids must be non-negative and < 2^48. */
  def pack(id: Column, setLen: Column): Column = {
    import org.apache.spark.sql.functions._
    shiftleft(least(setLen.cast("long"), lit(LenCap)), 48) + id
  }

  def pairs_within_ratio(c: Column, tau: Double): Column =
    ExpressionUtils.column(
      PairsWithinRatio(ExpressionUtils.expression(c), tau))
}
