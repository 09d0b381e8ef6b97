package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{CrossPairsWithinRatio, PairsWithinRatio}

/** The cross-group pair generator (dd16's incremental kernel) must emit
  * EXACTLY the cross-flag subset of what the full kernel emits on the
  * same postings list with flags stripped — the equivalence that makes
  * the incremental query's oracle the full query's oracle restricted to
  * cross-snapshot pairs. Property-tested against PairsWithinRatio itself
  * (already pinned to brute force by its own spec) over random lists
  * with saturation, duplicate lengths, boundary ratios, and skewed
  * flag splits (all-new / all-old / singleton sides).
  */
class CrossPairsWithinRatioSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()

  private val Cap = PairsWithinRatio.LenCap

  private def packF(id: Long, len: Long, flag: Boolean): Long =
    (math.min(len, Cap) << 48) | (if (flag) 1L << 47 else 0L) | id

  private def packPlain(id: Long, len: Long): Long =
    (math.min(len, Cap) << 48) | id

  /** (id1, id2, n1, n2), ids ordered, via the cross generator. */
  private def runCross(items: Seq[(Long, Long, Boolean)],
      tau: Double): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Seq(items.map((packF _).tupled)).toDF("ds")
      .select(CrossPairsWithinRatio
        .cross_pairs_within_ratio(col("ds"), tau).as(Seq("d1p", "d2p")))
      .select(
        col("d1p").bitwiseAND(lit(CrossPairsWithinRatio.IdMask47)).as("d1"),
        col("d2p").bitwiseAND(lit(CrossPairsWithinRatio.IdMask47)).as("d2"),
        shiftrightunsigned(col("d1p"), 48).as("n1"),
        shiftrightunsigned(col("d2p"), 48).as("n2"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  /** The full kernel on the same items (flags stripped), filtered to
    * cross-flag pairs — the contract's right-hand side. */
  private def fullFiltered(items: Seq[(Long, Long, Boolean)],
      tau: Double): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val flagOf = items.map { case (id, _, f) => id -> f }.toMap
    Seq(items.map { case (id, len, _) => packPlain(id, len) }).toDF("ds")
      .select(PairsWithinRatio.pairs_within_ratio(col("ds"), tau)
        .as(Seq("d1p", "d2p")))
      .select(col("d1p").bitwiseAND(lit(PairsWithinRatio.IdMask)).as("d1"),
        col("d2p").bitwiseAND(lit(PairsWithinRatio.IdMask)).as("d2"),
        shiftrightunsigned(col("d1p"), 48).as("n1"),
        shiftrightunsigned(col("d2p"), 48).as("n2"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(t => flagOf(t._1) != flagOf(t._2))
      .toSet
  }

  test("boundary ratios: cross pairs at exactly tau survive, same-side drop") {
    // sizes (4,5) ratio exactly 0.8 — one cross, one same-side
    val items = Seq((1L, 4L, true), (2L, 5L, false), (3L, 4L, true),
      (4L, 5L, true))
    val got = runCross(items, 0.8)
    assert(got == fullFiltered(items, 0.8))
    val ids = got.map(t => (t._1, t._2))
    assert(ids.contains((1L, 2L)) && ids.contains((2L, 3L)))
    assert(!ids.contains((1L, 3L)) && !ids.contains((1L, 4L))) // same side
  }

  test("saturated lengths pair across groups past an out-of-ratio gap") {
    val items = Seq((1L, 10L, true), (2L, 100L, false), (3L, Cap, false),
      (4L, Cap, true))
    val got = runCross(items, 0.8)
    assert(got == fullFiltered(items, 0.8))
    val ids = got.map(t => (t._1, t._2))
    // saturated entries keep everything cross-side, including each other
    assert(ids.contains((1L, 3L)) && ids.contains((2L, 4L)) &&
      ids.contains((3L, 4L)))
    assert(!ids.contains((1L, 2L))) // unsaturated, out of ratio
    assert(!ids.contains((2L, 3L))) // same side, never emitted
  }

  test("one-sided lists emit nothing") {
    assert(runCross(Seq((1L, 10L, true), (2L, 10L, true)), 0.8).isEmpty)
    assert(runCross(Seq((1L, 10L, false), (2L, 10L, false)), 0.8).isEmpty)
    assert(runCross(Nil, 0.8).isEmpty)
    assert(runCross(Seq((1L, 10L, true)), 0.8).isEmpty)
  }

  test("matches full-kernel-filtered on random flagged lists") {
    val rnd = new scala.util.Random(43)
    Seq(0.5, 0.8, 0.9, 1.0).foreach { tau =>
      (1 to 120).foreach { t =>
        val n = 2 + rnd.nextInt(14)
        // flag rate varies per trial so skewed splits get coverage
        val flagRate = rnd.nextDouble()
        val items = (0 until n).map { i =>
          val len = if (rnd.nextInt(10) == 0) Cap + rnd.nextInt(3)
            else 1L + rnd.nextInt(40)
          (i.toLong, len.toLong, rnd.nextDouble() < flagRate)
        }
        assert(runCross(items, tau) == fullFiltered(items, tau),
          s"trial $t tau=$tau items=$items")
      }
    }
  }

  test("ids at the 47-bit boundary unpack cleanly") {
    val big = CrossPairsWithinRatio.IdMask47 // max legal id
    val items = Seq((big, 10L, true), (big - 1, 10L, false))
    val got = runCross(items, 0.8)
    assert(got == Set((big - 1, big, 10L, 10L)))
  }
}
