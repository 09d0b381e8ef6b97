package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.PairsWithinRatio

/** The pair generator must emit EXACTLY the brute-force in-ratio pair set
  * — it feeds dd02's oracle-checked Jaccard counts, so a wrong drop is a
  * correctness bug, not a recall trade. Property-tested against a naive
  * reference over random postings lists, with the adversarial cases
  * pinned: exact boundary ratios (where floating tau*len drops true
  * pairs), saturated lengths, and duplicate lengths.
  */
class PairsWithinRatioSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()

  private def run(packed: Seq[Long], tau: Double): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Seq(packed).toDF("ds")
      .select(PairsWithinRatio.pairs_within_ratio(col("ds"), tau)
        .as(Seq("d1p", "d2p")))
      .select(col("d1p").bitwiseAND(lit(PairsWithinRatio.IdMask)).as("d1"),
        col("d2p").bitwiseAND(lit(PairsWithinRatio.IdMask)).as("d2"),
        shiftrightunsigned(col("d1p"), 48).as("n1"),
        shiftrightunsigned(col("d2p"), 48).as("n2"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  /** expects lengths pre-clamped to LenCap; n1/n2 aligned with id order */
  private def reference(items: Seq[(Long, Long)], tau: Double): Set[(Long, Long, Long, Long)] = {
    val ts = math.round(tau * 10000)
    (for {
      (a, la) <- items; (b, lb) <- items if a < b
      lo = math.min(la, lb); hi = math.max(la, lb)
      if lo >= PairsWithinRatio.LenCap || hi >= PairsWithinRatio.LenCap ||
        hi * ts <= lo * 10000L
    } yield (a, b, la, lb)).toSet
  }

  private def pack(id: Long, len: Long): Long =
    (math.min(len, PairsWithinRatio.LenCap) << 48) | id

  test("exact 0.8 boundary pairs survive (floating tau*len would drop them)") {
    // sizes (4,5), (12,15), (16,20): ratio exactly 0.8
    val items = Seq((1L, 4L), (2L, 5L), (3L, 12L), (4L, 15L),
      (5L, 16L), (6L, 20L))
    val got = run(items.map((pack _).tupled), 0.8)
    assert(got == reference(items, 0.8))
    val ids = got.map(t => (t._1, t._2))
    assert(ids.contains((1L, 2L)) && ids.contains((3L, 4L)) &&
      ids.contains((5L, 6L)))
    // sizes ride along, aligned with id order
    assert(got.contains((1L, 2L, 4L, 5L)))
    // and out-of-ratio pairs are dropped: 4/12 and 5/12 < 0.8
    assert(!ids.contains((1L, 3L)) && !ids.contains((2L, 3L)))
  }

  test("saturated lengths always pair, even past an out-of-ratio gap") {
    // unsaturated 10 with gap lengths 100 (out of ratio) then a saturated
    // entry: (1,3) must survive the jump over 2
    val items = Seq((1L, 10L), (2L, 100L), (3L, PairsWithinRatio.LenCap))
    val got = run(items.map((pack _).tupled), 0.8)
    assert(got == reference(items, 0.8))
    val ids = got.map(t => (t._1, t._2))
    assert(ids.contains((1L, 3L)) && ids.contains((2L, 3L)))
    assert(!ids.contains((1L, 2L)))
  }

  test("matches brute force on random lists (2000 trials, batched per tau)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    Seq(0.5, 0.8, 0.9, 1.0).foreach { tau =>
      val trials = (1 to 500).map { t =>
        val n = 2 + rnd.nextInt(12)
        val items = (0 until n).map { i =>
          val len = if (rnd.nextInt(10) == 0)
            PairsWithinRatio.LenCap + rnd.nextInt(3)
          else 1L + rnd.nextInt(40)
          (i.toLong, len.toLong)
        }
        t -> items
      }
      val got = trials.map { case (t, items) => (t, items.map {
          case (id, l) => pack(id, l) }) }
        .toDF("trial", "ds")
        .select(col("trial"),
          PairsWithinRatio.pairs_within_ratio(col("ds"), tau)
            .as(Seq("d1p", "d2p")))
        .select(col("trial"),
          col("d1p").bitwiseAND(lit(PairsWithinRatio.IdMask)).as("d1"),
          col("d2p").bitwiseAND(lit(PairsWithinRatio.IdMask)).as("d2"),
          shiftrightunsigned(col("d1p"), 48).as("n1"),
          shiftrightunsigned(col("d2p"), 48).as("n2"))
        .collect()
        .groupBy(_.getInt(0))
        .view.mapValues(_.map(r =>
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet)
        .toMap
      trials.foreach { case (t, items) =>
        val want = reference(items.map { case (id, l) =>
          (id, math.min(l, PairsWithinRatio.LenCap)) }, tau)
        assert(got.getOrElse(t, Set.empty) == want,
          s"trial $t tau=$tau items=$items")
      }
    }
  }

  test("empty, singleton, and null-free inputs") {
    assert(run(Nil, 0.8).isEmpty)
    assert(run(Seq(pack(7, 10)), 0.8).isEmpty)
  }
}
