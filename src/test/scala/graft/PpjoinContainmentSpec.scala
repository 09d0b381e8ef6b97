package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the PPJoin prefix-filtered containment kernel
  * (Dedup.containmentPairs) emits EXACTLY the rows of the unpruned
  * inverted-index kernel (Dedup.containmentPairsUnpruned) — the prefix
  * filter must be a lossless candidate prune, not an approximation.
  *
  * The planted corpora target the places a prefix filter can silently
  * lose pairs:
  *  - boundary pairs sitting exactly at round(c/min, 6) = 0.9 (an
  *    off-by-one in tmin drops them);
  *  - a probe doc whose non-intersecting shingles are its RAREST —
  *    they fill the front of the df-ordered prefix, so the prefix
  *    budget k = n - tmin + 1 must still reach one intersecting token
  *    (the pigeonhole the filter's soundness rests on);
  *  - equal-size pairs (orientation tie broken by id);
  *  - docs with fewer capped shingles than the prefix budget;
  *  - a tightened df cap (stop-keys dropped from both kernels alike).
  */
class PpjoinContainmentSpec extends AnyFunSuite {
  private val spark = SparkTestSession()
  import spark.implicits._

  /** (doc_id, sh) index from explicit distinct-shingle sets. */
  private def idx(docs: Seq[(Long, Seq[String])]): DataFrame =
    docs.toDF("doc_id", "sh")

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  private def assertSame(docs: Seq[(Long, Seq[String])], cap: Int,
      expectNonEmpty: Boolean = true): Unit = {
    val d = idx(docs)
    val pruned = rows(graft.operators.Dedup.containmentPairs(d, cap))
    val full = rows(graft.operators.Dedup.containmentPairsUnpruned(d, cap))
    assert(pruned == full,
      s"missing=${(full -- pruned).take(5)} extra=${(pruned -- full).take(5)}")
    if (expectNonEmpty) assert(full.nonEmpty,
      "planted corpus produced no qualifying pairs — test is vacuous")
  }

  test("boundary pair at exactly round(c/min, 6) = 0.9 survives the " +
      "prefix filter, rarest-shingles-miss worst case") {
    // A: 20 shingles, B shares exactly 18 of them -> containment 0.90
    // exactly (tmin(20) = 18, prefix budget k = 3). A's two misses t1, t2
    // are made df = 2 via doc C, so they sort to the FRONT of A's
    // rarest-first prefix: the k = 3 prefix is [t1, t2, one intersecting
    // token] — the tightest configuration the pigeonhole allows.
    val shared = (3 to 20).map(i => f"s$i%02d")
    val a = Seq("t1", "t2") ++ shared // |A| = 20
    val b = shared ++ (1 to 7).map(i => f"x$i%02d") // |B| = 25, c = 18
    val c = Seq("t1", "t2") ++ (1 to 28).map(i => f"y$i%02d") // df booster
    assertSame(Seq(1L -> a, 2L -> b, 3L -> c), cap = 1000)
    // and one notch below the boundary: c = 17 must NOT pair (17/20 =
    // 0.85) — both kernels agree on the empty side too
    val b17 = shared.drop(1) ++ (1 to 8).map(i => f"x$i%02d")
    val d17 = idx(Seq(1L -> a, 2L -> b17, 3L -> c))
    assert(rows(graft.operators.Dedup.containmentPairs(d17, 1000))
      .forall { case (d1, d2, _, _) => (d1, d2) != ((1L, 2L)) })
  }

  test("equal-size pair and subset-with-few-capped-shingles") {
    // docs 1/2: equal size 10, share 9 -> 0.9 exactly (tie orientation)
    val common = (1 to 9).map(i => f"c$i%02d")
    // doc 3 subset of doc 4 but most of doc 3's shingles are singletons
    // globally (df = 1 -> excluded from capped postings): its capped
    // shingle count is below the prefix budget, so it probes with all
    val d3 = (1 to 10).map(i => f"q$i%02d")
    val d4 = d3 ++ (1 to 80).map(i => f"z$i%02d")
    assertSame(Seq(
      1L -> (common :+ "a1"), 2L -> (common :+ "b1"),
      3L -> d3, 4L -> d4), cap = 1000)
  }

  test("tiny docs: 3-shingle pairs (e = 0, prefix entirely slack) and " +
      "1-shingle docs below any threshold") {
    // n = 3: tmin = 3, e = 0 — every shared shingle must match and the
    // over-long prefix is pure PrefixSlack; n = 1 docs can only pair at
    // containment 1.0 via their single shingle
    assertSame(Seq(
      1L -> Seq("aa", "bb", "cc"), 2L -> Seq("aa", "bb", "cc"),
      3L -> Seq("aa", "bb", "zz"), 4L -> Seq("qq"), 5L -> Seq("qq"),
      6L -> Seq("aa", "bb", "cc", "dd", "ee", "ff")), cap = 1000)
  }

  test("tightened df cap: stop-shingles drop identically from both " +
      "kernels") {
    // token "hot" has df = 6 > cap = 4: it must count toward NO pair's
    // intersection; sizes stay the full set sizes. Docs 1-4 share the
    // df = 4 m-block (12/13 = 0.923 with "hot" excluded from c); docs
    // 5-6 exist only to push "hot" over the cap.
    val base = (1 to 12).map(i => f"m$i%02d")
    val docs = (1L to 4L).map(i => i -> (Seq("hot") ++ base)) ++
      (5L to 6L).map(i => i -> (Seq("hot") ++
        (1 to 12).map(j => f"u$i%d$j%02d")))
    assertSame(docs, cap = 4)
  }

  test("property: 80-doc seeded random corpora match the unpruned " +
      "kernel at default and tightened caps") {
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 60).map(i => f"v$i%02d")
    for (trial <- 1 to 3) {
      val first60: Seq[(Long, Seq[String])] = (1 to 60).map { i =>
        val n = 4 + rnd.nextInt(24)
        i.toLong -> rnd.shuffle(vocab).take(n).toSeq
      }
      val docs = first60 ++ (61 to 80).map { i =>
        // planted containment: a slice of a random earlier doc,
        // occasionally with one extra token to land near the boundary
        val base = first60(rnd.nextInt(60))._2
        val sub = base.take(math.max(3, (base.size * 0.92).toInt))
        i.toLong -> (if (rnd.nextBoolean()) sub else sub :+ "w99")
      }
      // dedupe shingle lists defensively (shuffle/take keeps distinct)
      val distinctDocs = docs.map { case (id, sh) => (id, sh.distinct) }
      assertSame(distinctDocs, cap = 1000, expectNonEmpty = trial == 1)
      assertSame(distinctDocs, cap = 6, expectNonEmpty = false)
    }
  }
}
