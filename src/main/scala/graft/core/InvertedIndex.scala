package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The bounded inverted-index pair kernel shared by every "docs sharing a
  * key" operator (Jaccard shingles dd02/dd03/dd06/dd08, winnow
  * fingerprints tx05, TF-IDF terms tx08): ONE exchange groups postings
  * into per-key doc lists whose aggregation state is HARD-capped via
  * [[org.apache.spark.sql.graftx.BoundedCollectLong]] (a corpus-scale
  * stop-key can never assemble an unbounded buffer — lists that reach
  * cap+1 elements are dropped by the df filter exactly as their true
  * oversized list would be), then ordered pairs fall out of a narrow
  * double explode. One code path, verified once by dd02's oracle and the
  * bounded-collect spec; a cap or kernel change lands everywhere at once.
  */
object InvertedIndex {

  /** Keys shared by more docs than this are stop-keys: they contribute
    * quadratic pair fan-out and negligible similarity signal. */
  val StopKeyCap = 1000

  // Key width — a conscious choice: the exchange keys on the RAW key
  // (shingle string / fingerprint long), not a 64-bit hash of it.
  // Hashing would shrink shuffle keys ~3x for string shingles, but a
  // hash collision merges two postings lists and perturbs shared-item
  // counts: negligible for near-dup QUALITY at any scale, yet it breaks
  // the engine's bit-exact-vs-oracle guarantee (and at ~1e12 distinct
  // keys 64-bit collisions are a certainty, not a lottery). A deployment
  // that prefers the smaller shuffle over exactness can pre-hash the key
  // column before calling in — the kernel is key-type agnostic.

  /** Per-key doc lists `ds`, df-filtered to [minDf, cap]; aggregation
    * state bounded at cap+1 per key. `minDf = 1` keeps singleton lists
    * (tx08 needs them for norms); pair generation drops them naturally. */
  def groupedPostings(post: DataFrame, key: Column, docId: Column,
      cap: Int = StopKeyCap, minDf: Int = 2): DataFrame =
    post.groupBy(key).agg(
        org.apache.spark.sql.graftx.BoundedCollectFunctions
          .bounded_collect_long(docId, cap + 1).as("ds"))
      .filter(size(col("ds")).between(minDf, cap))

  /** Ordered (d1 < d2) pairs from each row's `ds` list; every other
    * column of the row is carried through (tx08 threads its idf weight). */
  def orderedPairs(grouped: DataFrame): DataFrame = {
    // fail at the call site, not with a distant AMBIGUOUS_REFERENCE at
    // analysis time, if a carried column collides with the pair names
    require(!grouped.columns.exists(c => c == "d1" || c == "d2"),
      s"orderedPairs emits d1/d2; rename the colliding input column " +
        s"(got: ${grouped.columns.mkString(", ")})")
    val others = grouped.columns.filter(_ != "ds").map(col).toSeq
    grouped
      .select(others :+ explode(col("ds")).as("d1") :+ col("ds"): _*)
      .select(others :+ col("d1") :+ explode(col("ds")).as("d2"): _*)
      .filter(col("d1") < col("d2"))
  }

  /** (d1, d2, c = number of shared keys) — the count-shared-items shape
    * dd02 and tx05 use. */
  def pairCounts(post: DataFrame, key: Column, docId: Column,
      cap: Int = StopKeyCap): DataFrame =
    orderedPairs(groupedPostings(post, key, docId, cap))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("c"))
}
