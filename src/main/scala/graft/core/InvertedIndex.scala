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

  /** [[pairCounts]] with the AllPairs length prune (Bayardo et al.,
    * WWW'07): J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so for a Jaccard
    * threshold `tau` any pair whose set sizes differ by more than that
    * ratio is a lossless drop. The prune runs INSIDE pair generation
    * ([[org.apache.spark.sql.graftx.PairsWithinRatio]], a native
    * Generator): the double-explode formulation materializes all df^2/2
    * pair rows per key before any filter can act — the kernel's dominant
    * cost once per-key df grows (measured 39 s at sf1.0) — while the
    * generator sorts each (df-cap-bounded) postings list by length and
    * emits only the in-ratio windows, O(sort + output) per key.
    *
    * The set size rides IN the posting long (`len << 48 | id`,
    * [[org.apache.spark.sql.graftx.PairsWithinRatio.pack]]) so the
    * bounded-collect state stays a plain long and no join-back is needed
    * at generation time; lengths saturate at 2^15-1 where the prune
    * degrades to keep-everything, never to a wrong drop, and the ratio
    * test is exact integer arithmetic (a floating `tau * len` drops true
    * boundary pairs). Requires non-negative doc ids below 2^48.
    */
  /** Output: (d1, d2, c, n1, n2) — the sizes ride along (saturated at
    * [[org.apache.spark.sql.graftx.PairsWithinRatio.LenCap]]) so Jaccard
    * consumers need no per-document size join-back on the pair table
    * except for saturated rows. They are grouping keys only notationally:
    * each doc id has exactly one size, so (d1, d2) already determines
    * them. */
  def pairCountsLengthPruned(post: DataFrame, key: Column, docId: Column,
      len: Column, tau: Double, cap: Int = StopKeyCap): DataFrame = {
    import org.apache.spark.sql.graftx.PairsWithinRatio
    val packed = post.select(key.as("__k"),
      PairsWithinRatio.pack(docId, len).as("__pd"))
    // the (d1p, d2p) aggregation — the kernel's dominant cost at scale —
    // shuffles and hashes the PACKED pair (two longs); ids and sizes
    // unpack in a projection after the agg
    groupedPostings(packed, col("__k"), col("__pd"), cap)
      .select(PairsWithinRatio.pairs_within_ratio(col("ds"), tau)
        .as(Seq("__p1", "__p2")))
      .groupBy(col("__p1"), col("__p2"))
      .agg(count(lit(1)).as("c"))
      .select(col("__p1").bitwiseAND(lit(PairsWithinRatio.IdMask)).as("d1"),
        col("__p2").bitwiseAND(lit(PairsWithinRatio.IdMask)).as("d2"),
        col("c"),
        shiftrightunsigned(col("__p1"), 48).as("n1"),
        shiftrightunsigned(col("__p2"), 48).as("n2"))
  }

  /** [[pairCountsLengthPruned]] restricted to CROSS-group pairs: `flag`
    * marks each posting's side (true = new/probe) and only pairs whose
    * flags differ are generated — via
    * [[org.apache.spark.sql.graftx.CrossPairsWithinRatio]], which splits
    * each (still df-capped, so cap semantics are IDENTICAL to the full
    * kernel's) postings list into its flagged/unflagged runs and emits
    * per flagged element only its in-ratio window of the other side.
    * This is the incremental-dedup kernel (dd16): per-key work is
    * |new-in-key| x window, so a 1% increment pays ~1% of the full
    * kernel's pair generation instead of re-mining the corpus.
    *
    * Output matches [[pairCountsLengthPruned]]'s (d1, d2, c, n1, n2) on
    * the cross subset exactly — the flag is a pure function of the doc
    * id on every call site, so equal ids pack identically and the
    * (d1, d2) aggregation keys are unchanged. Requires ids < 2^47 (the
    * flag rides in bit 47). */
  def pairCountsLengthPrunedCross(post: DataFrame, key: Column,
      docId: Column, len: Column, flag: Column, tau: Double,
      cap: Int = StopKeyCap): DataFrame = {
    import org.apache.spark.sql.graftx.{CrossPairsWithinRatio, PairsWithinRatio}
    val packed = post.select(key.as("__k"),
      CrossPairsWithinRatio.packFlagged(docId, len, flag).as("__pd"))
    groupedPostings(packed, col("__k"), col("__pd"), cap)
      .select(CrossPairsWithinRatio
        .cross_pairs_within_ratio(col("ds"), tau)
        .as(Seq("__p1", "__p2")))
      .groupBy(col("__p1"), col("__p2"))
      .agg(count(lit(1)).as("c"))
      .select(
        col("__p1").bitwiseAND(lit(CrossPairsWithinRatio.IdMask47)).as("d1"),
        col("__p2").bitwiseAND(lit(CrossPairsWithinRatio.IdMask47)).as("d2"),
        col("c"),
        shiftrightunsigned(col("__p1"), 48).as("n1"),
        shiftrightunsigned(col("__p2"), 48).as("n2"))
  }
}
