package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ev19 Z-order layout census. The DuckDB oracle replays the same
  * Morton arithmetic; this spec pins what oracle equality cannot — the
  * bit interleave against an independent pure-Scala recompute, the
  * equal-size file cut, and the LOCALITY claim itself: z-ordered files
  * must bound the trailing dimension where a hierarchical sort cannot. */
class LayoutSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()
  val sf = "/root/testdata/sf0.001"

  private def morton(u: Long, t: Long): Long =
    (0 until 16).map(i =>
      (((u >> i) & 1L) << (2 * i + 1)) | (((t >> i) & 1L) << (2 * i))).sum

  private def raw = graft.core.Tables(spark, sf, "events")
    .selectExpr("event_id", "user_id & 65535 AS u",
      "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)" +
        " & 65535 AS t")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("ev19: census equals the pure-Scala Morton replay " +
      "(interleave, rank cut, extents)") {
    val rows = raw
    val n = rows.length.toLong
    val want = rows
      .map { case (id, u, t) => (morton(u, t), id, u, t) }
      .sortBy(r => (r._1, r._2))
      .zipWithIndex
      .groupBy { case (_, i) => i.toLong * 64L / n }
      .map { case (b, m) =>
        val us = m.map(_._1._3); val ts = m.map(_._1._4)
        (b, m.length.toLong, us.distinct.length.toLong,
          us.max - us.min, ts.max - ts.min)
      }.toSet
    val got = SparkEntry.queries("ev19_zorder_layout")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    assert(got.toSeq.map(_._2).sum == n)
  }

  test("ev19: z-ordered files bound BOTH dimensions — the locality a " +
      "single-column sort cannot give the trailing dim") {
    val rows = raw
    val uRange = rows.map(_._2).max - rows.map(_._2).min
    val tRange = rows.map(_._3).max - rows.map(_._3).min
    val got = SparkEntry.queries("ev19_zorder_layout")(spark, sf).collect()
    // hierarchical (u, t) sort: within one u every file spans ~all of t.
    // z-order: the MEAN per-file span must be materially below the full
    // range in BOTH dims (each dim individually can't beat a dedicated
    // sort on itself — the point is bounding the two at once).
    val meanU = got.map(_.getLong(3)).sum.toDouble / got.length
    val meanT = got.map(_.getLong(4)).sum.toDouble / got.length
    assert(meanU <= 0.75 * uRange, s"mean user span $meanU vs $uRange")
    assert(meanT <= 0.75 * tRange, s"mean day span $meanT vs $tRange")
  }
}
