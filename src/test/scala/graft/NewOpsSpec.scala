package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-2 operators: char-n-gram language ID, token heavy hitters +
  * count-min-sketch estimates, media embed + knn. */
class NewOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()
  val sf = "/root/testdata/sf0.001"

  test("tx09: profile language ID is diagonal-dominant on the labeled corpus") {
    val m = SparkEntry.queries("tx09_charngram_langid")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val langs = m.keys.map(_._1).toSet
    assert(langs.nonEmpty)
    // per language, the majority prediction must be the label itself —
    // the profiles are trained on this very corpus
    langs.foreach { l =>
      val right = m.getOrElse((l, l), 0L)
      val total = m.collect { case ((`l`, _), n) => n }.sum
      assert(right * 2 > total, s"lang $l: $right of $total correct")
    }
  }

  test("tx10/tx11: CMS estimates bound the exact heavy-hitter counts") {
    val rows = SparkEntry.queries("tx11_cms_token_counts")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val nTotal = SparkEntry.queries("tx10_token_heavy_hitters")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"${r.getString(0)}: CMS must never undercount")
      // eps = 1e-4 of total stream length (heavy hitters hold most of it)
      assert(est <= exact + math.ceil(nTotal * 2 * 1e-4).toLong + 1,
        s"${r.getString(0)}: est $est too far above exact $exact")
    }
  }

  test("mm04: knn output is deterministic, kind-consistent, self-excluding") {
    val df1 = SparkEntry.queries("mm04_media_embed_knn")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    spark.catalog.clearCache()
    val df2 = SparkEntry.queries("mm04_media_embed_knn")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(df1.sameElements(df2), "two runs must agree exactly")
    assert(df1.nonEmpty)
    // exactly one neighbor per media, never itself
    assert(df1.map(_._1).distinct.length == df1.length)
    assert(df1.forall { case (id, _, nb, _) => id != nb })
    // neighbor must be of the same kind (join contract)
    val kinds = df1.map(t => t._1 -> t._2).toMap
    assert(df1.forall { case (_, k, nb, _) => kinds.get(nb).forall(_ == k) })
    // cosine of nonnegative byte-sum vectors stays in [0, 1]
    assert(df1.forall { case (_, _, _, s) => s >= 0.0 && s <= 1.000001 })
  }
}
