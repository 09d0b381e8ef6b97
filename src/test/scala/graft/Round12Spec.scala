package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 additions: ExactSubstr-style duplicated-span extraction
  * (dd18), the event transition matrix (ev18), and the document-frequency
  * spectrum (tx27). All three carry DuckDB oracles (the bit-exactness
  * gate); these specs pin what oracle equality cannot express — span
  * MAXIMALITY against an independent brute-force recompute, probability
  * normalization, and histogram mass conservation. */
class Round12Spec extends AnyFunSuite {

  lazy val spark = SparkTestSession()
  val sf = "/root/testdata/sf0.001"

  // ---- dd18 ---------------------------------------------------------

  /** Independent single-machine recompute of maximal duplicated spans:
    * every L-token window, grams in >= 2 distinct docs, consecutive
    * duplicated positions merged into maximal islands. */
  private def bruteSpans(L: Int): Set[(Long, Long, Long, Long)] = {
    val docs = graft.core.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
      .filter(_._2.length >= L)
    val gramDocs = new java.util.HashMap[String, java.util.HashSet[Long]]()
    docs.foreach { case (id, w) =>
      (0 to w.length - L).foreach { p =>
        gramDocs.computeIfAbsent(w.slice(p, p + L).mkString(" "),
          _ => new java.util.HashSet[Long]()).add(id)
      }
    }
    docs.flatMap { case (id, w) =>
      val dupPos = (0 to w.length - L).filter(p =>
        gramDocs.get(w.slice(p, p + L).mkString(" ")).size >= 2)
      // merge consecutive positions into maximal islands
      dupPos.foldLeft(List.empty[(Int, Int)]) {
        case ((a, b) :: rest, p) if p == b + 1 => (a, p) :: rest
        case (acc, p)                          => (p, p) :: acc
      }.map { case (a, b) =>
        (id, a.toLong, (b + L - 1).toLong, (b - a + L).toLong)
      }
    }.toSet
  }

  test("dd18: spans equal the brute-force maximal-island recompute " +
      "exactly (ids, offsets, lengths)") {
    val got = SparkEntry.queries("dd18_exact_substring_spans")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = bruteSpans(operators.Dedup.SpanSeedLen)
    assert(want.nonEmpty, "fixture must contain planted duplicated spans")
    assert(got == want)
  }

  test("dd18: islands are maximal — no two spans of one doc are " +
      "mergeable, and every span is >= the seed length") {
    val L = operators.Dedup.SpanSeedLen
    val spans = SparkEntry.queries("dd18_exact_substring_spans")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.forall { case (_, a, b, len) =>
      len >= L && b - a + 1 == len })
    spans.groupBy(_._1).values.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          // adjacent seed positions would have merged: the next island's
          // first seed (s2) must start >= 2 positions after the previous
          // island's last seed (e1 - L + 1)
          assert(s2 - (e1 - L + 1) >= 2, "mergeable islands survived")
        case _ => ()
      }
    }
  }

  test("dd19: cleaned corpus equals the brute-force cut (per-seed " +
      "min-doc canonical rule), and token mass is conserved") {
    val L = operators.Dedup.SpanSeedLen
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = graft.core.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val stats = new java.util.HashMap[String, (Long, java.util.HashSet[Long])]()
    docs.filter(_._2.length >= L).foreach { case (id, w) =>
      (0 to w.length - L).foreach { p =>
        val g = w.slice(p, p + L).mkString(" ")
        val cur = stats.get(g)
        if (cur == null) {
          val s0 = new java.util.HashSet[Long](); s0.add(id)
          stats.put(g, (id, s0))
        } else { cur._2.add(id); stats.put(g, (math.min(cur._1, id), cur._2)) }
      }
    }
    val want = docs.map { case (id, w) =>
      val cut = new java.util.HashSet[Int]()
      if (w.length >= L) (0 to w.length - L).foreach { p =>
        val (md, ds) = stats.get(w.slice(p, p + L).mkString(" "))
        if (ds.size >= 2 && id != md) (p until p + L).foreach(cut.add(_))
      }
      val clean = w.zipWithIndex.collect {
        case (t, i) if !cut.contains(i) => t }.mkString(" ")
      id -> (w.length.toLong, cut.size.toLong, md5hex(clean))
    }.toMap
    val got = SparkEntry.queries("dd19_substring_dedup_corpus")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got == want)
    assert(got.values.exists(_._2 > 0), "fixture must exercise a cut")
    // canonical holders and untouched docs keep their original text
    val orig = docs.toMap
    got.foreach { case (id, (ntok, ncut, fp)) =>
      assert(ncut >= 0 && ncut <= ntok)
      if (ncut == 0) assert(fp == md5hex(orig(id).mkString(" ")))
    }
  }

  // ---- ev18 ---------------------------------------------------------

  test("ev18: transition counts equal the brute-force per-user sequence " +
      "recompute, and each row's probability is the integer-rounded " +
      "quotient") {
    val events = graft.core.Tables(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = events.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(2).collect {
        case Array(a, b) => (a, b)
      }
    }.toSeq.groupBy(x => x).map { case (k, v) => k -> v.size.toLong }
    val rows = SparkEntry.queries("ev18_event_transitions")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2),
        r.getLong(3))))
      .toMap
    assert(rows.keySet == want.keySet)
    assert(rows.forall { case (k, (n, _)) => n == want(k) })
    val tot = want.groupBy(_._1._1).map { case (f, m) =>
      f -> m.values.sum }
    rows.foreach { case ((f, _), (n, p)) =>
      assert(p == (n * 2000000L + tot(f)) / (tot(f) * 2L))
    }
    // per-from_type probabilities normalize to 1e6 within rounding slack
    rows.toSeq.groupBy(_._1._1).foreach { case (f, rs) =>
      val s = rs.map(_._2._2).sum
      assert(math.abs(s - 1000000L) <= rs.size / 2 + 1,
        s"from=$f p_micro sum $s")
    }
  }

  // ---- tx27 ---------------------------------------------------------

  test("tx27: spectrum mass equals the brute-force df census for both " +
      "unigrams and trigram shingles") {
    val docs = graft.core.Tables(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tokre = "[a-z0-9]+".r
    def hist(units: Seq[(Long, String)]): Map[Long, Long] =
      units.distinct.groupBy(_._2).map { case (_, v) => v.size.toLong }
        .groupBy(df => 63L - java.lang.Long.numberOfLeadingZeros(df))
        .map { case (b, v) => b -> v.size.toLong }
    val uni = docs.flatMap { case (id, t) =>
      tokre.findAllIn(t).map(id -> _) }.toSeq
    val tri = docs.flatMap { case (id, t) =>
      val w = tokre.findAllIn(t).toArray
      w.sliding(3).withFilter(_.length == 3).map(g => id -> g.mkString(" "))
    }.toSeq
    val wantU = hist(uni)
    val wantT = hist(tri)
    val got = SparkEntry.queries("tx27_docfreq_spectrum")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.keySet == (wantU.keySet ++ wantT.keySet))
    got.foreach { case (b, (n1, n3)) =>
      assert(n1 == wantU.getOrElse(b, 0L), s"unigram bucket $b")
      assert(n3 == wantT.getOrElse(b, 0L), s"shingle bucket $b")
    }
    // mass conservation: every distinct term lands in exactly one bucket
    assert(got.values.map(_._1).sum == uni.distinct.map(_._2).distinct.size)
    assert(got.values.map(_._2).sum == tri.distinct.map(_._2).distinct.size)
  }
}
