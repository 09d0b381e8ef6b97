package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 regression pins.
  *
  * mm04 independent rescore (r13 advisor, medium): the driver-gated
  * audit's `sound_ok` recomputes the cosine with the SAME graftx
  * dot_product/l2_norm kernels mediaKnn uses, and the DuckDB oracle
  * only asserts the boolean — so a kernel regression would pass the
  * engine, the oracle, and the numpy emb_sig tier simultaneously. This
  * spec restores the engine-independent tier: it re-derives every
  * media's embedding from the CLOSED FORMS in plain Scala (mirroring
  * tools/check_mm04.py's numpy replicas, no MediaCodec / no graftx
  * expression anywhere), recomputes the true cosine with plain Double
  * arithmetic, and checks every raw mediaKnn top-1 row against it.
  */
class Round14Spec extends AnyFunSuite {

  lazy val spark = SparkTestSession()
  val sf = "/root/testdata/sf0.001"

  // ---- closed-form embedding replicas (sync: MediaCodec.pixel/sample/
  // vpixel, tools/check_mm04.py, and the mm02/mm04/mm05 SQL oracles) ----

  private def embedImage(id: Long): Array[Double] = {
    val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
    val e = new Array[Long](8); var i = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      e(i % 8) += (id * 31 + x * 7 + y * 13 + c * 101 + x.toLong * y) % 256
      i += 1
    }
    e.map(_.toDouble)
  }

  private def embedAudio(id: Long): Array[Double] = {
    val n = (256 + id % 257).toInt
    val e = new Array[Long](8)
    for (i <- 0 until n)
      e(i % 8) += (id * 37 + i * 11L + i.toLong * i) % 65536 - 32768
    e.map(_.toDouble)
  }

  private def embedVideo(id: Long): Array[Double] = {
    val seed = id - 3 * ((id / 3) % 5) // vseed: runs of 5 share a payload
    val w = (8 + seed % 9).toInt; val h = (8 + seed % 7).toInt
    val nf = (4 + seed % 8).toInt
    val e = new Array[Long](8); var i = 0
    for (f <- 0 until nf; y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      e(i % 8) +=
        (seed * 31 + f * 17 + x * 7 + y * 13 + c * 101 + x.toLong * y) % 256
      i += 1
    }
    e.map(_.toDouble)
  }

  test("mm04 rescore: every raw top-1 row's sim is the 6dp rounding of " +
      "the TRUE cosine of the closed-form embeddings (plain-Scala " +
      "arithmetic — independent of graftx dot_product/l2_norm), and " +
      "every identical-twin media is recalled at sim 1.0") {
    val ids = graft.core.Tables(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    assert(ids.nonEmpty)
    val kind = ids.map(d => d -> Seq("image", "audio", "video")((d % 3).toInt)).toMap
    val emb = ids.map { d =>
      d -> ((d % 3) match {
        case 0 => embedImage(d)
        case 1 => embedAudio(d)
        case _ => embedVideo(d)
      })
    }.toMap
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < 8) { s += a(i) * b(i); i += 1 }
      s / (norm(a) * norm(b))
    }
    val rows = graft.operators.Multimodal.mediaKnn(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    val tol = 5e-7 + 1e-12 // 6dp rounding bound, matches the audit's
    rows.foreach { case (id, k, nb, sim) =>
      assert(nb != id, s"media $id names itself")
      assert(kind(nb) == k && kind(id) == k,
        s"media $id ($k): neighbor $nb is kind ${kind(nb)}")
      val truth = cos(emb(id), emb(nb))
      assert(math.abs(sim - truth) <= tol,
        s"media $id -> $nb: engine sim $sim vs true cosine $truth " +
          "(graftx dot_product/l2_norm regression?)")
    }
    // exact-duplicate recall: identical nonzero same-kind embeddings
    // must surface with sim exactly 1.0 (the planted clusters)
    val bySig = ids.filter(d => norm(emb(d)) > 0)
      .groupBy(d => (kind(d), emb(d).toSeq))
    val twins = bySig.values.filter(_.length > 1).flatten.toSet
    val simOf = rows.map(r => r._1 -> r._4).toMap
    twins.foreach { d =>
      assert(simOf.get(d).contains(1.0),
        s"twin media $d reports sim ${simOf.get(d)} (want exactly 1.0)")
    }
    assert(twins.nonEmpty, "fixture lost its planted duplicate clusters")
  }

  test("ConvMediaEncoder: a real-weights model behind the MediaEncoder " +
      "seam — parameters load ONCE per JVM (batch-amortized across " +
      "partitions and rows), output is deterministic, unit-norm, " +
      "domain-identical to the stub's and vector-distinct from it") {
    import org.apache.spark.sql.functions.col
    val enc = new graft.operators.ConvMediaEncoder()
    // drop any net cached by an earlier suite in this JVM (sbt without
    // fork/reload): the loads == 1 assert below measures THIS run
    graft.operators.ConvMediaEncoder.resetForTest()
    def run() = graft.operators.Multimodal
      .mediaEmb(spark, sf, enc)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Float](2).toVector))
      .sortBy(_._1)
    val a = run()
    spark.catalog.clearCache()
    val b = run()
    spark.catalog.clearCache()
    // the run fanned N rows over defaultParallelism partitions; a model
    // that loaded per row (or eagerly per partition instance) would
    // count >> 1. local[32] shares one JVM, so the counter sees every
    // executor thread — exactly the per-JVM cache contract.
    val loads = graft.operators.ConvMediaEncoder.loads.get()
    assert(loads == 1,
      s"parameter block materialized $loads times across two full runs " +
        "— the per-JVM weight cache is broken (per-row/per-partition " +
        "load would be ruinous behind a real checkpoint)")
    assert(a.nonEmpty && a.sameElements(b), "forward pass must be " +
      "deterministic (fixed weights, fixed content)")
    // plumbing is encoder-agnostic: same (media_id, kind) domain as stub
    val stub = graft.operators.Multimodal.mediaEmb(spark, sf)
      .select(col("media_id"), col("kind")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    spark.catalog.clearCache()
    assert(a.map(t => (t._1, t._2)).sameElements(stub))
    // real forward pass: unit-norm vectors of the conv net's dimension
    a.foreach { case (id, _, v) =>
      assert(v.length == graft.operators.ConvMediaEncoder.Dim)
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(nrm == 0.0 || math.abs(nrm - 1.0) < 1e-4,
        s"media $id: norm $nrm")
    }
    // and the vectors are NOT the stub's 8-slot sums
    assert(a.exists(_._3.exists(x => x != 0f && math.abs(x) < 1f)))
  }
}
