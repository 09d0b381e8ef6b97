package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-corpus spectrum probe + whitening for the sign-LSH HASHING path
  * (VERDICT r11 #5; resolves the PLANS.md r11 deferral "adopted for
  * anisotropic spectra only").
  *
  * Sign-LSH hyperplanes on an ANISOTROPIC corpus waste bits: vectors
  * concentrate along a few eigendirections, random hyperplanes mostly
  * cut along them, per-plane signs correlate, bucket occupancy skews,
  * and the candidate volume at a given recall inflates
  * (PcaRotateBench's planted control measured 3.3x). Scaling the
  * dominant components down to the mean eigenvalue BEFORE hashing —
  * rescoring always on the ORIGINAL vectors, so emitted scores are
  * untouched — equalizes the per-direction variance the planes see. On
  * an isotropic corpus the same transform is a no-op that costs a
  * moment pass (the r11 A/B: recall 0.6549 -> 0.6599, no gain), so
  * adoption is PER-CORPUS: probe the spectrum once (one distributed
  * pass, persisted in the IndexStore next to the IVF/PQ artifacts),
  * adopt iff the top-eigenvalue skew clears [[SkewThreshold]].
  *
  * Knob: -Dgraft.lsh.whiten = off (default) | auto | on.
  *   off  — hash raw vectors (the DEFAULT, and the r12 measured
  *          verdict for this engine's queries — see below).
  *   auto — probe the persisted spectrum, whiten iff skew >= 4x.
  *          CAVEAT (r12 BENCH_whiten.json, product queries on the
  *          planted anisotropic open fixture, skew 6.2): whitening is
  *          angle-preserving only for NEAR-IDENTICAL pairs — the
  *          planted high-band near-dups (cos ~0.94) kept recall
  *          1.0000 in both arms, but MARGINAL-band pairs
  *          (0.45 <= cos < 0.7), whose similarity lives in the
  *          dominant directions the transform compresses, fell from
  *          0.58 to 0.30 recall for only a 1.13x candidate-volume
  *          saving. So the adoption domain is HIGH-THRESHOLD dedup on
  *          skewed spectra (where the r11 planted 50x control measured
  *          3.3x volume at recall 1); dd07/sim09 operate at/below the
  *          marginal regime, hence their default stays off and `auto`
  *          is for callers who know their threshold regime.
  *   on   — always whiten (A/B arm).
  *
  * The eigensolve is the DOUBLE-precision twin of Learn's em01 path
  * (power iteration + Hotelling deflation on the one-pass moment
  * matrix); em01 does it in exact BigInt arithmetic because an oracle
  * hashes its output — this is a performance knob, so plain doubles
  * suffice and the whole solve runs on 64x64 scalars driver-side.
  */
object Whitening {

  /** Adopt whitening when lambda_1 / mean-eigenvalue clears this. The
    * driver fixture measures skew ~1.3 (isotropic by construction);
    * real text-embedding spectra sit one to two orders above it. */
  val SkewThreshold = 4.0

  /** Components probed/equalized — em01's top-4, enough to capture the
    * dominant-direction mass whitening exists to flatten. */
  val Components = 4

  val Dim = 64

  final case class Spectrum(eigvals: Array[Double],
      eigvecs: Array[Array[Double]], meanVar: Double) {
    def skew: Double = eigvals.head / meanVar
  }

  /** One distributed pass over the corpus: the upper triangle of the
    * raw second-moment matrix (unit-norm embeddings have ~zero mean, so
    * second moments are the covariance for spectrum purposes) via
    * treeAggregate — 2080 doubles per partition, a genuine
    * per-partition imperative kernel. */
  def measure(e: DataFrame): Spectrum = {
    val n = Dim
    val tri = n * (n + 1) / 2
    val (sums, rows) = e.select(col("embedding")).rdd
      .treeAggregate((new Array[Double](tri), 0L))(
        seqOp = { case ((acc, cnt), row) =>
          val v = row.getAs[scala.collection.Seq[Float]](0)
          var k = 0
          var i = 0
          while (i < n) {
            val vi = v(i).toDouble
            var j = i
            while (j < n) {
              acc(k) += vi * v(j); k += 1; j += 1
            }
            i += 1
          }
          (acc, cnt + 1)
        },
        combOp = { case ((a, ca), (b, cb)) =>
          var k = 0
          while (k < tri) { a(k) += b(k); k += 1 }
          (a, ca + cb)
        })
    val m = Array.ofDim[Double](n, n)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        val x = sums(k) / math.max(1L, rows)
        m(i)(j) = x; m(j)(i) = x; k += 1; j += 1
      }
      i += 1
    }
    val meanVar = (0 until n).map(d => m(d)(d)).sum / n
    // power iteration + Hotelling deflation, 200 steps per component
    val vals = Array.ofDim[Double](Components)
    val vecs = Array.ofDim[Double](Components, n)
    val work = m.map(_.clone())
    for (c <- 0 until Components) {
      var v = Array.tabulate(n)(d => 1.0 / math.sqrt((d + c + 1).toDouble))
      var lam = 0.0
      for (_ <- 0 until 200) {
        val w = Array.ofDim[Double](n)
        var i2 = 0
        while (i2 < n) {
          var s = 0.0; var j2 = 0
          while (j2 < n) { s += work(i2)(j2) * v(j2); j2 += 1 }
          w(i2) = s; i2 += 1
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        if (nrm > 0) { v = w.map(_ / nrm); lam = nrm }
      }
      vals(c) = lam
      vecs(c) = v
      // deflate: work -= lam * v v^T
      var i3 = 0
      while (i3 < n) {
        var j3 = 0
        while (j3 < n) { work(i3)(j3) -= lam * v(i3) * v(j3); j3 += 1 }
        i3 += 1
      }
    }
    Spectrum(vals, vecs, meanVar)
  }

  /** Load-or-measure through the persisted IndexStore (one moment pass
    * per dataset, like the IVF/PQ builds; Bench's index wipe makes
    * pass 1 pay it and pass 2 steady). */
  def ensure(s: SparkSession, d: String, e: DataFrame): Spectrum = {
    val root = graft.core.IndexStore.root(d) + s"/whiten_c${Components}d$Dim"
    if (!graft.core.IndexStore.ready(s, root + "/spectrum")) {
      val sp = measure(e)
      val rows = sp.eigvals.zip(sp.eigvecs).zipWithIndex.map {
        case ((lam, ev), i) => (i, lam, ev.toSeq, sp.meanVar)
      }.toSeq
      s.createDataFrame(rows).toDF("c", "lam", "evec", "mean_var")
        .coalesce(1).write.mode("overwrite").parquet(root + "/spectrum")
    }
    val got = s.read.parquet(root + "/spectrum").collect()
      .sortBy(_.getInt(0))
    Spectrum(got.map(_.getDouble(1)),
      got.map(_.getAs[scala.collection.Seq[Double]]("evec").toArray),
      got.head.getDouble(3))
  }

  /** The whitened HASHING view: v' = v + sum_c (1/sqrt(lam_c/mean) - 1)
    * (v . e_c) e_c — dominant components compressed to mean variance,
    * everything else untouched; emitted as array<float> so the
    * SignBuckets kernel sees its usual input type. Rescoring stays on
    * the original column — scores, oracles, and recall semantics are
    * unchanged; only WHERE candidate pairs come from moves. */
  def whitenCol(v: Column, sp: Spectrum): Column = {
    val comps = sp.eigvals.zip(sp.eigvecs).map { case (lam, ev) =>
      val c = 1.0 / math.sqrt(math.max(1e-12, lam / sp.meanVar)) - 1.0
      val evLit = array(ev.map(x => lit(x)): _*)
      val dot = aggregate(
        zip_with(v, evLit, (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x)
      (c, evLit, dot)
    }
    val adjusted = comps.foldLeft(
        transform(v, x => x.cast("double"))) { case (cur, (c, evLit, dot)) =>
      zip_with(cur, evLit, (x, e) => x + lit(c) * dot * e)
    }
    transform(adjusted, x => x.cast("float"))
  }

  /** The hashing view for an LSH caller: raw `embedding` under `off`,
    * the whitened view under `on`, spectrum-gated under `auto`. */
  def hashingView(s: SparkSession, d: String, e: DataFrame): Column =
    sys.props.getOrElse("graft.lsh.whiten", "off") match {
      case "off" => col("embedding")
      case mode =>
        val sp = ensure(s, d, e)
        if (mode == "on" || sp.skew >= SkewThreshold) {
          s.sparkContext.setLocalProperty("graft.whiten.active", "true")
          whitenCol(col("embedding"), sp)
        } else col("embedding")
    }
}
