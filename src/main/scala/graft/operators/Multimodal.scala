package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The reference engine is strings-only (SURVEY.md §1.2); this is the
  * pipeline-extras tier for a 100 TB multimodal corpus. IMAGE kinds run
  * REAL codecs end-to-end as of r11: payloads are genuine PNGs (encoded
  * by the JDK's headless ImageIO from a closed-form pixel synth —
  * [[MediaCodec]]), and mm02/mm04/mm05 DECODE them back through
  * ImageIO, with the DuckDB oracle checking the reported pixel stats
  * against the closed form it can evaluate without ever parsing a PNG.
  * AUDIO kinds run the same recipe through the JDK's other codec
  * (r12): payloads are genuine RIFF/WAVE files (closed-form 16-bit PCM
  * → `javax.sound.sampled` writer), and mm02/mm04 decode them back
  * through `AudioSystem`, sample stats oracled against the closed form.
  * VIDEO kinds are REAL too as of r12: genuine AVI containers with
  * PNG-compressed frames (`MPNG` — the lossless PNG-in-AVI format
  * ffmpeg writes with `-c:v png`; the engine implements the RIFF/AVI
  * container, ImageIO supplies the frame codec — [[MediaCodec]]), and
  * mm02/mm04 decode them back through a true chunk-tree parse +
  * per-frame PNG decode, frame stats oracled against the closed form.
  * The Spark-side contract is identical for all tiers
  * and is the part that matters at scale:
  *
  *  - payloads live in a `BinaryType` column, scanned but never parsed by
  *    Catalyst; metadata lives in a sibling struct so pruning works (a
  *    metadata-only query never deserializes a payload);
  *  - decode runs in `mapPartitions` — per-partition imperative batches,
  *    the Scala analogue of `mapInPandas` batch UDFs: amortized per-batch
  *    setup (a real decoder would init its codec once per partition, not
  *    per row), no driver involvement, output schema declared up front;
  *  - frame sampling is a pure `sequence`/`explode` expression — the
  *    fan-out happens inside codegen, and the payload column is NOT
  *    carried through the explode (only frame indices are).
  */
/** Typed output rows of the decode/encode stub kernels — case classes so
  * the mapPartitions stages run through `Dataset` encoders
  * (SerializeFromObject keeps Tungsten rows; no RDD[Row] round-trip). */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
  checksum: Long, mean_byte: Double)
case class MediaEmb(media_id: Long, kind: String, emb: Array[Float])
case class MediaResized(media_id: Long, width: Int, height: Int,
  n_bytes: Int, checksum: Long)

/** Pluggable embedding-model seam for the multimodal tier. An
  * implementation receives one PARTITION's worth of (media_id, kind,
  * payload-bytes) rows per call and returns their embeddings — the
  * mapPartitions batch contract, so a real model (ONNX session, JNI
  * handle, GPU context) loads ONCE per partition in `encode`'s
  * enclosing scope and serves the whole batch. Implementations must be
  * serializable (they ship to executors) and deterministic per payload
  * if downstream audits are to stay reproducible. The engine's default
  * is [[Multimodal.StubMediaEncoder]] (the closed-form featurizer the
  * oracles replay); swapping in a real encoder changes ONLY the
  * vectors — catalog, partitioning, kNN, and dedup plumbing are
  * encoder-agnostic (spec-pinned). */
trait MediaEncoder extends Serializable {
  def encode(
    rows: Iterator[(Long, String, Array[Byte])]): Iterator[MediaEmb]
}

object Multimodal {

  /** Synthesize the media catalog from `documents`: kind round-robins
    * image/audio/video. IMAGE payloads are REAL PNGs, AUDIO payloads
    * REAL WAVs, VIDEO payloads REAL AVI/MPNG containers ([[MediaCodec]]
    * via the png_synth / wav_synth / avi_synth expressions —
    * Expressions, not mapPartitions stages, so the catalog stays a pure
    * columnar plan and metadata-only consumers never encode a single
    * payload). Image/video meta carries the TRUE dims (and video the
    * TRUE frame count — what mm03 samples without touching a payload),
    * audio meta the TRUE sample rate; codec payloads derive from doc_id
    * alone so the DuckDB side can reproduce every downstream
    * pixel/sample/frame stat without a PNG/WAV/AVI parser. (Audio meta
    * keeps the legacy text-derived width/height stand-ins — mm01 is the
    * metadata-pruning query, and a generic media catalog carries
    * kind-inapplicable fields as-is.)
    *
    * Factored over an arbitrary documents relation so codec consumers
    * can width-normalize the RAW rows BEFORE the synth expressions run
    * ([[codecCatalog]]): an exchange placed after this projection would
    * leave the payload ENCODE itself on the narrow small-file scan. */
  private def catalogProjection(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftx.PngSynthFunctions.png_synth
    import org.apache.spark.sql.graftx.WavSynthFunctions.wav_synth
    import org.apache.spark.sql.graftx.AviSynthFunctions.avi_synth
    val isImage = col("doc_id") % 3 === 0
    val isAudio = col("doc_id") % 3 === 1
    val isVideo = col("doc_id") % 3 === 2
    // video GROUP seed (MediaCodec.vseed): planted duplicate payloads.
    // `div` is integral division — same integer arithmetic as the
    // Scala kernel's id/3 and the DuckDB oracle's doc_id // 3 (the
    // former Double-division form was exact only while doc_id/3 fit a
    // double mantissa).
    val vs = col("doc_id") - lit(3) * (expr("doc_id div 3") % 5)
    // meta dims: the PAYLOAD's true dims — the seed's for video
    val dimId = when(isVideo, vs).otherwise(col("doc_id"))
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      when(isImage, png_synth(col("doc_id")))
        .when(isAudio, wav_synth(col("doc_id")))
        .otherwise(avi_synth(col("doc_id"))).as("payload"),
      struct(
        when(isAudio, col("n_chars") % 640)
          .otherwise(lit(8) + dimId % 9).cast("int").as("width"),
        when(isAudio, col("n_chars") % 480)
          .otherwise(lit(8) + dimId % 7).cast("int").as("height"),
        lit(3).as("channels"),
        lit(16000).as("sample_rate"),
        when(isVideo, lit(4) + vs % 8)
          .otherwise(lit(1)).cast("int").as("n_frames")).as("meta"))
  }

  def mediaCatalog(s: SparkSession, d: String): DataFrame =
    catalogProjection(Tables(s, d, "documents"))

  /** The catalog's payload-bearing columns over WIDTH-NORMALIZED raw
    * rows: the (doc_id, n_chars) base relation repartitions to full
    * parallelism FIRST, so both the payload encode (synth expressions)
    * and the downstream kernel decode run at cluster width instead of
    * the small documents file's ~1-partition scan width. */
  private def codecCatalog(s: SparkSession, d: String): DataFrame =
    catalogProjection(
      Tables(s, d, "documents").select(col("doc_id"), col("n_chars"))
        .repartition(s.sparkContext.defaultParallelism))

  /** Decode + feature extraction — every kind on its REAL codec path.
    * IMAGE: ImageIO PNG decode, stats over the decoded pixel raster
    * (n_bytes = content bytes w*h*3, checksum = sum of channel values).
    * AUDIO: AudioSystem WAV decode, stats over the decoded 16-bit
    * samples (n_bytes = PCM content bytes 2*n, checksum = sum of SIGNED
    * sample values). VIDEO (r12): true AVI chunk-tree parse + per-frame
    * PNG decode, stats over ALL decoded frame rasters (n_bytes =
    * nframes*w*h*3, checksum = sum of channel values across frames).
    * The mapPartitions shape (batch iterator in, batch iterator out,
    * schema fixed by the case-class encoder) is what any real decoder
    * plugs into — per-partition setup amortized, Tungsten rows in and
    * out (SerializeFromObject, no RDD[Row] detour). */
  private def decodeKernel(
      rows: Iterator[(Long, String, Array[Byte])]): Iterator[MediaFeatures] =
    rows.map { case (mediaId, kind, bytes) =>
      if (kind == "image") {
        val px = MediaCodec.pixels(MediaCodec.decode(bytes))
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i); i += 1 }
        MediaFeatures(mediaId, kind, px.length, sum,
          if (px.length == 0) 0.0 else sum.toDouble / px.length)
      } else if (kind == "audio") {
        val sm = MediaCodec.decodeWav(bytes)
        var sum = 0L
        var i = 0
        while (i < sm.length) { sum += sm(i); i += 1 }
        MediaFeatures(mediaId, kind, sm.length * 2, sum,
          if (sm.length == 0) 0.0 else sum.toDouble / sm.length)
      } else {
        val v = MediaCodec.decodeAvi(bytes)
        var sum = 0L
        var n = 0
        v.frames.foreach { px =>
          var i = 0
          while (i < px.length) { sum += px(i); i += 1 }
          n += px.length
        }
        MediaFeatures(mediaId, kind, n, sum,
          if (n == 0) 0.0 else sum.toDouble / n)
      }
    }

  /** Default [[MediaEncoder]]: every kind embeds its REAL decoded
    * content (8 chunked sums — a fixed featurizer, stand-in for a model
    * forward pass). IMAGE: the decoded pixel raster; AUDIO: the decoded
    * sample stream (slot sums stay under 2^21); VIDEO (r12): the decoded
    * frame rasters concatenated in frame order (slot sums stay under
    * 2^19 — 11 frames x 16x14x3 / 8 slots x 255 max; all integer-exact
    * in float32). */
  object StubMediaEncoder extends MediaEncoder {
    def encode(
        rows: Iterator[(Long, String, Array[Byte])]): Iterator[MediaEmb] =
      encodeKernel(rows)
  }

  private def encodeKernel(
      rows: Iterator[(Long, String, Array[Byte])]): Iterator[MediaEmb] =
    rows.map { case (mediaId, kind, bytes) =>
      val emb = new Array[Float](8)
      if (kind == "image") {
        val px = MediaCodec.pixels(MediaCodec.decode(bytes))
        var i = 0
        while (i < px.length) { emb(i % 8) += px(i); i += 1 }
      } else if (kind == "audio") {
        val sm = MediaCodec.decodeWav(bytes)
        var i = 0
        while (i < sm.length) { emb(i % 8) += sm(i); i += 1 }
      } else {
        val v = MediaCodec.decodeAvi(bytes)
        var i = 0
        v.frames.foreach { px =>
          var j = 0
          while (j < px.length) { emb(i % 8) += px(j); i += 1; j += 1 }
        }
      }
      MediaEmb(mediaId, kind, emb)
    }

  /** REAL image resize: ImageIO decode -> stride-2 downsample -> PNG
    * re-ENCODE -> re-DECODE, stats emitted from the round-tripped image
    * so both the writer and the reader sit on the measured path. The
    * emitted dims/checksum equal the closed-form downsample of the
    * synth pixels (PNG is lossless), which is what the SQL oracle
    * checks byte-for-byte. */
  private def resizeKernel(
      rows: Iterator[(Long, Array[Byte])]): Iterator[MediaResized] =
    rows.map { case (mediaId, bytes) =>
      val rt = MediaCodec.decode(MediaCodec.encodePng(
        MediaCodec.downsample(MediaCodec.decode(bytes))))
      val px = MediaCodec.pixels(rt)
      var sum = 0L
      var i = 0
      while (i < px.length) { sum += px(i); i += 1 }
      MediaResized(mediaId, rt.getWidth, rt.getHeight, px.length, sum)
    }

  /** (media_id, kind, payload) as a typed Dataset for the codec kernels,
    * over the WIDTH-NORMALIZED [[codecCatalog]]: with every kind now on
    * a real codec path (r12 — PNG/WAV/AVI round trips, not byte folds)
    * the per-row encode+decode work dwarfs an exchange of (doc_id,
    * n_chars) rows, and the small documents file otherwise scans as ~1
    * partition (5.6 MB at sf1 under 16 MB maxPartitionBytes),
    * serializing ~10^5 PNG encodes+decodes onto one core — measured
    * 25.6 s -> 1.8 s on mm02 at sf1. This flips the r11 call (cheap
    * stubs: the exchange cost MORE than it parallelized, +2.1 s on mm04
    * at sf2); the r11 comment itself recorded that a real codec belongs
    * behind a width-normalizing repartition. The exchange runs BELOW
    * the synth projection and carries two longs per row, never payload
    * bytes; metadata-only consumers (mm01/mm03) never come through here
    * and keep their payload-pruned, exchange-free plans. */
  private def payloads(s: SparkSession, d: String) = {
    import s.implicits._
    codecCatalog(s, d)
      .select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
  }

  /** Decode -> embed through the REAL codec paths: the embedding
    * relation (media_id, kind, emb) every mm04 tier builds on. The
    * encoder is the pluggable [[MediaEncoder]] seam — hand it an ONNX/
    * JNI-backed implementation and the catalog scan, width
    * normalization, batch shape, and every downstream consumer stay
    * untouched; the default is the closed-form stub the oracles can
    * replay. */
  private[graft] def mediaEmb(s: SparkSession, d: String,
      encoder: MediaEncoder = StubMediaEncoder): DataFrame = {
    import s.implicits._
    payloads(s, d).mapPartitions(encoder.encode).toDF()
  }

  /** The full multimodal pipeline shape: decode -> embed (stub model in
    * the mapPartitions batch kernel) -> approximate nearest neighbor per
    * media within its kind: candidate pairs from OWN-bucket sign-LSH
    * co-location within (kind, table, bucket) across L independent
    * tables (sim02's machinery), windowed by a sorted-neighborhood ring
    * so per-bucket work is linear (no all-pairs join, no multiprobe:
    * see the candidate-volume note below), exact cosine rescore of
    * candidates only, winner per media via the custom TopKPerGroup
    * operator. Zero-norm embeddings (empty payloads) are filtered before
    * ranking — sim would be 0/0 = NaN, which Spark sorts above every
    * real double and would leak a NaN winner. A media whose probed
    * buckets hold no same-kind neighbor emits no row (ANN contract).
    * Stub-encoder output -> rows-only check; invariants in the spec.
    * (Raw top-1 relation — the specs and tools/check_mm04.py's numpy
    * tier consume this; the DRIVER-GATED query is [[mediaKnnAudit]].) */
  private[graft] def mediaKnn(s: SparkSession, d: String,
      embIn: DataFrame = null): DataFrame = {

      import org.apache.spark.sql.graftx.functions.{dot_product, l2_norm}
      import org.apache.spark.sql.graftx.SignBucketsFunctions.sign_buckets
      // B=8 planes: the stub's exact-duplicate embedding clusters put a
      // floor (~260-vector buckets at sf0.1) under ANY plane count, so
      // more planes only add hashing cost; the ring window below bounds
      // the per-bucket candidate volume instead. L=2 tables bound the
      // candidate multiplier.
      val B = 8; val L = 2
      import s.implicits._
      val emb = if (embIn != null) embIn else mediaEmb(s, d)
      // mat(): e fans out into the mean aggregate, the bucket exchange,
      // and BOTH rescore join sides of one action — on a cold cache
      // AQE's concurrent exchange jobs each re-ran the decode+embed
      // upstream (Tables.mat; measured as ~9 parallel 1-2.5 s jobs at
      // sf0.1). One forced pass, then every branch reads warm cache.
      // Occupancy-gated cache width (r16, Tables.keyedAt): the decode
      // itself stays at codecCatalog's full width (it is the real
      // per-row work), but the persisted embedding relation it feeds is
      // KB-scale at small inputs, and every downstream pass (mean agg,
      // bucket exchange, both rescore joins) re-scanned a CPUS-wide
      // cache. The keyed exchange also hands both rescore joins a
      // reusable hashpartitioning(media_id) — they previously exchanged
      // e separately per side. Gate bound = documents footer rows (the
      // media catalog is doc-derived); off at >= 1k media/core.
      val docRows = graft.core.Tables.layout(
        s, s"$d/documents.parquet").rows
      val e = graft.core.Tables.mat(graft.core.Tables.keyedAt(s, docRows,
        emb
        .withColumn("nrm", l2_norm(col("emb")))
        .filter(col("nrm") > 0), col("media_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // Chunked-sum embeddings are tightly clustered in direction within
      // a kind (image/video slot sums are all-positive; audio's signed
      // sums cluster around the sample-mean direction), which collapses
      // raw sign-LSH into near-mega-buckets (the candidate set
      // degenerates toward all-pairs x tables). MEAN-CENTER the
      // vectors before hashing — the standard spread for clustered data:
      // bucket ids come from (v - mean), where directions are dispersed,
      // while rescoring stays on the original vectors. Near-identical
      // pairs remain near-identical after the shift, so co-bucketing of
      // true near-dups survives.
      // exact scaled-long mean (same pattern as Clustering.kmeans): a
      // plain avg(double) merges partials in shuffle-fetch order and a
      // low-bit difference could flip a hyperplane sign -> different
      // buckets -> the determinism spec flakes. 1e6 scaling is exact far
      // beyond float's resolution at the stub's ~1e5 magnitudes (the mean
      // is cast to FLOAT below anyway) and each scaled value stays far
      // inside long range.
      val mean = e.select(posexplode(col("emb")).as(Seq("dim", "v")))
        .groupBy(col("dim"))
        .agg((sum(graft.core.Num.scaledLong(col("v").cast("double"), 6))
          .cast("double") / 1e6 / count(lit(1))).as("mv"))
        .groupBy().agg(array_sort(collect_list(struct(col("dim"),
          col("mv")))).as("p"))
        .select(expr("transform(p, x -> CAST(x.mv AS FLOAT))").as("mean"))
      val centered = e.crossJoin(broadcast(mean))
        .withColumn("cemb",
          expr("zip_with(emb, mean, (x, y) -> CAST(x - y AS FLOAT))"))
      val own = centered.select(col("media_id"), col("kind"),
        xxhash64(col("emb")).as("ehash"),
        posexplode(sign_buckets(col("cemb"), B, L)).as(Seq("tbl", "bucket")))
      // own-bucket candidates only: L independent tables already give the
      // recall diversity; Hamming-1 multiprobe would multiply the (stub-
      // clustered) candidate volume ~7x for marginal top-1 gain. No
      // distinct: a pair colliding in several tables scores identically
      // each time, and the k=1 selection dedupes for free — cheaper than
      // a distinct's shuffle.
      //
      // Within a bucket, candidates come from a SORTED-NEIGHBORHOOD RING
      // (the blocking-window method of Hernandez & Stolfo, SIGMOD'95),
      // not an all-pairs self-join: members are ordered by media_id and
      // each probes its next W cyclic successors, so per-bucket work is
      // m*W instead of m^2. A bucket of size m <= W+1 gets EXACTLY the
      // all-pairs candidate set per media (every other member is among
      // its m-1 <= W cyclic successors); only oversized buckets — which
      // is where the self-join form went quadratic — are windowed. The
      // stub encoder's exact-duplicate embedding clusters are the
      // adversarial case: they collapse into mega-buckets at ANY plane
      // count (identical vectors hash identically), which floored the
      // self-join form at sum(m^2) pairs — measured 37 s at sf1.0 /
      // 116 s at sf2.0, tracking N^2. The ring bounds that to N*L*W at
      // any skew, and for exact duplicates any windowed neighbor already
      // scores sim = 1.0, so the top-1 contract is unaffected. The
      // row_number/count window runs one task per oversized bucket but is
      // linear in m (it was the m^2 JOIN OUTPUT that killed the old
      // shape, not the per-bucket scan).
      val W = 8
      val bw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("kind"), col("tbl"), col("bucket"))
      // Ring order = (embedding hash, media_id), NOT media_id alone:
      // identical embeddings become CONTIGUOUS runs, so a duplicate's
      // twin sits at ring distance 1 regardless of how many foreign
      // vectors share the (stub-degenerate) mega-bucket. Under media_id
      // order, a mega-bucket interleaves duplicate GROUPS and a media's
      // W successors could all be foreign — caught at sf1 by
      // tools/check_mm04.py: an exact twin > W positions away reported
      // top-1 sim 0.9994 instead of 1.0.
      // persisted + mat(): pos feeds the probe explode AND the position-
      // join build side of one action — unpersisted, the bucket window
      // (sort + row_number + count over N x L rows) ran once per
      // concurrent consumer (profiled as the residual ~1.5-2 s twin jobs
      // after the e/em materialization fix; Tables.mat)
      // occupancy-gated bucket-window exchange (r16, same gate): the
      // window reuses the keyed repartition, so the pos cache carries n
      // partitions instead of shuffle.partitions
      val pos = graft.core.Tables.mat(graft.core.Tables.keyedAt(s,
          docRows, own, col("kind"), col("tbl"), col("bucket"))
        .withColumn("pos", row_number().over(
          bw.orderBy(col("ehash"), col("media_id"))))
        .withColumn("m", count(lit(1)).over(bw))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // j = 1..min(W, m-1) cyclic steps; m = 1 buckets have no pairs.
      // tpos != pos by construction (j mod m is never 0), so no
      // self-pairs and no `=!=` residual predicate on the join.
      val probes = pos.filter(col("m") > 1)
        .withColumn("j",
          explode(sequence(lit(1), least(lit(W), col("m") - 1))))
        .select(col("media_id"), col("kind"), col("tbl"), col("bucket"),
          pmod(col("pos") - 1 + col("j"), col("m")).+(1).as("tpos"))
      // The position join is pinned to sort-merge on the bucket key so no
      // per-row side is ever a broadcast build (over the 8 GB cap at 1e9
      // media); the rescore joins co-partition the per-media `e` against
      // the candidate set on media_id via shuffle-hash for the same
      // reason (PlanAuditSpec).
      // persisted + mat(): the both-directions union below scans candDir
      // twice — unpersisted, the position join ran once per direction
      // gated coalesce (r16): candDir is scanned twice by the union and
      // joined twice downstream — at small inputs the SMJ's
      // shuffle.partitions-wide output cache cost 2x CPUS task launches
      // per pass; coalesce narrows the reduce stage without an exchange
      val candJoin = probes.as("x").join(pos.hint("merge").as("y"),
          col("x.kind") === col("y.kind") && col("x.tbl") === col("y.tbl") &&
            col("x.bucket") === col("y.bucket") &&
            col("x.tpos") === col("y.pos"))
        .select(col("x.media_id").as("media_id"),
          col("y.media_id").as("neighbor_id"))
      val candDir = graft.core.Tables.mat(
        graft.core.Tables.gatedParts(s, docRows)
          .map(candJoin.coalesce).getOrElse(candJoin)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // score BOTH directions: the last member of a contiguous duplicate
      // run probes only forward (outside its run), but it is probed BY
      // its predecessor — the reverse rows close the exact-duplicate
      // contract for every run member at any m. A pair surfaced twice
      // scores identically; the k=1 selection dedupes for free.
      val cand = candDir.unionAll(candDir.select(
        col("neighbor_id").as("media_id"), col("media_id").as("neighbor_id")))
      val pairs = cand.as("c")
        .join(e.hint("shuffle_hash").as("a"),
          col("c.media_id") === col("a.media_id"))
        .join(e.hint("shuffle_hash").as("b"),
          col("c.neighbor_id") === col("b.media_id"))
        .select(col("c.media_id").as("media_id"), col("a.kind").as("kind"),
          col("c.neighbor_id").as("neighbor_id"),
          round(dot_product(col("a.emb"), col("b.emb")) /
            (col("a.nrm") * col("b.nrm")), 6).as("sim"))
      Scale.topKPerGroup(pairs, Seq("media_id"), 1,
        col("sim").desc, col("neighbor_id").asc)
  }

  /** Driver-gated audit for the media kNN (the r12 verdict's last
    * `no_oracle` row; recipe = sim09's knnGraphAudit). Domain: EVERY
    * media. DuckDB pins the structural columns — kind and `emb_sig`,
    * the codec-path embedding's 8 slot sums as a canonical ':'-joined
    * string, which the oracle recomputes from the closed-form
    * pixel/sample/frame formulas: a bit-exact pin of the WHOLE
    * embedding through the real PNG/WAV/AVI decode, for every media
    * (strictly wider than the old checker, which only saw media that
    * emitted a kNN row). The contract booleans ride as columns the
    * oracle asserts as TRUE literals:
    *  - `sound_ok`   — the media's top-1 row (if any) names a distinct
    *    same-kind neighbor whose `sim` is the 6dp rounding of the true
    *    cosine (|sim - cos| <= 5e-7 + 1e-12), the vectors being the
    *    emb_sig-certified ones;
    *  - `le1_row`    — at most one kNN row per media;
    *  - `dup_recall_ok` — a media with an IDENTICAL same-kind nonzero
    *    twin (the stub's planted duplicate clusters) reports sim = 1.0.
    * tools/check_mm04.py re-derives the same columns from an
    * independent numpy replica (second tier). */
  private[graft] def mediaKnnAudit(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.graftx.functions.{dot_product, l2_norm}
    val tol = 5e-7 + 1e-12
    // mat(): em fans out into twins, the kNN (via embIn), both audit
    // join sides, and the final left joins — cold-cache concurrent
    // first-touch would re-run the media decode per branch (Tables.mat)
    val em = graft.core.Tables.mat(mediaEmb(s, d)
      .withColumn("emb_sig", expr("array_join(transform(emb, " +
        "x -> CAST(CAST(x AS BIGINT) AS STRING)), ':')"))
      .withColumn("nrm", l2_norm(col("emb")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // identical-embedding twin groups (nonzero-norm, within a kind):
    // group identity IS the pinned signature, so engine twins and
    // oracle twins coincide by construction once emb_sig matches
    val twins = em.filter(col("nrm") > 0)
      .groupBy(col("kind"), col("emb_sig"))
      .agg(count(lit(1)).as("m")).filter(col("m") > 1)
      .select(col("kind").as("tkind"), col("emb_sig").as("tsig"))
    val top1 = mediaKnn(s, d,
      em.select(col("media_id"), col("kind"), col("emb")))
    // per-media audit of the (<= 1) kNN row: neighbor validity + the
    // rounding-soundness bound against the exact cosine of the two
    // certified vectors. The em sides are PER-ROW relations (one row
    // per media) — shuffle-hash pinned, same rule as the kNN's rescore
    // joins: broadcasting a corpus-sized side breaks past the 8 GB cap
    // long before 100 TB (PlanAuditSpec's unreduced-broadcast guard).
    val t = top1.as("t")
      .join(em.select(col("media_id").as("aid"), col("emb").as("aemb"),
          col("nrm").as("anrm")).hint("shuffle_hash"),
        col("t.media_id") === col("aid"))
      .join(em.select(col("media_id").as("bid"), col("kind").as("bkind"),
          col("emb").as("bemb"), col("nrm").as("bnrm"))
          .hint("shuffle_hash"),
        col("t.neighbor_id") === col("bid"))
      .groupBy(col("t.media_id").as("kid"))
      .agg(count(lit(1)).as("n_rows"),
        min((col("t.neighbor_id") =!= col("t.media_id")) &&
          (col("bkind") === col("t.kind")) &&
          (abs(col("t.sim") - dot_product(col("aemb"), col("bemb")) /
            (col("anrm") * col("bnrm"))) <= tol)).as("rows_sound"),
        max(col("t.sim")).as("top_sim"))
    // no broadcast hint on twins: its row count tracks the duplicate
    // structure (the planted video runs alone make it ~N/15), so at
    // corpus scale it must stay a shuffled join; AQE still broadcasts
    // it when it is actually small
    em.as("e")
      .join(twins, col("e.kind") === col("tkind") &&
        col("e.emb_sig") === col("tsig"), "left")
      .join(t, col("e.media_id") === col("kid"), "left")
      .select(col("e.media_id").as("media_id"), col("e.kind").as("kind"),
        col("e.emb_sig").as("emb_sig"),
        col("tsig").isNotNull.as("has_twin"),
        (col("tsig").isNull || (coalesce(col("top_sim"), lit(0.0)) === 1.0))
          .as("dup_recall_ok"),
        (coalesce(col("n_rows"), lit(0L)) <= 1).as("le1_row"),
        coalesce(col("rows_sound"), lit(true)).as("sound_ok"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata-only catalog scan: payload column pruned away entirely —
    // the plan never touches png_synth (no payload bytes, no PNG encode;
    // asserted by the spec's plan read).
    "mm01_media_catalog" -> ((s, d) =>
      mediaCatalog(s, d).select(
        col("media_id"), col("kind"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"))),

    // REAL resize stage: image payloads only (pruned at the scan by the
    // kind filter), decode -> downsample -> encode -> decode in one
    // mapPartitions batch — the shape a GPU/codec resize stage plugs into.
    "mm05_media_resize" -> ((s, d) => {
      import s.implicits._
      // codecCatalog = width-normalized BELOW the synth (4 real codec
      // passes per row must not inherit a ~1-partition small-file
      // scan); the kind filter pushes through the projection to the
      // pre-exchange scan, so only image rows are exchanged or encoded
      codecCatalog(s, d).filter(col("kind") === "image")
        .select(col("media_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(resizeKernel).toDF()
    }),

    "mm02_media_features" -> ((s, d) => {
      import s.implicits._
      val feats = payloads(s, d)
        .mapPartitions(decodeKernel).toDF()
      feats.groupBy(col("kind")).agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("checksum")).as("total_checksum"))
    }),

    // r13: the GATED mm04 is the audit form — media domain and the
    // closed-form embedding signature DuckDB-pinned, contract booleans
    // asserted as TRUE literals in the oracle (the sim09 recipe,
    // VERDICT r12 next-#4). The raw top-1 relation is [[mediaKnn]].
    "mm04_media_embed_knn" -> ((s, d) => mediaKnnAudit(s, d)),


    // Frame sampling: every 2nd frame of each video; pure expression
    // fan-out over the catalog's TRUE frame count (meta.n_frames — the
    // container stamps the same count, asserted by the decode path), so
    // the payload column is pruned away entirely and no AVI is parsed:
    // the metadata-only contract mm01 pins, on the query whose job is
    // index fan-out.
    "mm03_frame_sample" -> ((s, d) => {
      mediaCatalog(s, d)
        .filter(col("kind") === "video")
        .select(col("media_id"), col("meta.n_frames").as("n_frames"))
        .select(col("media_id"),
          explode(expr("sequence(0, n_frames - 1, 2)")).as("frame_idx"))
    }),

    // r15: the REAL-WEIGHTS encoder behind the driver gate (VERDICT r14
    // next-#4 — ConvMediaEncoder was reachable only from a spec, so the
    // one tier whose correctness rested entirely on sbt test). Shape:
    // catalog → real conv+MLP forward pass over the decoded streams →
    // per-media contract stats the oracle can pin. The closed-form stub
    // signature `emb_sig` certifies CONTENT identity bit-exactly (the
    // mm04 recipe — DuckDB recomputes it from the pixel/sample/frame
    // formulas), and the contract booleans ride as engine-evaluated
    // columns asserted TRUE by the oracle:
    //  - dim_ok       — the real embedding has ConvMediaEncoder.Dim dims;
    //  - unit_norm_ok — it is L2-normalized (|nrm-1| < 1e-4);
    //  - twin_ok      — content-twins (same kind+emb_sig, the planted
    //    duplicate clusters) embed IDENTICALLY (determinism across rows
    //    and partitions, the checkpoint-restore contract);
    //  - discrim_ok   — distinct content embeds DISTINCTLY: the
    //    (kind, real-embedding) group has exactly the membership of the
    //    (kind, emb_sig) group. This is the behavioral pin of the r14
    //    advisor's audio-scaling fix: signed 16-bit samples fed through
    //    the 0..255 pixel normalization saturated the net and collapsed
    //    audio embeddings — collapsed vectors merge emb_sig groups and
    //    turn this column FALSE.
    // Load amortization (parameters materialize ONCE per JVM) is pinned
    // by Round15Spec running THIS entry with the counter asserted.
    "mm06_media_embed_real" -> ((s, d) => {
      import org.apache.spark.sql.graftx.functions.l2_norm
      import org.apache.spark.sql.expressions.Window
      val em = mediaEmb(s, d)
        .withColumn("emb_sig", expr("array_join(transform(emb, " +
          "x -> CAST(CAST(x AS BIGINT) AS STRING)), ':')"))
        .select(col("media_id"), col("kind"), col("emb_sig"))
      val conv = mediaEmb(s, d, new ConvMediaEncoder())
        .select(col("media_id").as("cid"), col("emb").as("cemb"))
      // per-row join of the two encoder outputs: both sides are
      // corpus-sized (one row per media), so shuffle-hash, never a
      // corpus broadcast (PlanAuditSpec's unreduced-broadcast rule)
      val j = em.join(conv.hint("shuffle_hash"),
          col("media_id") === col("cid"))
        .select(col("media_id"), col("kind"), col("emb_sig"),
          xxhash64(col("cemb")).as("csig"),
          l2_norm(col("cemb")).as("cnrm"),
          size(col("cemb")).as("cdim"))
      val bySig = Window.partitionBy(col("kind"), col("emb_sig"))
      val byEmb = Window.partitionBy(col("kind"), col("csig"))
      j.select(col("media_id"), col("kind"), col("emb_sig"),
        (col("cdim") === lit(ConvMediaEncoder.Dim)).as("dim_ok"),
        (abs(col("cnrm") - 1.0) < 1e-4).as("unit_norm_ok"),
        (min(col("csig")).over(bySig) === max(col("csig")).over(bySig))
          .as("twin_ok"),
        (count(lit(1)).over(byEmb) === count(lit(1)).over(bySig))
          .as("discrim_ok"))
    })
  )

  /** The closed-form pixel term, shared by every image oracle below —
    * MUST stay in sync with [[MediaCodec.pixel]] (and the replica in
    * tools/check_mm04.py). The oracle never parses a PNG: it evaluates
    * this formula over the (x, y, c) grid and the engine must arrive at
    * the same numbers through a REAL ImageIO encode->decode round trip
    * — a wrong stride/channel order/color model breaks the equality. */
  private val PixelSql = "(doc_id*31 + x*7 + y*13 + c*101 + x*y) % 256"

  /** Full max-dims pixel grid (dims are bounded 8..16 x 8..14 by
    * MediaCodec.dims) joined under the per-image bound — DuckDB's range()
    * cannot take correlated args, so the grid is fixed and filtered. */
  private val GridSql =
    """g AS (SELECT x, y, c
      |  FROM range(0, 16) rx(x), range(0, 14) ry(y), range(0, 3) rc(c)),
      |img AS (SELECT doc_id, (8 + doc_id % 9) AS w, (8 + doc_id % 7) AS h
      |  FROM documents WHERE doc_id % 3 = 0)""".stripMargin

  /** The closed-form signed 16-bit sample term — MUST stay in sync with
    * [[MediaCodec.sample]] (and the replica in tools/check_mm04.py). The
    * oracle never parses a WAV: the engine must arrive at these numbers
    * through a REAL AudioSystem encode->decode round trip. */
  private val SampleSql = "((doc_id*37 + i*11 + i*i) % 65536) - 32768"

  /** The closed-form per-frame pixel term — MUST stay in sync with
    * [[MediaCodec.vpixel]] (and the replica in tools/check_mm04.py). The
    * oracle never parses an AVI: the engine must arrive at these numbers
    * through a REAL container-parse + per-frame PNG decode. */
  private val VPixelSql = "(s*31 + f*17 + x*7 + y*13 + c*101 + x*y) % 256"

  /** Full max-bounds (f, x, y, c) frame grid (frame counts bounded 4..11
    * by [[MediaCodec.frameCount]], dims by [[MediaCodec.dims]]) filtered
    * under the per-video bounds — the video twin of [[GridSql]]. `s` is
    * the video GROUP SEED ([[MediaCodec.vseed]]): every stat derives
    * from the seed because the payload IS the seed's container. */
  private val VideoGridSql =
    """gv AS (SELECT f, x, y, c
      |  FROM range(0, 11) rf(f), range(0, 16) rx(x), range(0, 14) ry(y),
      |       range(0, 3) rc(c)),
      |vid AS (SELECT doc_id, s, (8 + s % 9) AS w, (8 + s % 7) AS h,
      |    (4 + s % 8) AS nf
      |  FROM (SELECT doc_id, doc_id - 3 * ((doc_id // 3) % 5) AS s
      |        FROM documents WHERE doc_id % 3 = 2))""".stripMargin

  /** Full max-count sample grid (counts bounded 256..512 by
    * [[MediaCodec.sampleCount]]) filtered under the per-media bound —
    * the audio twin of [[GridSql]]. */
  private val AudioGridSql =
    """ga AS (SELECT i FROM range(0, 512) ri(i)),
      |aud AS (SELECT doc_id, (256 + doc_id % 257) AS n
      |  FROM documents WHERE doc_id % 3 = 1)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // mm04 (r13): the audit oracle — DuckDB recomputes every media's
    // 8-slot closed-form embedding (flat-index % 8 chunked sums in the
    // kernels' raster/sample order) and the identical-twin census, and
    // asserts the engine's contract booleans as TRUE literals (the
    // engine-evaluated-bound tier, same standing as sim09's audit).
    // The emb_sig equality is the strong half: it pins the WHOLE
    // embedding, per media, across the real PNG/WAV/AVI decode.
    "mm04_media_embed_knn" ->
      s"""WITH $GridSql,
         |islot AS (
         |  SELECT img.doc_id, ((y * w + x) * 3 + c) % 8 AS r,
         |    SUM($PixelSql) AS sv
         |  FROM img JOIN g ON x < w AND y < h
         |  GROUP BY 1, 2),
         |$AudioGridSql,
         |aslot AS (
         |  SELECT aud.doc_id, i % 8 AS r, SUM($SampleSql) AS sv
         |  FROM aud JOIN ga ON i < n
         |  GROUP BY 1, 2),
         |$VideoGridSql,
         |vslot AS (
         |  SELECT vid.doc_id, (((f * h + y) * w + x) * 3 + c) % 8 AS r,
         |    SUM($VPixelSql) AS sv
         |  FROM vid JOIN gv ON f < nf AND x < w AND y < h
         |  GROUP BY 1, 2),
         |slots AS (SELECT * FROM islot UNION ALL SELECT * FROM aslot
         |  UNION ALL SELECT * FROM vslot),
         |sig AS (
         |  SELECT doc_id,
         |    string_agg(CAST(CAST(sv AS BIGINT) AS VARCHAR), ':' ORDER BY r)
         |      AS emb_sig,
         |    SUM(sv * sv) AS nrm2
         |  FROM slots GROUP BY doc_id),
         |twin AS (
         |  SELECT doc_id % 3 AS tk, emb_sig AS tsig
         |  FROM sig WHERE nrm2 > 0 GROUP BY 1, 2 HAVING COUNT(*) > 1)
         |SELECT s.doc_id AS media_id,
         |  ['image','audio','video'][(s.doc_id % 3 + 1)::INT] AS kind,
         |  s.emb_sig AS emb_sig,
         |  t.tsig IS NOT NULL AS has_twin,
         |  TRUE AS dup_recall_ok,
         |  TRUE AS le1_row,
         |  TRUE AS sound_ok
         |FROM sig s LEFT JOIN twin t
         |  ON s.doc_id % 3 = t.tk AND s.emb_sig = t.tsig""".stripMargin,

    // mm06 (r15): the real-weights encoder's contract oracle — DuckDB
    // recomputes the closed-form content signature (the decode-path pin,
    // same CTEs as mm04) for the count-exact media domain and asserts
    // the engine's contract booleans as TRUE literals: real-embedding
    // dimension, unit norm, twin determinism, and distinct-content
    // discrimination (the audio-normalization behavioral pin).
    "mm06_media_embed_real" ->
      s"""WITH $GridSql,
         |islot AS (
         |  SELECT img.doc_id, ((y * w + x) * 3 + c) % 8 AS r,
         |    SUM($PixelSql) AS sv
         |  FROM img JOIN g ON x < w AND y < h
         |  GROUP BY 1, 2),
         |$AudioGridSql,
         |aslot AS (
         |  SELECT aud.doc_id, i % 8 AS r, SUM($SampleSql) AS sv
         |  FROM aud JOIN ga ON i < n
         |  GROUP BY 1, 2),
         |$VideoGridSql,
         |vslot AS (
         |  SELECT vid.doc_id, (((f * h + y) * w + x) * 3 + c) % 8 AS r,
         |    SUM($VPixelSql) AS sv
         |  FROM vid JOIN gv ON f < nf AND x < w AND y < h
         |  GROUP BY 1, 2),
         |slots AS (SELECT * FROM islot UNION ALL SELECT * FROM aslot
         |  UNION ALL SELECT * FROM vslot),
         |sig AS (
         |  SELECT doc_id,
         |    string_agg(CAST(CAST(sv AS BIGINT) AS VARCHAR), ':' ORDER BY r)
         |      AS emb_sig
         |  FROM slots GROUP BY doc_id)
         |SELECT doc_id AS media_id,
         |  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
         |  emb_sig,
         |  TRUE AS dim_ok,
         |  TRUE AS unit_norm_ok,
         |  TRUE AS twin_ok,
         |  TRUE AS discrim_ok
         |FROM sig""".stripMargin,

    // width/height: the payload's true dims — the doc's own for image,
    // the GROUP SEED's for video (duplicate runs share one payload),
    // the legacy text stand-ins for audio
    "mm01_media_catalog" ->
      """WITH m AS (SELECT doc_id, n_chars,
        |    CASE WHEN doc_id % 3 = 2
        |      THEN doc_id - 3 * ((doc_id // 3) % 5) ELSE doc_id END AS s
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
        |  CASE WHEN doc_id % 3 = 1 THEN (n_chars % 640)::INT
        |    ELSE (8 + s % 9)::INT END AS width,
        |  CASE WHEN doc_id % 3 = 1 THEN (n_chars % 480)::INT
        |    ELSE (8 + s % 7)::INT END AS height,
        |  3 AS channels
        |FROM m""".stripMargin,

    // mm02: image rows check the REAL ImageIO decode against the pixel
    // closed form; audio rows check the REAL AudioSystem WAV decode
    // against the sample closed form (the oracle never parses a WAV —
    // PCM is lossless, so decoded sample sums must land on the formula);
    // video rows (r12) check the REAL AVI parse + frame decodes against
    // the per-frame closed form the same way — every tier's codec path
    // validated end-to-end against arithmetic DuckDB evaluates itself.
    "mm02_media_features" ->
      s"""WITH $GridSql,
        |ipx AS (
        |  SELECT img.doc_id, w * h * 3 AS n_bytes,
        |    SUM($PixelSql) AS checksum
        |  FROM img JOIN g ON g.x < img.w AND g.y < img.h
        |  GROUP BY img.doc_id, w, h),
        |$AudioGridSql,
        |apx AS (
        |  SELECT aud.doc_id, n * 2 AS n_bytes,
        |    SUM($SampleSql) AS checksum
        |  FROM aud JOIN ga ON ga.i < aud.n
        |  GROUP BY aud.doc_id, n),
        |$VideoGridSql,
        |vpx AS (
        |  SELECT vid.doc_id, nf * w * h * 3 AS n_bytes,
        |    SUM($VPixelSql) AS checksum
        |  FROM vid JOIN gv ON gv.f < vid.nf AND gv.x < vid.w
        |    AND gv.y < vid.h
        |  GROUP BY vid.doc_id, s, nf, w, h),
        |f AS (
        |  SELECT doc_id, 'image' AS kind, n_bytes, checksum FROM ipx
        |  UNION ALL
        |  SELECT doc_id, 'audio' AS kind, n_bytes, checksum FROM apx
        |  UNION ALL
        |  SELECT doc_id, 'video' AS kind, n_bytes, checksum FROM vpx)
        |SELECT kind, COUNT(*) AS n_media,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(SUM(checksum) AS BIGINT) AS total_checksum
        |FROM f GROUP BY kind""".stripMargin,

    "mm03_frame_sample" ->
      """SELECT doc_id AS media_id,
        |  unnest(range(0, 4 + (doc_id - 3 * ((doc_id // 3) % 5)) % 8, 2))
        |    AS frame_idx
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,

    // mm05: stride-2 downsample of the synth pixels — out(x,y,c) =
    // in(2x,2y,c), dims = ceil(in/2). The engine decodes a real PNG,
    // downsamples, re-encodes, re-decodes; the oracle walks the even
    // grid of the closed form. Lossless round trips make them equal.
    "mm05_media_resize" ->
      s"""WITH $GridSql
        |SELECT img.doc_id AS media_id,
        |  ((w + 1) // 2)::INT AS width,
        |  ((h + 1) // 2)::INT AS height,
        |  (((w + 1) // 2) * ((h + 1) // 2) * 3)::INT AS n_bytes,
        |  CAST(SUM($PixelSql) AS BIGINT) AS checksum
        |FROM img JOIN g ON g.x < img.w AND g.y < img.h
        |  AND g.x % 2 = 0 AND g.y % 2 = 0
        |GROUP BY img.doc_id, w, h""".stripMargin
  )
}
