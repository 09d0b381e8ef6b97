package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL image kernels on the JDK's headless ImageIO — no external codec
  * library needed, which is what kept these stubbed for three rounds.
  *
  * The contract that makes the decode path ORACLE-CHECKABLE without the
  * oracle ever touching a PNG: image payloads are synthesized from a
  * CLOSED-FORM pixel formula of the media id ([[pixel]]), encoded to a
  * real PNG here, and decoded back by the query kernels. PNG is lossless,
  * so every pixel statistic the engine reports after a true
  * encode→decode round trip must equal the closed form — which DuckDB
  * evaluates directly over (id, x, y, c) ranges. A wrong decode (stride,
  * channel order, color model, sub-sampling) breaks the equality; a
  * checksum-shaped stub cannot fake it.
  *
  * Synthesis lives in the engine rather than the fixture because the
  * driver's own testdata has no media table — `documents` is the only
  * corpus both engines see, so the catalog derives payloads from doc_id
  * deterministically on both sides (SURVEY.md §1.2: the reference is
  * strings-only; this whole tier is pipeline-extras).
  *
  * AUDIO runs the same recipe through `javax.sound.sampled` (r12):
  * closed-form 16-bit PCM synthesized from the media id ([[sample]]),
  * encoded to a REAL RIFF/WAVE container by the JDK's WAV writer, and
  * decoded back by the query kernels through `AudioSystem` — PCM WAV is
  * lossless, so decoded sample stats must equal the closed form the SQL
  * oracle evaluates over (id, i) ranges. A wrong decode (byte order,
  * sample width, header offset) breaks the equality the same way a
  * wrong PNG stride does.
  *
  * VIDEO (r12) closes the last stub with the same recipe one level up:
  * the JDK ships no video CODEC, but AVI is a CONTAINER — and an AVI
  * whose frames are PNG-compressed (`MPNG` fourcc, the lossless
  * PNG-in-AVI format ffmpeg/VLC read and `ffmpeg -c:v png` writes) is a
  * real, standard video file the JDK can fully produce: the engine
  * implements the RIFF/AVI container (headers, stream list, movi
  * chunks, idx1 index) and ImageIO supplies the frame codec. Frames are
  * closed-form ([[vpixel]], a per-frame term over the image formula),
  * PNG is lossless, so a true container-parse → frame-decode round trip
  * must reproduce every frame statistic the SQL oracle evaluates over
  * (id, f, x, y, c) ranges. A wrong chunk walk (padding, list nesting,
  * index offsets) or frame decode breaks the equality exactly the way a
  * wrong PNG stride does.
  */
object MediaCodec {
  // ImageIO must never touch a display; encode/decode are pure-memory.
  System.setProperty("java.awt.headless", "true")
  // ...and must never touch DISK either: by default every ImageIO
  // read/write spools through a temp-FILE-backed stream cache (one file
  // create+delete in java.io.tmpdir per codec call). At one decode per
  // image that was lost in the noise; with the video tier's ~10^5
  // PNG ops per query it serialized the whole 32-wide stage behind
  // tmpfile creation (and made it SLOWER wide than narrow — filesystem
  // contention). Memory-cached streams are pure CPU.
  ImageIO.setUseCache(false)

  /** Image dims, bounded 8..16 x 8..14 — big enough to exercise strides
    * and odd/even resize edges, small enough that the SQL oracle can
    * brute-force every (x, y, c) term. */
  def dims(id: Long): (Int, Int) =
    ((8 + id % 9).toInt, (8 + id % 7).toInt)

  /** Closed-form channel value, replicated verbatim in the DuckDB
    * oracles and in tools/check_mm04.py: keep the four terms in sync or
    * every mm oracle fails loudly. */
  def pixel(id: Long, x: Int, y: Int, c: Int): Int =
    ((id * 31 + x * 7 + y * 13 + c * 101 + x.toLong * y) % 256).toInt

  def synth(id: Long): BufferedImage = {
    val (w, h) = dims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (pixel(id, x, y, 0) << 16) |
          (pixel(id, x, y, 1) << 8) | pixel(id, x, y, 2))
        x += 1
      }
      y += 1
    }
    img
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream(1024)
    if (!ImageIO.write(img, "png", bos))
      sys.error("JDK PNG writer unavailable")
    bos.toByteArray
  }

  def pngBytes(id: Long): Array[Byte] = encodePng(synth(id))

  def decode(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) sys.error("payload is not a decodable image")
    img
  }

  /** RGB channel values in (y, x, c) raster order — the canonical pixel
    * serialization every consumer (stats, embeddings, checker replicas)
    * agrees on. */
  def pixels(img: BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](w * h * 3)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(i) = (rgb >> 16) & 0xff; out(i + 1) = (rgb >> 8) & 0xff
        out(i + 2) = rgb & 0xff
        i += 3
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------- audio (real WAV)

  /** Mono 16 kHz — matches the catalog's meta.sample_rate, and the WAV
    * header actually says so (decode asserts it). */
  private val SampleRate = 16000f

  /** Sample count, bounded 256..512 — large enough to exercise frame
    * accounting, small enough that the SQL oracle brute-forces every
    * (id, i) term the way the pixel oracles brute-force (x, y, c). */
  def sampleCount(id: Long): Int = (256 + id % 257).toInt

  /** Closed-form signed 16-bit sample, replicated verbatim in the mm02
    * DuckDB oracle and tools/check_mm04.py — keep the three in sync. */
  def sample(id: Long, i: Int): Int =
    ((id * 37 + i.toLong * 11 + i.toLong * i) % 65536L).toInt - 32768

  /** Raw little-endian 16-bit PCM of the closed form. */
  def synthPcm(id: Long): Array[Byte] = {
    val n = sampleCount(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sample(id, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    pcm
  }

  /** Real RIFF/WAVE encode via the JDK's writer (PCM_SIGNED, 16-bit,
    * mono, little-endian). */
  def encodeWav(pcm: Array[Byte]): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, SampleRate,
      16, 1, 2, SampleRate, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      pcm.length / 2)
    val bos = new ByteArrayOutputStream(pcm.length + 64)
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  def wavBytes(id: Long): Array[Byte] = encodeWav(synthPcm(id))

  /** Decode a WAV payload back to its samples through the real parser
    * (header walk + format negotiation), asserting the PCM contract the
    * catalog wrote — a truncated or misread header fails loudly. */
  def decodeWav(bytes: Array[Byte]): Array[Int] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val f = ais.getFormat
    require(f.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
      s"payload is not 16-bit mono LE PCM wav: $f")
    val raw = ais.readAllBytes()
    val out = new Array[Int](raw.length / 2)
    var i = 0
    while (i < out.length) {
      // high byte sign-extends through the int shift; low byte masked
      out(i) = (raw(2 * i + 1).toInt << 8) | (raw(2 * i) & 0xff)
      i += 1
    }
    out
  }

  // -------------------------------------------- video (real AVI/MPNG)

  /** Frames per video, bounded 4..11 — enough to exercise chunk walking
    * and frame accounting, small enough that the SQL oracle brute-forces
    * the whole (f, x, y, c) grid. */
  def frameCount(id: Long): Int = (4 + id % 8).toInt

  /** Video GROUP seed: runs of 5 consecutive video ids (ids ≡ 2 mod 3,
    * so the seed is id - 3*((id/3) % 5), itself a video id) share one
    * seed and thus byte-identical payloads — planted exact-duplicate
    * videos. With every kind now on a real codec the embeddings would
    * otherwise be pairwise distinct, and the duplicate mega-bucket case
    * mm04's sorted-neighborhood ring exists for (the duplicate clusters
    * every crawl corpus actually has) would vanish from the fixture and
    * from tools/check_mm04.py's recall tier. */
  def vseed(id: Long): Long = id - 3 * ((id / 3) % 5)

  /** Frames per second stamped in the container (and asserted back by
    * the decoder — a misread header fails loudly). */
  val VideoFps = 4

  /** Closed-form channel value of frame f — the image formula plus a
    * per-frame term. Replicated verbatim in the mm02 DuckDB oracle and
    * tools/check_mm04.py: keep the three in sync. */
  def vpixel(id: Long, f: Int, x: Int, y: Int, c: Int): Int =
    ((id * 31 + f * 17 + x * 7 + y * 13 + c * 101 + x.toLong * y) % 256).toInt

  private def synthFrame(id: Long, f: Int): BufferedImage = {
    val (w, h) = dims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (vpixel(id, f, x, y, 0) << 16) |
          (vpixel(id, f, x, y, 1) << 8) | vpixel(id, f, x, y, 2))
        x += 1
      }
      y += 1
    }
    img
  }

  private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }
  private def fcc(b: java.io.ByteArrayOutputStream, s: String): Unit =
    b.write(s.getBytes("US-ASCII"))

  /** Real AVI writer: RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh
    * 'vids'/'MPNG', strf BITMAPINFOHEADER}} → LIST(movi){'00dc' = one
    * PNG per frame, even-padded} → idx1. Layout follows the OpenDML/
    * VfW AVI spec; the result is a playable MPNG video. */
  def encodeAvi(id: Long): Array[Byte] = {
    val (w, h) = dims(id)
    val n = frameCount(id)
    val frames = (0 until n).map(f => encodePng(synthFrame(id, f)))
    val maxFrame = frames.map(_.length).max

    val strf = new ByteArrayOutputStream(48)
    le32(strf, 40); le32(strf, w); le32(strf, h)            // biSize, dims
    le16(strf, 1); le16(strf, 24)                            // planes, bpp
    fcc(strf, "MPNG")                                        // biCompression
    le32(strf, w * h * 3); le32(strf, 0); le32(strf, 0)      // sizeImage, ppm
    le32(strf, 0); le32(strf, 0)                             // clrUsed/Imp

    val strh = new ByteArrayOutputStream(64)
    fcc(strh, "vids"); fcc(strh, "MPNG")
    le32(strh, 0); le32(strh, 0); le32(strh, 0)   // flags, prio+lang, initial
    le32(strh, 1); le32(strh, VideoFps)           // scale, rate => fps
    le32(strh, 0); le32(strh, n)                  // start, length (frames)
    le32(strh, maxFrame); le32(strh, -1); le32(strh, 0) // bufsize, quality, sampleSize
    le16(strh, 0); le16(strh, 0); le16(strh, w); le16(strh, h) // rcFrame

    val avih = new ByteArrayOutputStream(64)
    le32(avih, 1000000 / VideoFps)                // usec per frame
    le32(avih, maxFrame * VideoFps); le32(avih, 0) // maxBytesPerSec, padding
    le32(avih, 0x10)                              // AVIF_HASINDEX
    le32(avih, n); le32(avih, 0); le32(avih, 1)   // totalFrames, initial, streams
    le32(avih, maxFrame); le32(avih, w); le32(avih, h)
    (0 until 4).foreach(_ => le32(avih, 0))       // reserved

    def chunk(id4: String, body: Array[Byte]): Array[Byte] = {
      val b = new ByteArrayOutputStream(body.length + 9)
      fcc(b, id4); le32(b, body.length); b.write(body, 0, body.length)
      if (body.length % 2 == 1) b.write(0)        // RIFF chunks even-align
      b.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", {
        val b = new ByteArrayOutputStream(body.length + 4)
        fcc(b, kind); b.write(body, 0, body.length); b.toByteArray
      })

    val strl = list("strl",
      chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)
    val moviBody = new ByteArrayOutputStream(frames.map(_.length + 9).sum)
    val offsets = frames.map { png =>
      val off = moviBody.size() + 4 // offset of the chunk fourcc from 'movi'
      val c = chunk("00dc", png)
      moviBody.write(c, 0, c.length)
      (off, png.length)
    }
    val movi = list("movi", moviBody.toByteArray)
    val idx = new ByteArrayOutputStream(16 * n)
    offsets.foreach { case (off, len) =>
      fcc(idx, "00dc"); le32(idx, 0x10); le32(idx, off); le32(idx, len)
    }
    val riffBody = hdrl ++ movi ++ chunk("idx1", idx.toByteArray)
    val out = new ByteArrayOutputStream(riffBody.length + 12)
    fcc(out, "RIFF"); le32(out, riffBody.length + 4); fcc(out, "AVI ")
    out.write(riffBody, 0, riffBody.length)
    out.toByteArray
  }

  /** The catalog payload: the id's GROUP SEED is what gets encoded, so
    * a 5-run of video ids carries byte-identical containers. */
  def aviBytes(id: Long): Array[Byte] = encodeAvi(vseed(id))

  /** Decoded video: container-asserted dims/fps plus per-frame pixel
    * rasters in [[pixels]] order. */
  final case class Video(width: Int, height: Int, fps: Int,
    frames: IndexedSeq[Array[Int]])

  /** Real AVI reader: walks the RIFF chunk tree (sizes + even padding,
    * LIST nesting), asserts the MPNG stream contract from strh/strf,
    * collects the movi '00dc' payloads, and ImageIO-decodes each frame.
    * A truncated chunk, a bad list size, or a frame-count mismatch
    * between avih and the movi stream fails loudly. */
  def decodeAvi(bytes: Array[Byte]): Video = {
    def rd32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ",
      "payload is not a RIFF/AVI container")
    require(rd32(4) + 8 <= bytes.length, "RIFF size exceeds payload")
    var totalFrames = -1; var w = -1; var h = -1; var fps = -1
    var handlerOk = false
    val frames = IndexedSeq.newBuilder[Array[Int]]
    // walk(): chunks of [off, end); LIST recurses with its kind tag
    def walk(off0: Int, end: Int): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = tag(off); val sz = rd32(off + 4)
        // sz is read signed: a corrupt high bit would make it negative,
        // pass the overrun require (body + sz < end), and step the walk
        // BACKWARDS — an infinite loop instead of the loud failure this
        // decoder promises. Reject it explicitly.
        require(sz >= 0, s"chunk $id size is negative (corrupt container)")
        val body = off + 8
        require(body + sz <= end, s"chunk $id overruns its parent")
        id match {
          case "LIST" => walk(body + 4, body + sz) // skip the kind fourcc
          case "avih" =>
            val usecPerFrame = rd32(body)
            require(usecPerFrame > 0,
              "avih usecPerFrame must be positive (corrupt container)")
            fps = 1000000 / usecPerFrame
            totalFrames = rd32(body + 16)
            w = rd32(body + 32); h = rd32(body + 36)
          case "strh" =>
            require(tag(body) == "vids" && tag(body + 4) == "MPNG",
              s"stream is not MPNG video: ${tag(body)}/${tag(body + 4)}")
            handlerOk = true
          case "strf" =>
            require(tag(body + 16) == "MPNG",
              "BITMAPINFOHEADER compression is not MPNG")
          case "00dc" =>
            frames += pixels(decode(
              java.util.Arrays.copyOfRange(bytes, body, body + sz)))
          case _ => () // idx1 / JUNK: valid, not needed for decode
        }
        off = body + sz + (sz & 1) // even alignment
      }
    }
    walk(12, rd32(4) + 8)
    val fs = frames.result()
    require(handlerOk, "no MPNG video stream declared")
    require(totalFrames == fs.length,
      s"avih declares $totalFrames frames, movi carries ${fs.length}")
    Video(w, h, fps, fs)
  }

  /** Stride-2 nearest-neighbor downsample: out(x, y) = in(2x, 2y),
    * out dims = ceil(in/2). Exactly SQL-replicable (unlike an averaging
    * kernel, whose rounding the oracle would have to bit-match), and a
    * legitimate pyramid level for thumbnail/embedding stages. */
  def downsample(img: BufferedImage): BufferedImage = {
    val w2 = (img.getWidth + 1) / 2; val h2 = (img.getHeight + 1) / 2
    val out = new BufferedImage(w2, h2, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        out.setRGB(x, y, img.getRGB(2 * x, 2 * y))
        x += 1
      }
      y += 1
    }
    out
  }
}
