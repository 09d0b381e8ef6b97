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
  * Video keeps the loudly-marked byte stub in [[Multimodal]] — the JDK
  * ships no video codec, and shipping a fake one as real would be worse
  * than a marked stub.
  */
object MediaCodec {
  // ImageIO must never touch a display; encode/decode are pure-memory.
  System.setProperty("java.awt.headless", "true")

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
