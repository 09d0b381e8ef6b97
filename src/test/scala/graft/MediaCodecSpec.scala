package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MediaCodec

/** The real-ImageIO media tier: PNG round trips must be bit-lossless
  * against the closed-form synth (the property every mm oracle leans
  * on), the downsample must be the exact stride-2 closed form, and the
  * catalog must keep payload synthesis OUT of metadata-only plans. */
class MediaCodecSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()

  test("PNG encode -> ImageIO decode round trip is pixel-lossless") {
    Seq(0L, 3L, 6L, 9L, 123L, 4567L).foreach { id =>
      val direct = MediaCodec.pixels(MediaCodec.synth(id))
      val roundTrip = MediaCodec.pixels(
        MediaCodec.decode(MediaCodec.pngBytes(id)))
      assert(roundTrip.sameElements(direct), s"id=$id")
      val (w, h) = MediaCodec.dims(id)
      assert(direct.length == w * h * 3)
      // and the raster equals the closed form term-for-term
      var i = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        assert(direct(i) == MediaCodec.pixel(id, x, y, c),
          s"id=$id ($x,$y,$c)")
        i += 1
      }
    }
  }

  test("payload bytes are a REAL PNG (magic + IHDR dims)") {
    val b = MediaCodec.pngBytes(12L)
    val magic = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)
    assert(magic.zipWithIndex.forall { case (m, i) => (b(i) & 0xff) == m })
    val (w, h) = MediaCodec.dims(12L)
    // IHDR: 4-byte big-endian width at offset 16, height at 20
    def be32(o: Int) = (0 until 4).foldLeft(0)((a, i) =>
      (a << 8) | (b(o + i) & 0xff))
    assert(be32(16) == w && be32(20) == h)
  }

  test("downsample is the exact stride-2 closed form at odd and even dims") {
    Seq(3L, 6L, 12L, 33L).foreach { id => // mix of odd/even w, h
      val (w, h) = MediaCodec.dims(id)
      val down = MediaCodec.downsample(MediaCodec.synth(id))
      assert(down.getWidth == (w + 1) / 2 && down.getHeight == (h + 1) / 2)
      val px = MediaCodec.pixels(down)
      var i = 0
      for (y <- 0 until down.getHeight; x <- 0 until down.getWidth;
           c <- 0 until 3) {
        assert(px(i) == MediaCodec.pixel(id, 2 * x, 2 * y, c),
          s"id=$id out($x,$y,$c)")
        i += 1
      }
    }
  }

  // ---- audio (real WAV via javax.sound.sampled) ----------------------

  test("WAV encode -> AudioSystem decode round trip is sample-lossless") {
    Seq(1L, 4L, 7L, 10L, 124L, 4568L).foreach { id =>
      val n = MediaCodec.sampleCount(id)
      assert(n >= 256 && n <= 512)
      val back = MediaCodec.decodeWav(MediaCodec.wavBytes(id))
      assert(back.length == n, s"id=$id")
      var i = 0
      while (i < n) { // every decoded sample equals the closed form
        assert(back(i) == MediaCodec.sample(id, i), s"id=$id i=$i")
        i += 1
      }
    }
  }

  test("payload bytes are a REAL RIFF/WAVE (magic + fmt fields)") {
    val b = MediaCodec.wavBytes(13L)
    assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
    // fmt chunk: PCM tag 1, mono, 16000 Hz, 16-bit (little-endian fields
    // at canonical offsets — the JDK writer emits the canonical layout)
    def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int) = (0 until 4).foldLeft(0)((a, i) =>
      a | ((b(o + i) & 0xff) << (8 * i)))
    assert(le16(20) == 1 && le16(22) == 1)
    assert(le32(24) == 16000)
    assert(le16(34) == 16)
  }

  test("closed-form samples span both signs and full 16-bit range use") {
    // the checksum oracle would be insensitive to a sign-extension bug
    // if every sample were positive; pin that the fixture exercises both
    val all = Seq(1L, 4L, 7L).flatMap { id =>
      (0 until MediaCodec.sampleCount(id)).map(MediaCodec.sample(id, _))
    }
    assert(all.exists(_ < 0) && all.exists(_ > 0))
    assert(all.forall(s => s >= -32768 && s <= 32767))
  }

  // ---- video (real AVI/MPNG container, ImageIO frame codec) -----------

  test("AVI encode -> container parse + frame decode is pixel-lossless") {
    Seq(2L, 5L, 8L, 11L, 125L, 4569L).foreach { id =>
      val v = MediaCodec.decodeAvi(MediaCodec.aviBytes(id))
      val s = MediaCodec.vseed(id) // payload = the GROUP SEED's container
      val (w, h) = MediaCodec.dims(s)
      assert(v.width == w && v.height == h, s"id=$id dims")
      assert(v.fps == MediaCodec.VideoFps, s"id=$id fps")
      assert(v.frames.length == MediaCodec.frameCount(s), s"id=$id frames")
      v.frames.zipWithIndex.foreach { case (px, f) =>
        var i = 0
        for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
          assert(px(i) == MediaCodec.vpixel(s, f, x, y, c),
            s"id=$id f=$f ($x,$y,$c)")
          i += 1
        }
      }
    }
    // the planted-duplicate contract: a 5-run of video ids shares one
    // byte-identical payload, the next run differs
    assert(MediaCodec.aviBytes(2L).sameElements(MediaCodec.aviBytes(14L)))
    assert(!MediaCodec.aviBytes(2L).sameElements(MediaCodec.aviBytes(17L)))
  }

  test("payload bytes are a REAL AVI (RIFF magic, MPNG stream, idx1)") {
    val b = MediaCodec.aviBytes(14L)
    assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(b.slice(8, 12), "US-ASCII") == "AVI ")
    val s = new String(b.map(x => if (x >= 32 && x < 127) x.toChar
      else '.').mkString)
    // stream declaration + index + frame chunks all present in the tree
    assert(s.contains("hdrl") && s.contains("vids") && s.contains("MPNG"))
    assert(s.contains("movi") && s.contains("00dc") && s.contains("idx1"))
  }

  test("AVI decode fails loudly on corrupted containers") {
    val good = MediaCodec.aviBytes(17L)
    // wrong magic
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](MediaCodec.decodeAvi(notRiff))
    // truncated mid-movi: the chunk walk must detect the overrun
    assertThrows[IllegalArgumentException](
      MediaCodec.decodeAvi(good.take(good.length / 2)))
  }

  test("metadata-only catalog plan never synthesizes a payload") {
    val plan = SparkEntry.queries("mm01_media_catalog")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("png_synth"), plan)
    assert(!plan.contains("wav_synth"), plan)
    assert(!plan.contains("avi_synth"), plan)
  }

  test("mm03 samples TRUE frame counts payload-pruned (no avi_synth)") {
    val q = SparkEntry.queries("mm03_frame_sample")(
      spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("avi_synth"), plan)
    val got = q.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = (0L until 500L).filter(_ % 3 == 2).flatMap { id =>
      (0 until MediaCodec.frameCount(MediaCodec.vseed(id)) by 2)
        .map(f => (id, f))
    }.toSet
    assert(got == want)
  }

  test("mm05 resize rows match the closed-form downsample stats") {
    val rows = SparkEntry.queries("mm05_media_resize")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = MediaCodec.dims(id)
      val (w2, h2) = ((w + 1) / 2, (h + 1) / 2)
      assert(r.getInt(1) == w2 && r.getInt(2) == h2)
      assert(r.getInt(3) == w2 * h2 * 3)
      var want = 0L
      for (y <- 0 until h2; x <- 0 until w2; c <- 0 until 3)
        want += MediaCodec.pixel(id, 2 * x, 2 * y, c)
      assert(r.getLong(4) == want, s"id=$id")
    }
  }
}
