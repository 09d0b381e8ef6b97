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

  test("metadata-only catalog plan never synthesizes a payload") {
    val plan = SparkEntry.queries("mm01_media_catalog")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("png_synth"), plan)
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
