package graft

import graft.operators.Multimodal
import graft.plans.{Jpeg, Phash}
import org.scalatest.funsuite.AnyFunSuite

/** The baseline-JPEG decoder (plans.Jpeg) against three independent
  * truths: the planted block values the repo's own encoder wrote, the
  * JDK's ImageIO decode of the SAME bytes, and JDK-ENCODED JPEGs
  * (default-quality, 4:2:0 for RGB) whose Huffman tables / subsampling
  * exercise the general-decoder paths the minimal repo encoder never
  * emits. Plus the totality contract: malformed payloads are NULL,
  * never a throw.
  */
class JpegSpec extends AnyFunSuite {

  private def blockVal(bx: Int, by: Int): Int =
    Multimodal.plantedLuma(42L, bx, by)

  test("planted baseline JPEG round-trips its block-constant luma exactly") {
    for ((w, h) <- Seq((96, 72), (17, 9), (8, 8), (1, 1), (65, 16))) {
      val bytes = Multimodal.buildJpegReal(w, h, blockVal)
      val got = Jpeg.decodeLuma(bytes)
      assert(got != null, s"decode failed at ${w}x$h")
      val (g, gw, gh) = got
      assert(gw == w && gh == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(g(y * w + x) == blockVal(x / 8, y / 8),
          s"pixel ($x,$y) of ${w}x$h: ${g(y * w + x)} != planted")
    }
  }

  test("javax.imageio agrees the planted JPEG decodes to the planted blocks") {
    val (w, h) = (40, 24)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.buildJpegReal(w, h, blockVal)))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      val v = blockVal(x / 8, y / 8)
      // gray chroma: the JDK must reconstruct r = g = b = planted
      assert(r == v && g == v && b == v,
        s"ImageIO pixel ($x,$y): ($r,$g,$b) != planted $v")
    }
  }

  /** Deterministic "photographic" content: gradient + hash noise. */
  private def scene(x: Int, y: Int): Int =
    ((x * 3 + y * 2) / 2 + (Multimodal.plantedLuma(7L, x, y) % 32)) & 0xff

  test("JDK-encoded grayscale JPEG: decoder matches ImageIO within IDCT rounding") {
    val (w, h) = (75, 41) // non-multiple-of-8 crop, single component
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = scene(x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val got = Jpeg.decodeLuma(bytes)
    assert(got != null, "JDK grayscale JPEG must decode")
    val (g, gw, gh) = got
    assert(gw == w && gh == h)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w) {
      // RAW raster samples: TYPE_BYTE_GRAY is a LINEAR colorspace, so
      // getRGB would gamma-convert what the codec actually decoded
      val d = math.abs(g(y * w + x) - ref.getRaster.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d)
      sumDiff += d
    }
    // both decode the same coefficients; differences are IDCT rounding
    assert(maxDiff <= 2, s"max pixel diff $maxDiff > 2 vs ImageIO")
    assert(sumDiff.toDouble / (w * h) <= 0.5,
      s"mean pixel diff ${sumDiff.toDouble / (w * h)} > 0.5")
  }

  test("JDK-encoded RGB JPEG (4:2:0 subsampling): luma matches within chroma rounding") {
    val (w, h) = (50, 34)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = scene(x, y)
      val g2 = scene(x + 13, y)
      val b = scene(x, y + 29)
      img.setRGB(x, y, (r << 16) | (g2 << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    // the JDK RGB writer subsamples chroma — our decoder must walk the
    // multi-block MCUs correctly to keep the luma plane aligned
    val got = Jpeg.decodeLuma(bytes)
    assert(got != null, "JDK RGB JPEG must decode")
    val (g, gw, gh) = got
    assert(gw == w && gh == h)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val (r, g2, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      // JFIF luma recovered from the decoded RGB
      val refY = math.round(0.299 * r + 0.587 * g2 + 0.114 * b).toInt
      val d = math.abs(g(y * w + x) - refY)
      maxDiff = math.max(maxDiff, d)
      sumDiff += d
    }
    assert(maxDiff <= 4, s"max luma diff $maxDiff > 4 vs ImageIO-derived Y")
    assert(sumDiff.toDouble / (w * h) <= 1.5,
      s"mean luma diff ${sumDiff.toDouble / (w * h)} > 1.5")
  }

  test("totality: malformed JPEG payloads are NULL, never a throw") {
    // the header-only JFIF skeleton has no tables and no entropy data
    assert(Jpeg.decodeLuma(Multimodal.buildJpeg(10, 10, 3)) == null)
    // progressive refusal: flip the planted SOF0 marker to SOF2
    val real = Multimodal.buildJpegReal(16, 16, blockVal)
    val prog = real.clone()
    val sofAt = real.indices.find(i => (real(i) & 0xff) == 0xff &&
      i + 1 < real.length && (real(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decodeLuma(prog) == null)
    // truncations at every interesting boundary
    for (cut <- Seq(2, 10, 30, 100, real.length - 3))
      assert(Jpeg.decodeLuma(java.util.Arrays.copyOf(real, cut)) == null,
        s"truncation at $cut must refuse")
    // corrupted entropy data must not loop or throw
    val corrupt = real.clone()
    corrupt(real.length - 10) = 0xff.toByte
    Jpeg.decodeLuma(corrupt) // any result, no throw
    // random bytes behind an SOI magic
    val rnd = new scala.util.Random(7)
    val junk = Array.fill(512)(rnd.nextInt(256).toByte)
    junk(0) = 0xff.toByte; junk(1) = 0xd8.toByte
    Jpeg.decodeLuma(junk) // no throw
    // dimension bomb: SOF claiming huge dims over the pixel cap
    assert(Phash.dhash(Multimodal.buildJpeg(65535, 65535, 3)) == null)
  }

  test("graft_dhash and graft_luma_resize cover JPEG payloads (format dispatch)") {
    val jpeg = Multimodal.buildJpegReal(48, 32, blockVal)
    val dh = Phash.dhash(jpeg)
    assert(dh != null, "dhash must cover baseline JPEG now")
    // one full-block edit moves only that block's gradient bits
    val edited = Multimodal.buildJpegReal(48, 32,
      (bx, by) => if (bx == 2 && by == 1) (blockVal(2, 1) + 128) & 0xff
        else blockVal(bx, by))
    val dh2 = Phash.dhash(edited)
    assert(dh2 != null)
    val hamming = java.lang.Long.bitCount(dh ^ dh2)
    assert(hamming <= 8, s"one-block edit moved $hamming bits")
    // identical planted JPEG and PNG pixel content → identical dHash:
    // the decode dispatch is format-transparent above the pixel layer
    val pngTwin = Multimodal.buildPng(48, 32, (x, y) => blockVal(x / 8, y / 8))
    assert(Phash.dhash(pngTwin) == dh,
      "same pixels through PNG and JPEG must hash identically")
  }
}
