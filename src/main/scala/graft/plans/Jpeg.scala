package graft.plans

/** Pure-JVM baseline-JPEG pixel decode to the LUMA plane (VERDICT r12
  * #4) — the format real multimodal corpora are mostly made of, built
  * entirely from the public specification (ITU-T T.81): marker-segment
  * parse (DQT/DHT/SOF0-1/DRI/SOS), canonical Huffman entropy decode
  * with 0xFF00 byte-unstuffing and RSTn restart handling, dequantize,
  * 8×8 inverse DCT, and luma extraction. No codec library anywhere —
  * the same zero-dependency contract as the PNG path (plans.Phash).
  *
  * Scope and refusals (the total-ness contract — NULL, never throw):
  *   - baseline and extended-sequential Huffman frames (SOF0/SOF1)
  *     with 8-bit precision; progressive (SOF2), arithmetic coding,
  *     hierarchical and 12-bit frames refuse.
  *   - 1–4 components, sampling factors 1–4; only the FIRST component
  *     (Y by JFIF convention) is inverse-transformed — chroma blocks
  *     are entropy-decoded to advance the bitstream and then dropped,
  *     because every downstream consumer (dHash, resize, the ingest
  *     firewall) wants luma only. If the first component is subsampled
  *     relative to the frame grid its plane is replicated up — the
  *     nearest-neighbor convention.
  *   - dimension product capped at [[Phash.MaxPixels]] (adversarial
  *     headers cannot allocate unbounded planes).
  *
  * Decode exactness: an 8×8-block-constant image (the planted-truth
  * corpus shape) has DC-only coefficient blocks, and DC-only blocks
  * round-trip EXACTLY through quant 8 / dequant / IDCT in any
  * compliant implementation — which is what lets the DuckDB oracles
  * replay JPEG payload decode as pure doc_id arithmetic just like the
  * lossless PNG path. On general content (JDK-encoded photographs)
  * the spec cross-checks this decoder against javax.imageio within
  * IDCT rounding tolerance.
  */
object Jpeg {

  /** Zig-zag order: index in stream → natural position (T.81 Fig. 5). */
  private[plans] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) · C(u)/2 — the separable IDCT basis, fixed. */
  private val Basis: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        t(x * 8 + u) = 0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }

  /** Canonical Huffman table (T.81 Annex C): decode via the
    * mincode/maxcode/valptr walk — O(code length) per symbol. */
  private final class Huff(counts: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    val values: Array[Byte] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-segment bit reader with FF00 unstuffing. A marker byte
    * (FF xx, xx ≠ 00) ends the segment: RSTn markers are consumed by
    * [[restart]], anything else sets [[hitMarker]] and reads as EOF.
    */
  private final class Bits(b: Array[Byte], var pos: Int) {
    var acc = 0
    var cnt = 0
    var hitMarker = false

    /** Next bit, or -1 at end of data. */
    def bit(): Int = {
      if (cnt == 0) {
        if (hitMarker || pos >= b.length) return -1
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) { hitMarker = true; return -1 }
          val nx = b(pos) & 0xff
          if (nx == 0x00) pos += 1 // stuffed FF
          else { hitMarker = true; pos -= 1; return -1 }
          v = 0xff
        }
        acc = v
        cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit()
        if (x < 0) return Int.MinValue
        v = (v << 1) | x
        i += 1
      }
      v
    }

    /** Byte-align and consume an expected RSTn marker. False on
      * anything else. */
    def restart(): Boolean = {
      cnt = 0
      hitMarker = false
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xff) != 0xff) return false
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }

    def decode(h: Huff): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val x = bit()
        if (x < 0) return -1
        code = (code << 1) | x
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.values(h.valPtr(l) + code - h.minCode(l)) & 0xff
        l += 1
      }
      -1
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0
    else if (v < (1 << (t - 1))) v - (1 << t) + 1
    else v

  /** Decode the payload's luma plane, or null if it is not a
    * decodable baseline/extended-sequential Huffman JPEG. */
  def decodeLuma(b: Array[Byte]): (Array[Int], Int, Int) = {
    try decodeLuma0(b)
    catch { case _: ArrayIndexOutOfBoundsException => null }
  }

  // scalastyle:off method.length cyclomatic.complexity
  private def decodeLuma0(b: Array[Byte]): (Array[Int], Int, Int) = {
    if (b == null || b.length < 4) return null
    def u8(i: Int) = b(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (u8(0) != 0xff || u8(1) != 0xd8) return null

    val qt = Array.ofDim[Int](4, 64) // natural order
    val qtSeen = new Array[Boolean](4)
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var w = 0
    var h = 0
    var ncomp = 0
    // per component: sampling h, v, quant id; scan: dc table, ac table
    val ch = new Array[Int](4)
    val cv = new Array[Int](4)
    val cq = new Array[Int](4)
    val ctd = new Array[Int](4)
    val cta = new Array[Int](4)
    var restartInterval = 0
    var sofSeen = false

    var i = 2
    var scanStart = -1
    while (scanStart < 0) {
      if (i + 1 >= b.length) return null
      if (u8(i) != 0xff) return null
      var j = i
      while (j + 1 < b.length && u8(j + 1) == 0xff) j += 1
      val m = if (j + 1 < b.length) u8(j + 1) else return null
      j += 2 // first byte after the marker
      m match {
        case 0xd9 => return null // EOI before any scan
        case mm if mm >= 0xd0 && mm <= 0xd7 => i = j // stray RSTn
        case 0x01 => i = j // TEM, no payload
        case 0xdb => // DQT
          if (j + 1 >= b.length) return null
          val end = j + u16(j)
          var p = j + 2
          while (p < end) {
            if (p >= b.length) return null
            val pq = u8(p) >> 4
            val tq = u8(p) & 15
            if (tq > 3 || pq > 1) return null
            val step = if (pq == 0) 1 else 2
            if (p + 1 + 64 * step > b.length || p + 1 + 64 * step > end)
              return null
            var z = 0
            while (z < 64) {
              val v = if (pq == 0) u8(p + 1 + z) else u16(p + 1 + 2 * z)
              qt(tq)(ZigZag(z)) = v
              z += 1
            }
            qtSeen(tq) = true
            p += 1 + 64 * step
          }
          i = end
        case 0xc4 => // DHT
          if (j + 1 >= b.length) return null
          val end = j + u16(j)
          var p = j + 2
          while (p < end) {
            if (p + 17 > b.length || p + 17 > end) return null
            val tc = u8(p) >> 4
            val th = u8(p) & 15
            if (tc > 1 || th > 3) return null
            val counts = new Array[Int](16)
            var n = 0
            var l = 0
            while (l < 16) { counts(l) = u8(p + 1 + l); n += counts(l); l += 1 }
            if (n > 256 || p + 17 + n > b.length || p + 17 + n > end)
              return null
            val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
            val t = new Huff(counts, vals)
            if (tc == 0) dcTab(th) = t else acTab(th) = t
            p += 17 + n
          }
          i = end
        case 0xc0 | 0xc1 => // SOF0 / SOF1: sequential Huffman
          if (j + 1 >= b.length) return null
          val end = j + u16(j)
          if (j + 8 > b.length) return null
          if (u8(j + 2) != 8) return null // precision
          h = u16(j + 3)
          w = u16(j + 5)
          ncomp = u8(j + 7)
          if (w <= 0 || h <= 0 || w.toLong * h > Phash.MaxPixels) return null
          if (ncomp < 1 || ncomp > 4) return null
          if (j + 8 + 3 * ncomp > b.length) return null
          var c = 0
          while (c < ncomp) {
            val p = j + 8 + 3 * c
            ch(c) = u8(p + 1) >> 4
            cv(c) = u8(p + 1) & 15
            cq(c) = u8(p + 2)
            if (ch(c) < 1 || ch(c) > 4 || cv(c) < 1 || cv(c) > 4 ||
              cq(c) > 3) return null
            c += 1
          }
          sofSeen = true
          i = end
        case mm if mm >= 0xc2 && mm <= 0xcf && mm != 0xc4 =>
          return null // progressive / arithmetic / hierarchical
        case 0xdd => // DRI
          if (j + 3 >= b.length) return null
          restartInterval = u16(j + 2)
          i = j + u16(j)
        case 0xda => // SOS
          if (!sofSeen || j + 1 >= b.length) return null
          val ns = u8(j + 2)
          if (ns != ncomp) return null // non-interleaved scans: refuse
          if (j + 3 + 2 * ns + 3 > b.length) return null
          var c = 0
          while (c < ns) {
            // scan components are taken BY POSITION (the interleaved
            // baseline convention puts them in frame-header order)
            ctd(c) = u8(j + 4 + 2 * c) >> 4
            cta(c) = u8(j + 4 + 2 * c) & 15
            if (ctd(c) > 3 || cta(c) > 3) return null
            c += 1
          }
          scanStart = j + u16(j)
        case _ => // any other segment: skip by length
          if (j + 1 >= b.length) return null
          i = j + u16(j)
      }
    }

    // resolve tables; luma = component 0
    var c = 0
    while (c < ncomp) {
      if (!qtSeen(cq(c)) || dcTab(ctd(c)) == null || acTab(cta(c)) == null)
        return null
      c += 1
    }
    var hmax = 1
    var vmax = 1
    c = 0
    while (c < ncomp) {
      if (ch(c) > hmax) hmax = ch(c)
      if (cv(c) > vmax) vmax = cv(c)
      c += 1
    }
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // luma plane at component 0's natural resolution
    val lw = mcusX * ch(0) * 8
    val lh = mcusY * cv(0) * 8
    if (lw.toLong * lh > 4L * Phash.MaxPixels) return null
    val plane = new Array[Int](lw * lh)

    val bits = new Bits(b, scanStart)
    val pred = new Array[Int](4)
    val coef = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!bits.restart()) return null
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      c = 0
      while (c < ncomp) {
        var by = 0
        while (by < cv(c)) {
          var bx = 0
          while (bx < ch(c)) {
            // decode one block
            java.util.Arrays.fill(coef, 0)
            val t = bits.decode(dcTab(ctd(c)))
            if (t < 0 || t > 15) return null
            val diffBits = bits.receive(t)
            if (diffBits == Int.MinValue) return null
            pred(c) += extend(diffBits, t)
            coef(0) = pred(c) * qt(cq(c))(0)
            var k = 1
            var eob = false
            while (!eob && k < 64) {
              val rs = bits.decode(acTab(cta(c)))
              if (rs < 0) return null
              val r = rs >> 4
              val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += r
                if (k > 63) return null
                val vb = bits.receive(s)
                if (vb == Int.MinValue) return null
                coef(ZigZag(k)) = extend(vb, s) * qt(cq(c))(ZigZag(k))
                k += 1
              }
            }
            if (c == 0) {
              // IDCT into the luma plane (separable, double precision)
              idctInto(coef, plane, lw, lh,
                (mx * ch(0) + bx) * 8, (my * cv(0) + by) * 8)
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }

    // crop / replicate to w×h
    val g = new Array[Int](w * h)
    val sx = ch(0)
    val sy = cv(0)
    var y = 0
    while (y < h) {
      val py = y * sy / vmax
      var x = 0
      while (x < w) {
        g(y * w + x) = plane(py * lw + x * sx / hmax)
        x += 1
      }
      y += 1
    }
    (g, w, h)
  }
  // scalastyle:on method.length cyclomatic.complexity

  /** 8×8 IDCT of `coef` (natural order, dequantized) written into the
    * plane at (ox, oy) with +128 level shift and clamping. */
  private def idctInto(coef: Array[Int], plane: Array[Int],
      lw: Int, lh: Int, ox: Int, oy: Int): Unit = {
    // rows then columns: tmp = coef · Bᵀ ; out = B · tmp
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += Basis(x * 8 + u) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += Basis(yy * 8 + v) * tmp(v * 8 + x); v += 1 }
        val px = ox + x
        val py = oy + yy
        if (px < lw && py < lh) {
          val r = math.round(s).toInt + 128
          plane(py * lw + px) = if (r < 0) 0 else if (r > 255) 255 else r
        }
        yy += 1
      }
      x += 1
    }
  }
}
