package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `graft_dhash(payload: binary)` → the 64-bit difference hash
  * (dHash, Krawetz 2013) of a PNG payload, or NULL when the payload is
  * not a decodable baseline PNG.
  *
  * The whole decode runs on the JVM with zero codec libraries — PNG's
  * pixel path is just zlib + per-scanline filters, both published in
  * RFC 2083 and implementable in plain Java: signature check, IHDR
  * parse, IDAT concatenation, java.util.zip.Inflater, the five
  * standard defilters (None/Sub/Up/Average/Paeth), integer luma.
  * Pixels then reduce to a 9×8 grid of block means and each of the 64
  * bits records whether a cell is brighter than its left neighbor —
  * the gradient-direction signature that survives re-encode, resize
  * and small edits, which is exactly what byte-level hashing (mm_meta
  * digests, dedup_exact) cannot give a multimodal column.
  *
  * Scale guards: dimension product is capped (adversarial headers
  * cannot allocate unbounded buffers — the inflate output is bounded
  * by the header-derived raw size, so a zip-bomb IDAT hits the cap,
  * not memory); unsupported shapes (interlace, 16-bit, palette) return
  * NULL rather than guessing. One straight-line kernel per row inside
  * whole-stage codegen, the SignatureKernels pattern.
  */
case class DHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dhash"

  override def nullSafeEval(a: Any): Any =
    Phash.dhash(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("dh")
      s"""
      java.lang.Long $r = graft.plans.Phash.dhash($a);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): DHashExpr =
    copy(child = newChild)
}

object Phash {

  /** Refuse to decode images beyond this pixel count: the raw buffer
    * is (1 + w·bpp)·h bytes, so 2²² px caps it at ~17 MB for RGBA. */
  val MaxPixels: Long = 1L << 22

  private val Sig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Boxed so codegen can branch on decode failure. */
  def dhash(b: Array[Byte]): java.lang.Long = {
    val gray = decodeGray(b)
    if (gray == null) return null
    val (g, w, h) = gray
    // 9×8 block means: cell (cx, cy) averages its pixel block; blocks
    // are never empty (x1 > x0 by construction) so tiny images sample
    // nearest pixels instead of failing
    val cells = new Array[Int](9 * 8)
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8
      val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
      var cx = 0
      while (cx < 9) {
        val x0 = cx * w / 9
        val x1 = math.max(x0 + 1, (cx + 1) * w / 9)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += g(y * w + x); x += 1 }
          y += 1
        }
        cells(cy * 9 + cx) = (sum / ((x1 - x0).toLong * (y1 - y0))).toInt
        cx += 1
      }
      cy += 1
    }
    var hash = 0L
    var bit = 0
    while (bit < 64) {
      val row = bit / 8
      val colIdx = bit % 8
      if (cells(row * 9 + colIdx + 1) > cells(row * 9 + colIdx))
        hash |= 1L << bit
      bit += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** Pixel decode to integer luma: full PNG decode for baseline 8-bit
    * gray/RGB/RGBA non-interlaced PNGs, baseline-JPEG Huffman+IDCT
    * decode (plans.Jpeg) for FFD8 payloads — one dispatch point, so
    * every luma consumer (dHash, resize, the ingest firewall) covers
    * both image formats. Null for anything else.
    */
  private[plans] def decodeGray(b: Array[Byte]): (Array[Int], Int, Int) = {
    if (b == null || b.length < 45) return null
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      return Jpeg.decodeLuma(b)
    var i = 0
    while (i < 8) { if (b(i) != Sig(i)) return null; i += 1 }
    def u32(p: Int): Long =
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    // IHDR must be first (RFC 2083 §3.2)
    if (u32(8) != 13L || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' ||
      b(15) != 'R') return null
    val w = u32(16).toInt
    val h = u32(20).toInt
    val depth = b(24) & 0xff
    val color = b(25) & 0xff
    val compression = b(26) & 0xff
    val filterMethod = b(27) & 0xff
    val interlace = b(28) & 0xff
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
    if (depth != 8 || interlace != 0) return null
    // only compression 0 (deflate) and filter method 0 are defined
    // (RFC 2083 §4.1.1) — anything else would decode to garbage
    if (compression != 0 || filterMethod != 0) return null
    val bpp = color match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 6 => 4 // truecolor + alpha
      case _ => return null // palette / gray+alpha: not planted, skip
    }
    // concatenate IDAT bodies
    val zs = new java.io.ByteArrayOutputStream()
    var p = 33
    var ok = true
    while (ok && p + 8 <= b.length) {
      val len = u32(p).toInt
      // long arithmetic: a crafted len near 2^31 must not wrap the sum
      // negative and slip past the bound (nor wrap the p advance below)
      if (len < 0 || p.toLong + 12L + len > b.length) ok = false
      else {
        val tag = new String(b, p + 4, 4, "US-ASCII")
        if (tag == "IDAT") zs.write(b, p + 8, len)
        if (tag == "IEND") ok = false
        p += 12 + len
      }
    }
    val stride = w * bpp
    val rawLen = (1 + stride) * h
    val raw = new Array[Byte](rawLen)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(zs.toByteArray)
      var off = 0
      while (off < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, off, rawLen - off)
        // zero progress for ANY reason (truncated input, FDICT preset
        // dictionary, …) means the stream cannot complete — bail rather
        // than spin on a crafted payload
        if (n == 0) return null
        off += n
      }
      if (off < rawLen) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    // defilter scanlines in place (RFC 2083 §6): prior = decoded row above
    val px = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      if (ft > 4) return null
      val src = y * (1 + stride) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(src + x) & 0xff
        val left = if (x >= bpp) px(dst + x - bpp) & 0xff else 0
        val up = if (y > 0) px(dst - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) px(dst - stride + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case _ => // Paeth predictor
            val pp = left + up - ul
            val pa = math.abs(pp - left)
            val pb = math.abs(pp - up)
            val pc = math.abs(pp - ul)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        px(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // integer luma
    val g = new Array[Int](w * h)
    var pi = 0
    while (pi < w * h) {
      val base = pi * bpp
      g(pi) =
        if (bpp == 1) px(base) & 0xff
        else ((px(base) & 0xff) + (px(base + 1) & 0xff) +
          (px(base + 2) & 0xff)) / 3
      pi += 1
    }
    (g, w, h)
  }
}
