package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Spec-side VP8L (WebP lossless) ENCODER + round-trip pins for the
  * decoder in ops/Multimodal.scala. Same discipline as the JPEG/PNG
  * specs: the encoder writes spec-valid bitstreams (RIFF container,
  * LSB-first bit order, canonical prefix codes via the code-length
  * code, color cache, LZ77 with the 2D distance map, and the four
  * forward transforms), and every variant must decode bit-exact to the
  * source pixels. Within a zero-egress container this proves
  * self-consistency against an independent reading of the public spec;
  * each side was written from the spec text, not from each other's
  * internals.
  */
object WebpTestEncoder {

  final class BitW {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
    }
    def bytes: Array[Byte] = {
      if (nBits > 0) { out.write(cur); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** Complete balanced code lengths over `used` symbols: with n
    * symbols and L = ceil(log2 n), (2^L - n) get length L-1 and the
    * rest L — Kraft-complete, so the decoder's over-subscription check
    * passes. Shorter codes go to lower-numbered symbols. */
  def balancedLengths(alphabetSize: Int, used: Seq[Int]): Array[Int] = {
    val lens = new Array[Int](alphabetSize)
    val n = used.size
    require(n >= 1)
    if (n == 1) { lens(used.head) = 1; return lens } // handled as simple upstream
    var bigL = 1
    while ((1 << bigL) < n) bigL += 1
    val short = (1 << bigL) - n
    used.sorted.zipWithIndex.foreach { case (s, i) =>
      lens(s) = if (i < short && bigL > 1) bigL - 1 else bigL
    }
    lens
  }

  /** Canonical (length, code) per symbol — symbols sorted by (length,
    * symbol), codes assigned sequentially, MSB-first on the wire. */
  def canonicalCodes(lengths: Array[Int]): Map[Int, (Int, Int)] = {
    val syms = lengths.indices.filter(lengths(_) > 0)
      .sortBy(s => (lengths(s), s))
    var code = 0
    var prevLen = 0
    syms.map { s =>
      code = if (prevLen == 0) 0 else (code + 1) << (lengths(s) - prevLen)
      prevLen = lengths(s)
      s -> (code, lengths(s))
    }.toMap
  }

  def writeSym(bw: BitW, codes: Map[Int, (Int, Int)], sym: Int): Unit = {
    val (code, len) = codes(sym)
    var i = len - 1
    while (i >= 0) { bw.writeBits((code >> i) & 1, 1); i -= 1 }
  }

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code onto the wire. Single-symbol and two-small-symbol
    * sets use the simple representation; everything else goes through
    * the code-length code with literal zero runs and a max_symbol cap. */
  def writeCode(bw: BitW, alphabetSize: Int, used: Seq[Int]): Map[Int, (Int, Int)] = {
    require(used.nonEmpty)
    if (used.size == 1) {
      val s = used.head
      bw.writeBits(1, 1) // simple
      bw.writeBits(0, 1) // one symbol
      if (s < 2) { bw.writeBits(0, 1); bw.writeBits(s, 1) }
      else { bw.writeBits(1, 1); bw.writeBits(s, 8) }
      return Map(s -> (0, 0))
    }
    if (used.size == 2 && used.forall(_ < 256)) {
      val Seq(s0, s1) = used.sorted
      bw.writeBits(1, 1) // simple
      bw.writeBits(1, 1) // two symbols
      bw.writeBits(1, 1) // first is 8 bits
      bw.writeBits(s0, 8)
      bw.writeBits(s1, 8)
      return canonicalCodes(balancedLengths(alphabetSize, used))
    }
    bw.writeBits(0, 1) // not simple
    val lengths = balancedLengths(alphabetSize, used)
    val maxUsed = used.max
    // The emitted length records (literal values, no repeats).
    val emitted = (0 to maxUsed).map(lengths(_))
    val clUsed = emitted.distinct.sorted
    val clLens = balancedLengths(19, clUsed)
    val clCodes = canonicalCodes(clLens)
    val numCl = math.max(4,
      (ClOrder.lastIndexWhere(clLens(_) > 0) + 1))
    bw.writeBits(numCl - 4, 4)
    (0 until numCl).foreach(i => bw.writeBits(clLens(ClOrder(i)), 3))
    // max_symbol caps the record count at maxUsed + 1.
    val maxSymbol = maxUsed + 1
    var nbits = 2
    while ((1 << nbits) <= maxSymbol - 2) nbits += 2
    bw.writeBits(1, 1)
    bw.writeBits((nbits - 2) / 2, 3)
    bw.writeBits(maxSymbol - 2, nbits)
    emitted.foreach(l => writeSym(bw, clCodes, l))
    canonicalCodes(lengths)
  }

  /** LZ77 ops the planner hands the emitter. */
  sealed trait Op
  final case class Lit(argb: Int) extends Op
  final case class Copy(len: Int, distCode: Int) extends Op
  final case class CacheRef(idx: Int) extends Op

  /** value -> (prefix symbol, extra-bit count, extra value). */
  def prefixEncode(v: Int): (Int, Int, Int) = {
    require(v >= 1)
    if (v <= 4) return (v - 1, 0, 0)
    var sym = 4
    while (true) {
      val eb = (sym - 2) >> 1
      val off = (2 + (sym & 1)) << eb
      val rem = v - 1 - off
      if (rem >= 0 && rem < (1 << eb)) return (sym, eb, rem)
      sym += 1
    }
    throw new IllegalStateException
  }

  /** One entropy-coded image: cache bit, (level-0 only) no-meta bit,
    * the 5 codes, then the op stream. Mirrors the decoder's
    * vlDecodeImage framing. */
  def writeImageStream(bw: BitW, ops: Seq[Op], level0: Boolean,
      ccBits: Int = 0): Unit = {
    if (ccBits > 0) { bw.writeBits(1, 1); bw.writeBits(ccBits, 4) }
    else bw.writeBits(0, 1)
    if (level0) bw.writeBits(0, 1) // no meta prefix image
    val cacheSize = if (ccBits > 0) 1 << ccBits else 0
    val greens = ops.flatMap {
      case Lit(p) => Seq((p >>> 8) & 0xFF)
      case Copy(len, _) => Seq(256 + prefixEncode(len)._1)
      case CacheRef(i) => Seq(256 + 24 + i)
    }
    def chan(sel: Int => Int) = ops.collect { case Lit(p) => sel(p) }
    val reds = chan(p => (p >>> 16) & 0xFF)
    val blues = chan(p => p & 0xFF)
    val alphas = chan(p => (p >>> 24) & 0xFF)
    val dists = ops.collect { case Copy(_, dc) => prefixEncode(dc)._1 }
    def codeFor(alpha: Int, syms: Seq[Int]) =
      writeCode(bw, alpha, if (syms.isEmpty) Seq(0) else syms.distinct)
    val gc = codeFor(256 + 24 + cacheSize, greens)
    val rc = codeFor(256, reds)
    val bc = codeFor(256, blues)
    val ac = codeFor(256, alphas)
    val dc = codeFor(40, dists)
    ops.foreach {
      case Lit(p) =>
        writeSym(bw, gc, (p >>> 8) & 0xFF)
        writeSym(bw, rc, (p >>> 16) & 0xFF)
        writeSym(bw, bc, p & 0xFF)
        writeSym(bw, ac, (p >>> 24) & 0xFF)
      case Copy(len, distCode) =>
        val (ls, leb, lv) = prefixEncode(len)
        writeSym(bw, gc, 256 + ls)
        bw.writeBits(lv, leb)
        val (ds, deb, dv) = prefixEncode(distCode)
        writeSym(bw, dc, ds)
        bw.writeBits(dv, deb)
      case CacheRef(i) => writeSym(bw, gc, 256 + 24 + i)
    }
  }

  /** Wrap a VP8L payload in the RIFF container. */
  def riff(payload: Array[Byte]): Array[Byte] = {
    val chunkLen = payload.length
    val padded = chunkLen + (chunkLen & 1)
    val total = 4 + 8 + padded // "WEBP" + VP8L header + payload
    val out = java.nio.ByteBuffer.allocate(8 + total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(total)
    out.put("WEBP".getBytes("US-ASCII"))
    out.put("VP8L".getBytes("US-ASCII")).putInt(chunkLen)
    out.put(payload)
    if ((chunkLen & 1) == 1) out.put(0.toByte)
    out.array()
  }

  /** Header + transform announcements + the level-0 image stream. */
  def encode(w: Int, h: Int, ops: Seq[Op], ccBits: Int = 0,
      transforms: BitW => Unit = _ => ()): Array[Byte] = {
    val bw = new BitW
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(0, 1) // alpha hint
    bw.writeBits(0, 3) // version
    transforms(bw)
    bw.writeBits(0, 1) // end of transforms
    writeImageStream(bw, ops, level0 = true, ccBits = ccBits)
    riff(0x2F.toByte +: bw.bytes)
  }

  def litsOf(px: Seq[Int]): Seq[Op] = px.map(Lit(_))
}

class WebpSpec extends AnyFunSuite {
  import WebpTestEncoder._
  import TestSpark._

  /** Deterministic RGBA test image (every channel exercised, alpha
    * non-opaque in places). */
  private def testImage(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w
      val y = i / w
      val r = (x * 37 + seed) & 0xFF
      val g = (y * 53 + seed * 7) & 0xFF
      val b = (x * 11 + y * 29) & 0xFF
      val a = if ((x + y) % 5 == 0) 0x80 else 0xFF
      (a << 24) | (r << 16) | (g << 8) | b
    }

  private def rgbaOf(px: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](px.length * 4)
    px.indices.foreach { i =>
      out(i * 4) = ((px(i) >>> 16) & 0xFF).toByte
      out(i * 4 + 1) = ((px(i) >>> 8) & 0xFF).toByte
      out(i * 4 + 2) = (px(i) & 0xFF).toByte
      out(i * 4 + 3) = ((px(i) >>> 24) & 0xFF).toByte
    }
    out
  }

  private def decodePixels(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = Multimodal.decodeWebpLossless(bytes)
    assert(img.isDefined, "decode returned None")
    (img.get.width, img.get.height, img.get.pixels)
  }

  test("literal-only VP8L round-trips bit-exact") {
    val (w, h) = (7, 5)
    val px = testImage(w, h, 3)
    val (gw, gh, got) = decodePixels(encode(w, h, litsOf(px.toSeq)))
    assert((gw, gh) === (w, h))
    assert(got === rgbaOf(px))
  }

  test("1x1 and single-color images (trivial 0-bit codes) decode") {
    val one = encode(1, 1, Seq(Lit(0xFF102030)))
    assert(decodePixels(one)._3 === rgbaOf(Array(0xFF102030)))
    val flat = Array.fill(6 * 4)(0xFFABCDEF)
    val (_, _, got) = decodePixels(encode(6, 4, litsOf(flat.toSeq)))
    assert(got === rgbaOf(flat))
  }

  test("color cache hits round-trip") {
    val ccBits = 4
    val palette = Array(0xFF112233, 0xFF445566, 0x80778899)
    val px = Array.tabulate(8 * 3)(i => palette(i % palette.length))
    // Re-run the decoder's cache protocol to plan hits.
    val cache = new Array[Int](1 << ccBits)
    val seen = new Array[Boolean](1 << ccBits)
    def slot(p: Int) = (0x1e35a7bd * p) >>> (32 - ccBits)
    val ops = px.map { p =>
      val s = slot(p)
      val op = if (seen(s) && cache(s) == p) CacheRef(s) else Lit(p)
      cache(s) = p
      seen(s) = true
      op
    }.toSeq
    assert(ops.count(_.isInstanceOf[CacheRef]) > px.length / 2,
      "fixture must actually exercise the cache")
    val (_, _, got) = decodePixels(encode(8, 3, ops, ccBits = ccBits))
    assert(got === rgbaOf(px))
  }

  test("LZ77 backward references through the 2D distance map round-trip") {
    val (w, h) = (9, 6)
    val row = testImage(w, 1, 11)
    val px = Array.tabulate(w * h)(i => row(i % w))
    // First row literal, the rest ONE overlapping copy at distance w
    // spelled via distance code 1 = (dx 0, dy 1) in the neighborhood
    // map — exercising both the map and overlapping-copy semantics.
    val ops = litsOf(row.toSeq) :+ Copy(w * (h - 1), 1)
    val (_, _, got) = decodePixels(encode(w, h, ops))
    assert(got === rgbaOf(px))
    // The same stream with the literal spelling (code = dist + 120)
    // must decode identically.
    val ops2 = litsOf(row.toSeq) :+ Copy(w * (h - 1), w + 120)
    assert(decodePixels(encode(w, h, ops2))._3 === rgbaOf(px))
  }

  test("subtract-green transform inverts") {
    val (w, h) = (6, 4)
    val px = testImage(w, h, 17)
    val fwd = px.map { p =>
      val g = (p >>> 8) & 0xFF
      val r = (((p >>> 16) & 0xFF) - g) & 0xFF
      val b = ((p & 0xFF) - g) & 0xFF
      (p & 0xFF00FF00) | (r << 16) | b
    }
    val bytes = encode(w, h, litsOf(fwd.toSeq), transforms = { bw =>
      bw.writeBits(1, 1)
      bw.writeBits(2, 2) // subtract green
    })
    assert(decodePixels(bytes)._3 === rgbaOf(px))
  }

  test("predictor transform (uniform left mode) inverts, edges included") {
    val (w, h) = (10, 5)
    val px = testImage(w, h, 23)
    def sub(a: Int, b: Int): Int = { // per-channel a - b mod 256
      var out = 0
      var sh = 0
      while (sh < 32) {
        out |= ((((a >>> sh) & 0xFF) - ((b >>> sh) & 0xFF)) & 0xFF) << sh
        sh += 8
      }
      out
    }
    val bits = 4 // one 16-px tile covers the whole image
    val res = Array.tabulate(w * h) { pos =>
      val x = pos % w
      val y = pos / w
      val pred =
        if (x == 0 && y == 0) 0xFF000000
        else if (y == 0) px(pos - 1)
        else if (x == 0) px(pos - w)
        else px(pos - 1) // mode 1 = left
      sub(px(pos), pred)
    }
    val bytes = encode(w, h, litsOf(res.toSeq), transforms = { bw =>
      bw.writeBits(1, 1)
      bw.writeBits(0, 2) // predictor
      bw.writeBits(bits - 2, 3)
      // 1x1 subimage holding mode 1 in the green byte.
      writeImageStream(bw, Seq(Lit(0xFF000100)), level0 = false)
    })
    assert(decodePixels(bytes)._3 === rgbaOf(px))
  }

  test("color transform (fixed multipliers) inverts") {
    val (w, h) = (8, 4)
    val px = testImage(w, h, 29)
    val (g2r, g2b, r2b) = (16, 8, 4)
    def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
    val fwd = px.map { p =>
      val g = (p >>> 8) & 0xFF
      val r = (p >>> 16) & 0xFF
      val b = p & 0xFF
      val nr = (r - delta(g2r, g)) & 0xFF
      val nb = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
      (p & 0xFF00FF00) | (nr << 16) | nb
    }
    val bits = 4
    val cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    val bytes = encode(w, h, litsOf(fwd.toSeq), transforms = { bw =>
      bw.writeBits(1, 1)
      bw.writeBits(1, 2) // color transform
      bw.writeBits(bits - 2, 3)
      writeImageStream(bw, Seq(Lit(cte)), level0 = false)
    })
    assert(decodePixels(bytes)._3 === rgbaOf(px))
  }

  test("color-indexing transform with pixel packing inverts") {
    val (w, h) = (11, 3) // 4 colors -> 2-bit indices, 4 per byte
    val palette = Array(0xFF000000, 0xFF00FF00, 0x80FF0000, 0xFF0000FF)
    val idx = Array.tabulate(w * h)(i => (i * 7 + i / w) % palette.length)
    val px = idx.map(palette(_))
    val widthBits = 2
    val perByte = 1 << widthBits
    val packedW = (w + perByte - 1) / perByte
    val packed = Array.tabulate(packedW * h) { pp =>
      val y = pp / packedW
      val xb = pp % packedW
      var green = 0
      (0 until perByte).foreach { k =>
        val x = xb * perByte + k
        if (x < w) green |= idx(y * w + x) << (k * 2)
      }
      0xFF000000 | (green << 8)
    }
    // Palette rides the stream as component deltas (per-channel mod
    // 256 — a packed subtract would let borrows cross lanes).
    def subPx(a: Int, b: Int): Int = {
      var out = 0
      var sh = 0
      while (sh < 32) {
        out |= ((((a >>> sh) & 0xFF) - ((b >>> sh) & 0xFF)) & 0xFF) << sh
        sh += 8
      }
      out
    }
    val deltas = palette.zipWithIndex.map { case (p, i) =>
      if (i == 0) p else subPx(p, palette(i - 1))
    }
    // Header carries the ORIGINAL width; the decoder derives the packed
    // width from the transform, so the main stream holds packedW*h ops.
    val bytes = encode(w, h, litsOf(packed.toSeq), transforms = { bw =>
      bw.writeBits(1, 1)
      bw.writeBits(3, 2) // color indexing
      bw.writeBits(palette.length - 1, 8)
      writeImageStream(bw, litsOf(deltas.toSeq), level0 = false)
    })
    val (gw, gh, got) = decodePixels(bytes)
    assert((gw, gh) === (w, h))
    assert(got === rgbaOf(px))
  }

  test("truncated and oversized streams are dropped, not crashed on") {
    val good = encode(7, 5, litsOf(testImage(7, 5, 3).toSeq))
    (1 until good.length by 7).foreach { cut =>
      Multimodal.decodeWebpLossless(good.take(cut)) // must not throw
    }
    // A header declaring 16384x16384 must be refused BEFORE allocation.
    val bomb = {
      val bw = new BitW
      bw.writeBits(16383, 14)
      bw.writeBits(16383, 14)
      bw.writeBits(0, 1)
      bw.writeBits(0, 3)
      riff(0x2F.toByte +: bw.bytes)
    }
    assert(Multimodal.decodeWebpLossless(bomb).isEmpty)
  }

  // ---- animated WebP (VP8X + ANIM/ANMF) -------------------------------
  // Fixture provenance: frame payloads encoded by the system libwebp,
  // container assembled per the public spec, goldens composited in
  // python from libwebp's own frame decode (tools/gen_webpanim.py).
  // Frame alphas are {0,255} so blend semantics are exact.

  private def refBytes2(p: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(p)
    try in.readAllBytes() finally in.close()
  }

  private def checkAnim(name: String, tol: Int): Unit = {
    val webp = refBytes2(s"/webp_ref/$name.webp")
    val px = refBytes2(s"/webp_ref/$name.px")
    def le16(o: Int) = (px(o) & 0xFF) | ((px(o + 1) & 0xFF) << 8)
    val (w, h, nf) = (le16(0), le16(2), le16(4))
    val anim = Multimodal.decodeWebpAnim(webp)
      .getOrElse(fail(s"$name refused"))
    assert((anim.width, anim.height, anim.frames.length) === ((w, h, nf)))
    assert(anim.loops === 2)
    var off = 6
    anim.frames.zipWithIndex.foreach { case (fr, i) =>
      val delay = (px(off) & 0xFF) | ((px(off + 1) & 0xFF) << 8) |
        ((px(off + 2) & 0xFF) << 16)
      off += 4
      assert(fr.delayMs === delay, s"$name frame $i delay")
      var maxd = 0
      var k = 0
      while (k < w * h * 4) {
        val d = math.abs((fr.pixels(k) & 0xFF) - (px(off + k) & 0xFF))
        if (d > maxd) maxd = d
        k += 1
      }
      assert(maxd <= tol, s"$name frame $i max diff $maxd")
      off += w * h * 4
    }
  }

  test("animated WebP: all-lossless fixture composites BIT-EXACT") {
    checkAnim("anim_lossless", tol = 0)
  }

  test("animated WebP: mixed lossy/lossless within conversion tolerance") {
    // lossy frames share libwebp's triangular chroma upsample since
    // r11, but the YUV->RGB coefficient rounding still differs (our
    // float BT.601 + rint vs libwebp's fixed-point kernel) — the
    // still-image pins isolate this by comparing YUV planes; here the
    // CONTAINER semantics are under test, so pixels carry a small
    // rounding tolerance.
    checkAnim("anim_mixed", tol = 8)
  }

  test("animated WebP: meta reports canvas + total duration; frame fan-out") {
    import spark.implicits._
    val webp = refBytes2("/webp_ref/anim_lossless.webp")
    val meta = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("a.webp", webp.length, webp)).toDS())
      .collect().head
    assert(meta.width === 48 && meta.height === 32)
    assert(meta.duration_ms === 280L) // 40+60+80+100
    val frames = Multimodal.webpFramesAsBmp(Seq(
      Multimodal.MediaFile("a.webp", webp.length, webp)).toDS()).collect()
    assert(frames.length === 4)
    assert(frames.forall(f => Multimodal.decodeMeta(Seq(f).toDS())
      .head().format == "bmp"))
    // timeline sampling thins the frames
    val sampled = Multimodal.webpFramesAsBmp(Seq(
      Multimodal.MediaFile("a.webp", webp.length, webp)).toDS(),
      everyMs = 90L).collect()
    assert(sampled.length < 4 && sampled.nonEmpty)
  }

  test("animated WebP: mutated/truncated containers drop, never throw") {
    val rnd = new scala.util.Random(31)
    val base = refBytes2("/webp_ref/anim_lossless.webp")
    for (i <- 0 until 60) {
      val b = base.clone()
      if (i % 2 == 0) {
        (0 until 1 + rnd.nextInt(6)).foreach { _ =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        }
        Multimodal.decodeWebpAnim(b) // Some or None, never throw
      } else {
        Multimodal.decodeWebpAnim(b.take(12 + rnd.nextInt(b.length - 12)))
      }
    }
  }

  test("RIFF chunk sizes near Int.MaxValue are refused, not Int-wrapped") {
    // A ~24-byte container whose first chunk declares a size that
    // overflows `p + 8 + sz` in Int arithmetic: the walk must refuse
    // (Long bounds check), not wrap p negative and throw.
    def crafted(tag4: String, sz: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(16)
      b.put("WEBP".getBytes("US-ASCII"))
      b.put(tag4.getBytes("US-ASCII")).putInt(sz)
      b.putInt(0)
      b.array()
    }
    import spark.implicits._
    for {
      t <- Seq("VP8 ", "VP8L", "VP8X", "ALPH")
      sz <- Seq(0x7FFFFFEC, 0x7FFFFFF4, Int.MaxValue)
    } {
      val c = crafted(t, sz)
      assert(Multimodal.decodeWebpLossless(c).isEmpty, s"$t/$sz lossless")
      assert(Multimodal.decodeWebpLossy(c).isEmpty, s"$t/$sz lossy")
      // The meta and BMP-bridge paths walk the same chunks.
      Multimodal.decodeMeta(Seq(
        Multimodal.MediaFile("x.webp", c.length, c)).toDS()).collect()
      assert(Multimodal.webpAsBmp(Seq(
        Multimodal.MediaFile("x.webp", c.length, c)).toDS())
        .collect().isEmpty, s"$t/$sz bridge")
    }
  }

  // ---- lossy VP8 (ops/Vp8.scala) ---------------------------------------
  // Fixture provenance (src/test/resources/vp8/): each <name>.webp is a
  // REAL lossy WebP stream and <name>.yuv is the REFERENCE DECODER's
  // (libwebp 1.x, the format's normative implementation) 4:2:0 output
  // for it — 9 images encoded by libwebp itself (odd dims, q20..q99,
  // segmentation + loop filter active) and 42 purpose-built streams
  // from an independent minimal encoder (tools/vp8enc.py): every 4x4
  // submode in isolation, every token category including int16-wrap
  // magnitudes, skip-flag mixes, 2/4/8 token partitions, loop-filter
  // deltas and sharpness sweeps. The decoder must reproduce the
  // reference output BIT-EXACTLY on all of them — prediction,
  // dequant, IDCT and both loop filters have no tolerance.

  private def vp8Fixtures: Seq[String] = {
    val url = getClass.getResource("/vp8")
    val dir = new java.io.File(url.toURI)
    dir.listFiles().filter(_.getName.endsWith(".webp"))
      .map(_.getName.stripSuffix(".webp")).sorted.toSeq
  }

  private def resBytes(p: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(p)
    try in.readAllBytes() finally in.close()
  }

  test("VP8X extended container: VP8L payload decodes; canvas meta") {
    // Rewrap a simple lossless file's VP8L chunk inside a VP8X
    // container (the layout every transparent/EXIF-carrying WebP
    // uses): the RIFF walk must find and decode it identically.
    val simple = encode(9, 7, litsOf(testImage(9, 7, 11).toSeq))
    val want = Multimodal.decodeWebpLossless(simple).get
    val chunkLen = (simple(16) & 0xFF) | ((simple(17) & 0xFF) << 8) |
      ((simple(18) & 0xFF) << 16) | ((simple(19) & 0xFF) << 24)
    val vp8l = java.util.Arrays.copyOfRange(simple, 12,
      12 + 8 + chunkLen + (chunkLen & 1))
    val b = java.nio.ByteBuffer
      .allocate(12 + 18 + vp8l.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(4 + 18 + vp8l.length).put("WEBP".getBytes)
    b.put("VP8X".getBytes).putInt(10)
    b.put(0x10.toByte) // alpha-hint flag bits
    b.put(0.toByte).put(0.toByte).put(0.toByte)
    def le24(v: Int): Unit = { b.put((v & 0xFF).toByte)
      .put(((v >> 8) & 0xFF).toByte).put(((v >> 16) & 0xFF).toByte) }
    le24(9 - 1); le24(7 - 1)
    b.put(vp8l)
    val ext = b.array()
    val got = Multimodal.decodeWebpLossless(ext).get
    assert((got.width, got.height) === ((want.width, want.height)))
    assert(got.pixels.toSeq === want.pixels.toSeq)
    // meta reads the VP8L header through the walk, and the BMP bridge
    // accepts the extended file.
    import spark.implicits._
    val meta = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("x.webp", ext.length, ext)).toDS()).collect().head
    assert(meta.width === 9 && meta.height === 7)
    assert(Multimodal.webpAsBmp(Seq(
      Multimodal.MediaFile("x.webp", ext.length, ext)).toDS())
      .collect().length === 1)
  }

  // Fixture provenance (src/test/resources/webp_ref/): files encoded
  // by the system libwebp (the format's reference implementation);
  // .rgba goldens are libwebp's own decode. These exist because the
  // spec-side encoder can only prove SELF-consistency: a shared
  // transcription error on both sides round-trips green while every
  // real-world file fails. Exactly that happened — the code-length
  // symbol order (17,18,0..5,16,6..15; 16 interposed after 5) was
  // transcribed as trailing-16 in BOTH the decoder and the test
  // encoder, so all r9 round-trips passed while every libwebp-encoded
  // lossless file refused. These pins make that class of bug
  // impossible to reintroduce.

  private def refBytes(p: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(p)
    try in.readAllBytes() finally in.close()
  }

  test("VP8L: libwebp-encoded lossless files decode bit-exact") {
    for (n <- Seq("ll_grad_48x32", "ll_noise_33x17", "ll_blocks_64x48")) {
      val webp = refBytes(s"/webp_ref/$n.webp")
      val gold = refBytes(s"/webp_ref/$n.rgba")
      val w = (gold(0) & 0xFF) | ((gold(1) & 0xFF) << 8)
      val h = (gold(2) & 0xFF) | ((gold(3) & 0xFF) << 8)
      val img = Multimodal.decodeWebpLossless(webp)
        .getOrElse(fail(s"$n refused"))
      assert((img.width, img.height, img.channels) === ((w, h, 4)), n)
      var i = 0
      while (i < w * h * 4) {
        assert(img.pixels(i) === gold(4 + i), s"$n byte $i")
        i += 1
      }
    }
  }

  test("ALPH: transparent lossy WebP carries the exact alpha plane") {
    // Alpha fixtures cover the raw method, the lossless method (with
    // transforms), and block/gradient/noise planes that exercise the
    // prediction filters libwebp selects.
    for (n <- Seq("a_grad_48x32_q75", "a_noise_33x17_q90",
        "a_blocks_64x48_q50")) {
      val webp = refBytes(s"/webp_ref/$n.webp")
      val gold = refBytes(s"/webp_ref/$n.alpha")
      val w = (gold(0) & 0xFF) | ((gold(1) & 0xFF) << 8)
      val h = (gold(2) & 0xFF) | ((gold(3) & 0xFF) << 8)
      val img = Multimodal.decodeWebpLossy(webp).getOrElse(fail(s"$n refused"))
      assert((img.width, img.height, img.channels) === ((w, h, 4)), n)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.pixels((y * w + x) * 4 + 3) & 0xFF) ===
          (gold(4 + y * w + x) & 0xFF), s"$n alpha($x,$y)")
    }
    // No ALPH chunk: plain RGB output.
    val opaque = refBytes("/webp_ref/a_opaque_32x32_q75.webp")
    assert(Multimodal.decodeWebpLossy(opaque).get.channels === 3)
  }

  test("VP8: bit-exact vs reference-decoder YUV goldens (51 streams)") {
    val names = vp8Fixtures
    assert(names.size >= 51)
    names.foreach { n =>
      val webp = resBytes(s"/vp8/$n.webp")
      val gold = resBytes(s"/vp8/$n.yuv")
      val gw = (gold(4) & 0xFF) | ((gold(5) & 0xFF) << 8)
      val gh = (gold(6) & 0xFF) | ((gold(7) & 0xFF) << 8)
      // locate the VP8 chunk through the RIFF walk
      var off = -1; var len = 0
      var p = 12
      while (off < 0 && p + 8 <= webp.length) {
        val sz = (webp(p + 4) & 0xFF) | ((webp(p + 5) & 0xFF) << 8) |
          ((webp(p + 6) & 0xFF) << 16) | ((webp(p + 7) & 0xFF) << 24)
        if (new String(webp, p, 4, "US-ASCII") == "VP8 ") { off = p + 8; len = sz }
        p += 8 + sz + (sz & 1)
      }
      assert(off > 0, s"$n: no VP8 chunk")
      val yuv = graft.ops.Vp8.decodeFrame(webp, off, len)
        .getOrElse(fail(s"$n: decode refused"))
      assert((yuv.w, yuv.h) === ((gw, gh)), n)
      val cw = (gw + 1) / 2; val ch = (gh + 1) / 2
      var i = 8
      var y = 0
      while (y < gh) {
        var x = 0
        while (x < gw) {
          assert(gold(i) == yuv.y(y * yuv.yStride + x), s"$n Y($x,$y)")
          i += 1; x += 1
        }
        y += 1
      }
      y = 0
      while (y < ch) {
        var x = 0
        while (x < cw) {
          assert(gold(i) == yuv.u(y * yuv.uvStride + x), s"$n U($x,$y)")
          i += 1; x += 1
        }
        y += 1
      }
      y = 0
      while (y < ch) {
        var x = 0
        while (x < cw) {
          assert(gold(i) == yuv.v(y * yuv.uvStride + x), s"$n V($x,$y)")
          i += 1; x += 1
        }
        y += 1
      }
    }
  }

  test("VP8: pipeline flow — meta dims, RGB bridge, embed, hostile input") {
    import spark.implicits._
    val webp = resBytes("/vp8/photo_80x56_q20.webp")
    val files = Seq(Multimodal.MediaFile("a.webp", webp.length, webp)).toDS()
    val meta = Multimodal.decodeMeta(files).collect().head
    assert((meta.width, meta.height, meta.channels) === ((80, 56, 3)))
    assert(meta.format === "webp")
    // RGB bridge: decoded pixels flow into the BMP pipeline.
    val bmp = Multimodal.webpAsBmp(files).collect()
    assert(bmp.length === 1)
    val bMeta = Multimodal.decodeMeta(
      Seq(Multimodal.MediaFile("b.bmp", bmp.head.content.length,
        bmp.head.content)).toDS()).collect().head
    assert(bMeta.format === "bmp" && bMeta.width === 80 && bMeta.height === 56)
    // Embed comes from DECODED pixels (a real histogram, normalized).
    val emb = Multimodal.embed(files).collect().head
    assert(math.abs(emb.embedding.sum - 1.0) < 1e-9)
    // Truncations must drop, never throw.
    (1 until webp.length by 97).foreach { cut =>
      Multimodal.decodeWebpLossy(webp.take(cut))
    }
    // Dimension bomb: a VP8 header declaring a huge frame refuses
    // BEFORE allocating planes (14-bit dims cap at 16383x16383 —
    // above the 16M-pixel guard when square).
    val bomb = webp.clone()
    // patch the dims in the VP8 frame header (offset: chunk data + 6)
    var p = 12; var off = -1
    while (off < 0 && p + 8 <= bomb.length) {
      val sz = (bomb(p+4)&0xFF) | ((bomb(p+5)&0xFF)<<8) | ((bomb(p+6)&0xFF)<<16) | ((bomb(p+7)&0xFF)<<24)
      if (new String(bomb, p, 4, "US-ASCII") == "VP8 ") off = p + 8
      else p += 8 + sz + (sz & 1)
    }
    bomb(off + 6) = 0xFF.toByte; bomb(off + 7) = 0x3F.toByte
    bomb(off + 8) = 0xFF.toByte; bomb(off + 9) = 0x3F.toByte
    assert(Multimodal.decodeWebpLossy(bomb).isEmpty)
  }
}
