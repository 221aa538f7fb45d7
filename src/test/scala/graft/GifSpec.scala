package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Spec-side GIF ENCODER + round-trip pins for the decoder in
  * ops/Multimodal.scala — same discipline as the JPEG/PNG/WebP specs:
  * the encoder (real LZW with dictionary growth and a simulated-decoder
  * code-width clock, sub-block chunking, global color table, GCE
  * delays/transparency/disposal, interlacing) is written independently
  * from the public GIF89a spec, and every fixture must decode bit-exact
  * against a reference compositor spelled directly in the tests.
  */
object GifTestEncoder {

  final class BitW {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def write(v: Int, bits: Int): Unit = {
      var i = 0
      while (i < bits) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i += 1
      }
    }
    def bytes: Array[Byte] = {
      if (n > 0) { out.write(cur); cur = 0; n = 0 }
      out.toByteArray
    }
  }

  /** GIF LZW compress: emits CLEAR, the code stream, EOI. Code widths
    * follow a SIMULATED DECODER's dictionary clock (the decoder adds
    * one entry per code after the first and widens when its next-free
    * hits the width boundary), so encoder and decoder stay bit-aligned
    * without the early-change pitfall. */
  def lzw(indices: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val bw = new BitW
    var dcs = minCode + 1 // simulated decoder code size
    var dnext = eoi + 1   // simulated decoder next-free
    val dict = new java.util.HashMap[Long, Integer]()
    var next = eoi + 1
    bw.write(clear, dcs)
    var cur = indices(0)
    var first = true
    def emit(code: Int): Unit = {
      bw.write(code, dcs)
      if (!first) {
        if (dnext < 4096) {
          dnext += 1
          if (dnext == (1 << dcs) && dcs < 12) dcs += 1
        }
      }
      first = false
    }
    var i = 1
    while (i < indices.length) {
      val b = indices(i)
      val key = (cur.toLong << 12) | b
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        if (next < 4096) { dict.put(key, next); next += 1 }
        cur = b
      }
      i += 1
    }
    emit(cur)
    emit(eoi)
    bw.bytes
  }

  /** Interlace a sequential index image into GIF's four-pass order. */
  def interlace(idx: Array[Int], w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](idx.length)
    var dst = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) {
        System.arraycopy(idx, y * w, out, dst * w, w)
        dst += 1
        y += step
      }
    }
    out
  }

  final case class Frame(left: Int, top: Int, w: Int, h: Int,
      indices: Array[Int], delayCs: Int = 0, transparent: Int = -1,
      disposal: Int = 0, interlaced: Boolean = false)

  /** Assemble a GIF89a file: logical screen + GCT + per-frame GCE +
    * image descriptors with LZW payloads in <=255-byte sub-blocks. */
  def gif(w: Int, h: Int, palette: Array[Int], bgIndex: Int,
      frames: Seq[Frame]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(w); w16(h)
    var gctBits = 0
    while ((2 << gctBits) < palette.length) gctBits += 1
    w8(0x80 | gctBits) // GCT present, size 2^(bits+1)
    w8(bgIndex)
    w8(0) // aspect
    (0 until (2 << gctBits)).foreach { i =>
      val c = if (i < palette.length) palette(i) else 0
      w8(c >> 16); w8(c >> 8); w8(c)
    }
    frames.foreach { f =>
      // Graphic Control Extension (always emitted; delay 0 is valid).
      w8(0x21); w8(0xF9); w8(4)
      w8((f.disposal << 2) | (if (f.transparent >= 0) 1 else 0))
      w16(f.delayCs)
      w8(math.max(f.transparent, 0))
      w8(0)
      // Image descriptor.
      w8(0x2C)
      w16(f.left); w16(f.top); w16(f.w); w16(f.h)
      w8(if (f.interlaced) 0x40 else 0)
      val minCode = math.max(2, gctBits + 1)
      w8(minCode)
      val data = lzw(
        if (f.interlaced) interlace(f.indices, f.w, f.h) else f.indices,
        minCode)
      data.grouped(255).foreach { blk => w8(blk.length); out.write(blk) }
      w8(0) // block terminator
    }
    w8(0x3B)
    out.toByteArray
  }
}

class GifSpec extends AnyFunSuite {
  import GifTestEncoder._

  private def rgb(palette: Array[Int], indices: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](indices.length * 3)
    indices.indices.foreach { i =>
      val c = palette(indices(i))
      out(i * 3) = ((c >> 16) & 0xFF).toByte
      out(i * 3 + 1) = ((c >> 8) & 0xFF).toByte
      out(i * 3 + 2) = (c & 0xFF).toByte
    }
    out
  }

  private val pal8 = Array(0x000000, 0xFF0000, 0x00FF00, 0x0000FF,
    0xFFFF00, 0xFF00FF, 0x00FFFF, 0xFFFFFF)

  test("still GIF round-trips exact RGB (LZW dictionary growth included)") {
    val (w, h) = (23, 17) // enough distinct runs to grow code width
    val idx = Array.tabulate(w * h)(i => (i * 5 + i / w) % pal8.length)
    val bytes = gif(w, h, pal8, bgIndex = 0,
      Seq(Frame(0, 0, w, h, idx)))
    val anim = Multimodal.decodeGif(bytes).get
    assert(anim.width === w && anim.height === h && anim.frames.size === 1)
    assert(anim.frames.head.pixels === rgb(pal8, idx))
  }

  test("interlaced GIF de-interlaces to the sequential image") {
    val (w, h) = (9, 11)
    val idx = Array.tabulate(w * h)(i => (i / w) % pal8.length) // row bands
    val bytes = gif(w, h, pal8, bgIndex = 0,
      Seq(Frame(0, 0, w, h, idx, interlaced = true)))
    val anim = Multimodal.decodeGif(bytes).get
    assert(anim.frames.head.pixels === rgb(pal8, idx))
  }

  test("large random image forces full 12-bit code path") {
    val rnd = new scala.util.Random(7)
    val (w, h) = (101, 97)
    val idx = Array.fill(w * h)(rnd.nextInt(pal8.length))
    val bytes = gif(w, h, pal8, bgIndex = 0, Seq(Frame(0, 0, w, h, idx)))
    assert(Multimodal.decodeGif(bytes).get.frames.head.pixels ===
      rgb(pal8, idx))
  }

  test("animation composites offsets, transparency, and disposal 2; meta sums delays") {
    val (w, h) = (8, 6)
    val bg = 7 // white background
    val f0 = Array.fill(w * h)(1) // full red frame
    val patch = Array.fill(3 * 2)(2) // green 3x2 patch
    val hole = Array.tabulate(3 * 2)(i => if (i == 0) 0 else 3) // idx0 transparent
    val bytes = gif(w, h, pal8, bg, Seq(
      Frame(0, 0, w, h, f0, delayCs = 10),
      Frame(2, 1, 3, 2, patch, delayCs = 20, disposal = 2),
      Frame(4, 3, 3, 2, hole, delayCs = 30, transparent = 0)))
    val anim = Multimodal.decodeGif(bytes).get
    assert(anim.frames.size === 3)
    assert(anim.frames.map(_.delayMs) === Seq(100L, 200L, 300L))
    // Reference compositor: canvas starts as bg, frames draw at their
    // offsets, transparent indices skip, disposal 2 restores the RECT
    // to bg after the snapshot.
    val canvas = Array.fill(w * h)(bg)
    def draw(fr: Array[Int], left: Int, top: Int, fw: Int, fh: Int,
        transparent: Int): Array[Int] = {
      for (y <- 0 until fh; x <- 0 until fw)
        if (fr(y * fw + x) != transparent)
          canvas((top + y) * w + (left + x)) = fr(y * fw + x)
      canvas.clone()
    }
    val s0 = draw(f0, 0, 0, w, h, -1)
    val s1 = draw(patch, 2, 1, 3, 2, -1)
    for (y <- 0 until 2; x <- 0 until 3) canvas((1 + y) * w + (2 + x)) = bg
    val s2 = draw(hole, 4, 3, 3, 2, 0)
    assert(anim.frames(0).pixels === rgb(pal8, s0))
    assert(anim.frames(1).pixels === rgb(pal8, s1))
    assert(anim.frames(2).pixels === rgb(pal8, s2))
    // Header-only meta: dims, animation duration, no payload decode.
    val meta = Multimodal.decodeMeta(mediaOf("a.gif", bytes)).collect().head
    assert(meta.format === "gif" && meta.width === w && meta.height === h)
    assert(meta.channels === 3 && meta.duration_ms === 600L)
  }

  private def mediaOf(name: String, bytes: Array[Byte]) = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(Multimodal.MediaFile(name, bytes.length, bytes)).toDS()
  }

  test("frame fan-out: every frame becomes a re-decodable BMP; sampling thins by timeline") {
    val (w, h) = (6, 4)
    val frames = (0 until 4).map { k =>
      Frame(0, 0, w, h, Array.fill(w * h)(k % pal8.length), delayCs = 10)
    }
    val bytes = gif(w, h, pal8, 0, frames)
    val all = Multimodal.gifFramesAsBmp(mediaOf("x.gif", bytes)).collect()
    assert(all.length === 4)
    assert(all.map(_.path).toSeq ===
      (0 until 4).map(i => s"x.gif#frame$i"))
    val metas = Multimodal.decodeMeta(
      Multimodal.gifFramesAsBmp(mediaOf("x.gif", bytes))).collect()
    assert(metas.forall(m => m.format == "bmp" && m.width == w && m.height == h))
    // everyMs = 200 with 100ms frames keeps frames 0 and 2.
    val sampled = Multimodal
      .gifFramesAsBmp(mediaOf("x.gif", bytes), everyMs = 200L).collect()
    assert(sampled.map(_.path).toSeq === Seq("x.gif#frame0", "x.gif#frame2"))
  }

  test("embed uses the decoded first frame; resize flows through the BMP bridge") {
    val (w, h) = (5, 4)
    val idx = Array.tabulate(w * h)(i => i % pal8.length)
    val bytes = gif(w, h, pal8, 0, Seq(Frame(0, 0, w, h, idx)))
    val px = rgb(pal8, idx)
    val expected = new Array[Double](8)
    px.foreach(b => expected((b & 0xFF) >> 5) += 1.0 / px.length)
    val emb = Multimodal.embed(mediaOf("e.gif", bytes)).collect().head.embedding
    assert(emb.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    val resized = Multimodal.resizeBmp(
      Multimodal.gifFramesAsBmp(mediaOf("e.gif", bytes)), outW = 2, outH = 2)
      .collect()
    assert(resized.length === 1 && resized.head.width === 2)
  }

  test("truncated/corrupt GIFs are dropped, not crashed on") {
    val good = gif(8, 6, pal8, 0,
      Seq(Frame(0, 0, 8, 6, Array.tabulate(48)(_ % 8))))
    (1 until good.length by 5).foreach { cut =>
      Multimodal.decodeGif(good.take(cut)) // must not throw
    }
    // Oversized logical screen is refused before allocation.
    val bomb = good.clone()
    bomb(6) = 0xFF.toByte; bomb(7) = 0x7F.toByte // width 32767
    bomb(8) = 0xFF.toByte; bomb(9) = 0x7F.toByte // height 32767
    assert(Multimodal.decodeGif(bomb).isEmpty)
  }

  // Fixture provenance (src/test/resources/gif_ref/): each <name>.gif
  // was encoded by the system giflib (the format's reference
  // implementation, tools/gen_gif.py) and <name>.px holds the exact
  // source indices palette-mapped + composited per GIF89a by an
  // INDEPENDENT python implementation. These exist because the
  // spec-side encoder above can only prove SELF-consistency — the
  // VP8L code-length-order lesson: a shared transcription error
  // round-trips green while every real-world file refuses.
  test("giflib-encoded files decode bit-exact (independent reference)") {
    def res(p: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(p)
      try in.readAllBytes() finally in.close()
    }
    def le16(b: Array[Byte], o: Int) =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    def le32(b: Array[Byte], o: Int) =
      le16(b, o).toLong | (le16(b, o + 2).toLong << 16)
    for (n <- Seq("grad64", "noise_i", "pal4", "anim")) {
      val bytes = res(s"/gif_ref/$n.gif")
      val px = res(s"/gif_ref/$n.px")
      val w = le16(px, 0); val h = le16(px, 2); val nf = le16(px, 4)
      val anim = Multimodal.decodeGif(bytes).getOrElse(fail(s"$n refused"))
      assert((anim.width, anim.height, anim.frames.length) ===
        ((w, h, nf)), n)
      var off = 6
      anim.frames.zipWithIndex.foreach { case (fr, i) =>
        val delay = le32(px, off); off += 4
        assert(fr.delayMs === delay, s"$n frame $i delay")
        var k = 0
        while (k < w * h * 3) {
          assert(fr.pixels(k) === px(off + k), s"$n frame $i byte $k")
          k += 1
        }
        off += w * h * 3
      }
    }
  }
}
