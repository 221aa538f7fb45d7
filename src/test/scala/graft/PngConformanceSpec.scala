package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Independent PNG conformance sweep (src/test/resources/png_ref/
  * conf_*): every valid IHDR shape the spec defines — 15
  * colorType × bitDepth combos, each non-interlaced AND Adam7 — with
  * per-row cycled filter types and the IDAT stream split across two
  * chunks. The fixtures are written by an independent python encoder
  * (tools/gen_png.py: its own pass extraction, bit packing, forward
  * filtering and chunking — zero shared code with the decoder), so a
  * pass here proves the decoder against the SPEC, not against its own
  * test encoder (the VP8L self-consistency lesson). Goldens are the
  * expected 8-bit output under the decoder's documented conventions
  * (sub-byte gray scaled, 16-bit high byte, palette→RGB,
  * gray+alpha→RGBA).
  */
class PngConformanceSpec extends AnyFunSuite {

  private def res(p: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(p)
    try in.readAllBytes() finally in.close()
  }

  private val combos: Seq[(Int, Int)] =
    Seq(0 -> 1, 0 -> 2, 0 -> 4, 0 -> 8, 0 -> 16,
      3 -> 1, 3 -> 2, 3 -> 4, 3 -> 8,
      2 -> 8, 2 -> 16, 4 -> 8, 4 -> 16, 6 -> 8, 6 -> 16)

  for ((ct, d) <- combos; i <- Seq(0, 1)) {
    test(s"colorType $ct depth $d interlace $i decodes bit-exact") {
      val name = s"conf_t${ct}d${d}i$i"
      val png = res(s"/png_ref/$name.png")
      val px = res(s"/png_ref/$name.px")
      def le16(o: Int) = (px(o) & 0xFF) | ((px(o + 1) & 0xFF) << 8)
      val (w, h, ch) = (le16(0), le16(2), le16(4))
      val img = Multimodal.decodePng(png).getOrElse(fail(s"$name refused"))
      assert((img.width, img.height, img.channels) === ((w, h, ch)), name)
      var k = 0
      while (k < w * h * ch) {
        assert(img.pixels(k) === px(6 + k), s"$name byte $k")
        k += 1
      }
    }
  }

  test("APNG: composited frames BIT-EXACT vs the independent golden") {
    // apng_mixed (tools/gen_apng.py): 4 RGBA frames exercising split
    // IDAT on the first frame, fdAT frames, blend source AND over
    // (alphas {0,255} — exact semantics), dispose none / background /
    // previous, fractional fcTL delay encoding (den = 1000).
    val png = res("/png_ref/apng_mixed.png")
    val px = res("/png_ref/apng_mixed.px")
    def le16(o: Int) = (px(o) & 0xFF) | ((px(o + 1) & 0xFF) << 8)
    val (w, h, nf) = (le16(0), le16(2), le16(4))
    val anim = Multimodal.decodeApng(png).getOrElse(fail("refused"))
    assert((anim.width, anim.height, anim.frames.length) === ((w, h, nf)))
    assert(anim.plays === 3)
    var off = 6
    anim.frames.zipWithIndex.foreach { case (fr, i) =>
      val delay = (px(off) & 0xFF) | ((px(off + 1) & 0xFF) << 8) |
        ((px(off + 2) & 0xFF) << 16)
      off += 4
      assert(fr.delayMs === delay, s"frame $i delay")
      var k = 0
      while (k < w * h * 4) {
        assert(fr.pixels(k) === px(off + k), s"frame $i byte $k")
        k += 1
      }
      off += w * h * 4
    }
    // a STILL png must refuse the animation path but keep decoding
    val still = res("/png_ref/conf_t6d8i0.png")
    assert(Multimodal.decodeApng(still).isEmpty)
    assert(Multimodal.decodePng(still).isDefined)
    // decodePng on the APNG yields the default (first) image unchanged
    assert(Multimodal.decodePng(png).exists(img =>
      img.width == w && img.height == h))
  }

  test("APNG: refuses tRNS-keyed palette frames and a non-canvas default-image fcTL") {
    // Palette + tRNS (tools/gen_apng.py negative fixture): the frame
    // decoder expands palettes to OPAQUE RGB — compositing would
    // silently paint color-keyed pixels, so the animation path must
    // refuse. The STILL path keeps decoding (its tRNS drop is a
    // documented scope boundary with no compositing to corrupt).
    val pal = res("/png_ref/apng_pal_trns.png")
    assert(Multimodal.decodeApng(pal).isEmpty)
    assert(Multimodal.decodePng(pal).isDefined)
    // Default-image fcTL narrower than the canvas: IDAT scanlines are
    // filtered at CANVAS width — refuse rather than rewrap garbage.
    val bad = res("/png_ref/apng_bad_default_fctl.png")
    assert(Multimodal.decodeApng(bad).isEmpty)
  }

  test("APNG: meta duration, frame fan-out, and hostile-input fuzz") {
    import TestSpark._
    import spark.implicits._
    val png = res("/png_ref/apng_mixed.png")
    val meta = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("a.png", png.length, png)).toDS())
      .collect().head
    assert(meta.duration_ms === 320L) // 50+70+90+110
    val frames = Multimodal.apngFramesAsBmp(Seq(
      Multimodal.MediaFile("a.png", png.length, png)).toDS()).collect()
    assert(frames.length === 4)
    val sampled = Multimodal.apngFramesAsBmp(Seq(
      Multimodal.MediaFile("a.png", png.length, png)).toDS(),
      everyMs = 100L).collect()
    assert(sampled.length < 4 && sampled.nonEmpty)
    val rnd = new scala.util.Random(57)
    for (i <- 0 until 60) {
      val b = png.clone()
      if (i % 2 == 0) {
        (0 until 1 + rnd.nextInt(6)).foreach { _ =>
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        }
        Multimodal.decodeApng(b) // Some or None, never throw
      } else {
        Multimodal.decodeApng(b.take(8 + rnd.nextInt(b.length - 8)))
      }
    }
  }
}
