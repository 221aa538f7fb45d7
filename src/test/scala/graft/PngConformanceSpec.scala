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
}
