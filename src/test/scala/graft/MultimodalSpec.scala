package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Multimodal column pipeline: binaryFile scan → typed Dataset →
  * per-partition decode/embed → frame fan-out → similarity handoff.
  * BMP and WAV decode via REAL pure-JVM header/payload parsers (bytes
  * constructed to spec here, then parsed back); codec-dependent
  * formats (jpg/png/mp4) exercise the deterministic fallback. The
  * plumbing — schemas, batch shape, determinism, the join with the
  * real vector kernels — is identical for both paths.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  /** A w×h 24-bpp uncompressed BMP (BITMAPINFOHEADER, 4-byte row
    * stride padding) with deterministic gradient pixels. */
  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until stride * h).foreach(i => b.put((i * 31).toByte))
    b.array()
  }

  /** A mono 16-bit PCM WAV: `nSamples` samples of a sine at `rate` Hz. */
  private def wavBytes(rate: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
    b.putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(dataLen)
    (0 until nSamples).foreach(i =>
      b.putShort((math.sin(i * 0.1) * 20000).toShort))
    b.array()
  }

  private lazy val realDir: Path = {
    val p = Files.createTempDirectory("graft_media_real")
    p.toFile.deleteOnExit()
    Files.write(p.resolve("img.bmp"), bmpBytes(w = 3, h = 2))
    Files.write(p.resolve("tone.wav"), wavBytes(rate = 8000, nSamples = 12000))
    p
  }

  test("real BMP and WAV kernels decode actual headers, not fakes") {
    val meta = Multimodal.decodeMeta(Multimodal.media(spark, realDir + "/*"))
      .collect().map(m => m.path.split('/').last -> m).toMap
    val bmp = meta("img.bmp")
    assert(bmp.format === "bmp" && bmp.width === 3 && bmp.height === 2)
    assert(bmp.channels === 3 && bmp.duration_ms === 0L)
    val wav = meta("tone.wav")
    assert(wav.format === "wav" && wav.channels === 1)
    // 12000 samples at 8 kHz = exactly 1500 ms.
    assert(wav.duration_ms === 1500L && wav.width === 0 && wav.height === 0)
  }

  test("stills emit one frame; audio fans out by decoded duration") {
    val meta = Multimodal.decodeMeta(Multimodal.media(spark, realDir + "/*"))
    val frames = Multimodal.sampleFrames(meta, everyMs = 500L).collect()
      .groupBy(_.getString(0).split('/').last)
      .view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    assert(frames("img.bmp") === Seq(0L))
    assert(frames("tone.wav") === Seq(0L, 500L, 1000L))
  }

  test("real-format embeddings are payload histograms (unit sum)") {
    val emb = Multimodal.embed(Multimodal.media(spark, realDir + "/*"))
      .collect().map(e => e.path.split('/').last -> e.embedding).toMap
    Seq("img.bmp", "tone.wav").foreach { f =>
      assert(math.abs(emb(f).sum - 1.0) < 1e-9, s"$f histogram not unit-sum")
      assert(emb(f).forall(_ >= 0.0))
    }
    // The sine's amplitude distribution is symmetric and avoids the
    // extreme bins (|s| <= 20000 of 32768) — a real decode signature
    // the byte-hash fallback could not produce.
    val w = emb("tone.wav")
    assert(w(0) === 0.0 && w(7) === 0.0 && w.sum > 0.99)
  }

  test("resizeBmp: real nearest-neighbor resample emits a re-decodable BMP") {
    import spark.implicits._
    // Downscale the 3×2 fixture to 2×1; the WAV must be dropped (no codec).
    val resized = Multimodal
      .resizeBmp(Multimodal.media(spark, realDir + "/*"), outW = 2, outH = 1)
      .collect()
    assert(resized.length === 1)
    val r = resized.head
    assert(r.path.endsWith("img.bmp") && r.width === 2 && r.height === 1)
    // Round-trip: the emitted bytes are a spec-valid BMP that the real
    // decoder re-decodes with the new dimensions.
    val meta = Multimodal
      .decodeMeta(Seq(Multimodal.MediaFile(r.path, r.bmp.length, r.bmp)).toDS())
      .collect().head
    assert(meta.format === "bmp" && meta.width === 2 && meta.height === 1)
    assert(meta.channels === 3)
    // Pixel correctness. Input 3×2 bottom-up, strideIn=12, pixels
    // (i*31).toByte over the region after the 54-byte header; output
    // image row 0 maps to input image row 0 = file row 1 (bytes 12..),
    // sx ∈ {0*3/2, 1*3/2} = {0, 1}.
    val expected = Seq(12, 13, 14, 15, 16, 17).map(i => (i * 31).toByte)
    assert(r.bmp.slice(54, 60).toSeq === expected)
    // Upscale round-trips too (nearest-neighbor repeats source pixels).
    val up = Multimodal
      .resizeBmp(Multimodal.media(spark, realDir + "/*.bmp"), outW = 6, outH = 4)
      .collect().head
    val upMeta = Multimodal
      .decodeMeta(Seq(Multimodal.MediaFile(up.path, up.bmp.length, up.bmp)).toDS())
      .collect().head
    assert(upMeta.width === 6 && upMeta.height === 4)
    // Image-space (0,0) is preserved: input image row 0 = file row 1 at
    // byte 54+12; output image row 0 = file row 3 (bottom-up, stride 20).
    assert(up.bmp(54 + 3 * 20) === (12 * 31).toByte)
  }

  private lazy val dir: Path = {
    val p = Files.createTempDirectory("graft_media")
    p.toFile.deleteOnExit()
    // Deterministic fake media files; two have identical content so the
    // similarity handoff has a known top pair.
    Files.write(p.resolve("a.jpg"), Array.tabulate[Byte](256)(i => (i * 7).toByte))
    Files.write(p.resolve("b.png"), Array.tabulate[Byte](512)(i => (i * 3).toByte))
    Files.write(p.resolve("c.jpg"), Array.tabulate[Byte](256)(i => (i * 7).toByte))
    Files.write(p.resolve("d.mp4"), Array.tabulate[Byte](1024)(i => (i * 11).toByte))
    p
  }
  private def glob = dir.toString + "/*"

  test("binaryFile → typed MediaFile dataset carries exact bytes") {
    val m = Multimodal.media(spark, glob).collect()
    assert(m.length === 4)
    val a = m.find(_.path.endsWith("a.jpg")).get
    assert(a.length === 256L && a.content.length === 256)
  }

  test("stub decode is deterministic and schema-stable") {
    val meta1 = Multimodal.decodeMeta(Multimodal.media(spark, glob))
      .collect().sortBy(_.path)
    val meta2 = Multimodal.decodeMeta(Multimodal.media(spark, glob))
      .collect().sortBy(_.path)
    assert(meta1.toSeq === meta2.toSeq)
    meta1.foreach { m =>
      assert(m.width >= 64 && m.height >= 64 && Set(1, 3)(m.channels))
      assert(m.duration_ms >= 1000L)
    }
    // Identical content → identical decoded metadata (a.jpg == c.jpg).
    val byPath = meta1.map(m => m.path.split('/').last -> m).toMap
    assert(byPath("a.jpg").width === byPath("c.jpg").width)
    assert(byPath("a.jpg").format === "jpg" && byPath("d.mp4").format === "mp4")
  }

  test("frame sampling fans out one row per sampled frame") {
    val meta = Multimodal.decodeMeta(Multimodal.media(spark, glob))
    val frames = Multimodal.sampleFrames(meta, everyMs = 500L)
    val expected = meta.collect()
      .map(m => 1L + (m.duration_ms - 1) / 500L).sum
    assert(frames.count() === expected)
    assert(frames.filter(col("frame_ms") % 500 =!= 0).count() === 0L)
  }

  test("stub embeddings flow into the real cosine kernel; duplicates rank first") {
    val emb = Multimodal.embed(Multimodal.media(spark, glob))
    val top = Multimodal.nearestPairs(spark, emb, k = 6).collect()
    assert(top.length === 6)
    val best = top.head
    // a.jpg and c.jpg share content → cosine exactly 1.0 at the top.
    assert(Set(best.getString(0), best.getString(1))
      .map(_.split('/').last) === Set("a.jpg", "c.jpg"))
    assert(best.getDouble(2) === 1.0)
  }

  // ---- PNG: spec-compliant encoder built HERE (forward filtering +
  // Deflater + CRC32 chunks), decoded by the main-side inverse path —
  // encoder and decoder share no code, so a round-trip pins both the
  // chunk walk and every filter's math.

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(12 + data.length)
    b.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes("US-ASCII"))
    crc.update(data)
    b.putInt(crc.getValue.toInt)
    b.array()
  }

  /** Encode `pixels` (row-major, top-down, `ch` bytes/pixel) as a PNG,
    * FORWARD-filtering row y with filters(y % filters.length), and
    * splitting the deflated stream into `idatParts` IDAT chunks. */
  private def pngBytes(w: Int, h: Int, colorType: Int, pixels: Array[Byte],
      filters: Seq[Int], idatParts: Int = 1): Array[Byte] = {
    val ch = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
    val stride = w * ch
    val raw = new Array[Byte](h * (stride + 1))
    def px(y: Int, x: Int): Int =
      if (y < 0 || x < 0) 0 else pixels(y * stride + x) & 0xFF
    for (y <- 0 until h) {
      val ft = filters(y % filters.length)
      raw(y * (stride + 1)) = ft.toByte
      for (x <- 0 until stride) {
        val cur = px(y, x)
        val a = px(y, x - ch)
        val b = px(y - 1, x)
        val c = px(y - 1, x - ch)
        val filtered = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val (pa, pb, pc) =
              (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (stride + 1) + 1 + x) = (filtered & 0xFF).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 128)
    val zLen = defl.deflate(buf)
    defl.end()
    val z = buf.take(zLen)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte))
    out.write(pngChunk("IHDR", ihdr))
    val per = math.max(1, (z.length + idatParts - 1) / idatParts)
    z.grouped(per).foreach(part => out.write(pngChunk("IDAT", part)))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Generalized independent PNG writer for the extended-shape pins:
    * sub-byte/16-bit depths, palette + PLTE, optional Adam7 (rows of
    * every pass filter-0; the filter ladder is exercised by the 8-bit
    * suite). `vals` holds one int per sample in [0, 2^depth). */
  private def pngBytesExt(w: Int, h: Int, colorType: Int, depth: Int,
      vals: Array[Int], palette: Array[Byte] = null,
      adam7: Boolean = false): Array[Byte] = {
    val n = colorType match {
      case 0 | 3 => 1; case 4 => 2; case 2 => 3; case 6 => 4
    }
    val passes =
      if (!adam7) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val rawOut = new java.io.ByteArrayOutputStream()
    for ((x0, y0, dx, dy) <- passes) {
      val pw = (w - x0 + dx - 1) / dx
      val ph = (h - y0 + dy - 1) / dy
      if (pw > 0 && ph > 0) {
        val rb = (pw * n * depth + 7) / 8
        for (py <- 0 until ph) {
          val row = new Array[Byte](rb)
          val sy = y0 + py * dy
          for (px <- 0 until pw; ch <- 0 until n) {
            val v = vals((sy * w + x0 + px * dx) * n + ch)
            val i = px * n + ch
            if (depth == 16) {
              row(i * 2) = (v >> 8).toByte
              row(i * 2 + 1) = (v & 0xFF).toByte
            } else if (depth == 8) row(i) = v.toByte
            else {
              val bit = i * depth
              row(bit >> 3) = (row(bit >> 3) |
                ((v & ((1 << depth) - 1)) << (8 - depth - (bit & 7)))).toByte
            }
          }
          rawOut.write(0) // filter None
          rawOut.write(row)
        }
      }
    }
    val raw = rawOut.toByteArray
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 256)
    val zLen = defl.deflate(buf); defl.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte)
      .put(if (adam7) 1.toByte else 0.toByte).array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte))
    out.write(pngChunk("IHDR", ihdr))
    if (palette != null) out.write(pngChunk("PLTE", palette))
    out.write(pngChunk("IDAT", buf.take(zLen)))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  test("PNG decode: palette (8-bit and 4-bit with bit padding) expands to RGB") {
    val rnd = new scala.util.Random(7)
    val pal = Array.fill[Byte](256 * 3)(rnd.nextInt(256).toByte)
    val idx8 = Array.fill(7 * 5)(rnd.nextInt(256))
    val img8 = Multimodal.decodePng(
      pngBytesExt(7, 5, colorType = 3, depth = 8, idx8, palette = pal)).get
    assert(img8.width === 7 && img8.height === 5 && img8.channels === 3)
    assert(img8.pixels.toSeq === idx8.flatMap(i =>
      Seq(pal(i * 3), pal(i * 3 + 1), pal(i * 3 + 2))).toSeq)
    // 4-bit indices, odd width 5: rows pad to byte boundaries.
    val pal16 = pal.take(16 * 3)
    val idx4 = Array.fill(5 * 3)(rnd.nextInt(16))
    val img4 = Multimodal.decodePng(
      pngBytesExt(5, 3, colorType = 3, depth = 4, idx4, palette = pal16)).get
    assert(img4.pixels.toSeq === idx4.flatMap(i =>
      Seq(pal16(i * 3), pal16(i * 3 + 1), pal16(i * 3 + 2))).toSeq)
    // Index past the palette: structural loss, whole file drops.
    assert(Multimodal.decodePng(pngBytesExt(2, 1, 3, 8, Array(0, 9),
      palette = pal.take(4 * 3))).isEmpty)
    // Palette type without a PLTE chunk at all: drop.
    assert(Multimodal.decodePng(pngBytesExt(2, 1, 3, 8, Array(0, 1))).isEmpty)
  }

  test("PNG decode: sub-byte gray scales to 8-bit; 16-bit takes the high byte") {
    // 1-bit checkerboard, width 9 forces row padding.
    val bw = Array.tabulate(9 * 4)(i => (i % 9 + i / 9) % 2)
    val img1 = Multimodal.decodePng(pngBytesExt(9, 4, 0, 1, bw)).get
    assert(img1.channels === 1)
    assert(img1.pixels.toSeq === bw.map(v => (v * 255).toByte).toSeq)
    // 2-bit gray: x85 lift.
    val g2 = Array.tabulate(6 * 2)(i => i % 4)
    val img2 = Multimodal.decodePng(pngBytesExt(6, 2, 0, 2, g2)).get
    assert(img2.pixels.toSeq === g2.map(v => (v * 85).toByte).toSeq)
    // 16-bit RGB: high byte survives, low byte is view-discarded.
    val rnd = new scala.util.Random(11)
    val v16 = Array.fill(4 * 3 * 3)(rnd.nextInt(65536))
    val img16 = Multimodal.decodePng(pngBytesExt(4, 3, 2, 16, v16)).get
    assert(img16.channels === 3)
    assert(img16.pixels.toSeq === v16.map(v => (v >> 8).toByte).toSeq)
    // 16-bit gray too (bppBytes = 2 path).
    val g16 = Array.fill(5 * 2)(rnd.nextInt(65536))
    val imgG = Multimodal.decodePng(pngBytesExt(5, 2, 0, 16, g16)).get
    assert(imgG.pixels.toSeq === g16.map(v => (v >> 8).toByte).toSeq)
    // Gray+alpha expands to RGBA (gray replicated, alpha kept).
    val ga = Array(10, 200, 30, 100, 50, 0, 70, 255) // (g, a) x 4 px
    val imgGA = Multimodal.decodePng(pngBytesExt(2, 2, 4, 8, ga)).get
    assert(imgGA.channels === 4)
    assert(imgGA.pixels.toSeq === Seq[Byte](10, 10, 10, 200.toByte,
      30, 30, 30, 100, 50, 50, 50, 0, 70, 70, 70, 255.toByte))
    // 16-bit gray+alpha: high bytes of both samples.
    val ga16 = Array(0x1234, 0xFF00, 0xABCD, 0x0080)
    val imgGA16 = Multimodal.decodePng(pngBytesExt(2, 1, 4, 16, ga16)).get
    assert(imgGA16.pixels.toSeq === Seq[Byte](0x12, 0x12, 0x12, 0xFF.toByte,
      0xAB.toByte, 0xAB.toByte, 0xAB.toByte, 0x00))
    // A type-4 IHDR whose stream only carries 1-sample rows is
    // malformed (inflate short): drops, no crash.
    assert(Multimodal.decodePng(pngBytesExt(2, 2, 0, 8,
      Array.fill(4)(1)).updated(25, 4.toByte)).isEmpty)
  }

  test("PNG decode: Adam7 interlace scatters every pass onto the canvas") {
    val rnd = new scala.util.Random(23)
    // 16x9 RGB: every pass non-empty; must equal the same pixels
    // decoded from the non-interlaced spelling.
    val vals = Array.fill(16 * 9 * 3)(rnd.nextInt(256))
    val plain = Multimodal.decodePng(pngBytesExt(16, 9, 2, 8, vals)).get
    val inter = Multimodal.decodePng(
      pngBytesExt(16, 9, 2, 8, vals, adam7 = true)).get
    assert(inter.pixels.toSeq === plain.pixels.toSeq)
    // Tiny canvases: most Adam7 passes are EMPTY (zero scanlines).
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 3), (5, 1), (1, 5))) {
      val v = Array.fill(w * h)(rnd.nextInt(256))
      val got = Multimodal.decodePng(pngBytesExt(w, h, 0, 8, v, adam7 = true))
      assert(got.isDefined, s"${w}x$h interlaced failed")
      assert(got.get.pixels.toSeq === v.map(_.toByte).toSeq, s"${w}x$h")
    }
    // Interlaced palette + sub-byte: both remappings compose.
    val pal = Array.fill[Byte](16 * 3)(rnd.nextInt(256).toByte)
    val idx = Array.fill(10 * 7)(rnd.nextInt(16))
    val ip = Multimodal.decodePng(
      pngBytesExt(10, 7, 3, 4, idx, palette = pal, adam7 = true)).get
    assert(ip.pixels.toSeq === idx.flatMap(i =>
      Seq(pal(i * 3), pal(i * 3 + 1), pal(i * 3 + 2))).toSeq)
  }

  test("PNG decode: filter-0 RGB round-trips pixel-exact") {
    val pixels = Array.tabulate[Byte](3 * 2 * 3)(i => (i * 17).toByte)
    val png = pngBytes(3, 2, colorType = 2, pixels, filters = Seq(0))
    val img = Multimodal.decodePng(png).get
    assert(img.width === 3 && img.height === 2 && img.channels === 3)
    assert(img.pixels.toSeq === pixels.toSeq)
  }

  test("PNG decode: all five filters and split IDAT round-trip exactly") {
    val rnd = new scala.util.Random(42)
    val pixels = Array.fill[Byte](16 * 9 * 3)(rnd.nextInt(256).toByte)
    // Rows cycle None/Sub/Up/Average/Paeth; zlib stream split into 3
    // IDAT chunks (encoders do this — the decoder must concatenate).
    val png = pngBytes(16, 9, colorType = 2, pixels,
      filters = Seq(0, 1, 2, 3, 4), idatParts = 3)
    val img = Multimodal.decodePng(png).get
    assert(img.pixels.toSeq === pixels.toSeq)
  }

  test("PNG decode: gray and RGBA color types; rejects what it can't parse") {
    val gray = Array.tabulate[Byte](4 * 3)(i => (i * 19).toByte)
    val g = Multimodal.decodePng(
      pngBytes(4, 3, colorType = 0, gray, filters = Seq(1, 4))).get
    assert(g.channels === 1 && g.pixels.toSeq === gray.toSeq)
    val rgba = Array.tabulate[Byte](2 * 2 * 4)(i => (i * 23).toByte)
    val r = Multimodal.decodePng(
      pngBytes(2, 2, colorType = 6, rgba, filters = Seq(4))).get
    assert(r.channels === 4 && r.pixels.toSeq === rgba.toSeq)
    // 16-bit depth: refused (None), not mis-decoded.
    val deep = pngBytes(2, 2, colorType = 2,
      Array.fill[Byte](12)(1), filters = Seq(0))
    deep(24) = 16 // depth byte inside IHDR
    assert(Multimodal.decodePng(deep).isEmpty)
    // Decompression bomb: header claims 100k x 100k — refused by the
    // raw-size guard before any allocation.
    val bomb = pngBytes(2, 2, colorType = 2,
      Array.fill[Byte](12)(1), filters = Seq(0))
    val bb = java.nio.ByteBuffer.wrap(bomb)
    bb.putInt(16, 100000).putInt(20, 100000)
    assert(Multimodal.decodePng(bomb).isEmpty)
  }

  private lazy val pngDir: Path = {
    val p = Files.createTempDirectory("graft_media_png")
    p.toFile.deleteOnExit()
    val pixels = Array.tabulate[Byte](5 * 4 * 3)(i => (i * 13).toByte)
    Files.write(p.resolve("real.png"),
      pngBytes(5, 4, colorType = 2, pixels, filters = Seq(0, 1, 2, 3, 4)))
    p
  }

  test("PNG flows through the pipeline: real meta, decoded-pixel histogram, resize") {
    val files = Multimodal.media(spark, pngDir + "/*")
    val meta = Multimodal.decodeMeta(files).collect().head
    assert(meta.format === "png" && meta.width === 5 && meta.height === 4)
    assert(meta.channels === 3 && meta.duration_ms === 0L)
    // Embedding = 8-bin histogram over the DEFILTERED pixels — computed
    // independently here from the known pixel array.
    val pixels = Array.tabulate[Byte](5 * 4 * 3)(i => (i * 13).toByte)
    val expected = new Array[Double](8)
    pixels.foreach(b => expected((b & 0xFF) >> 5) += 1.0 / pixels.length)
    val emb = Multimodal.embed(files).collect().head.embedding
    assert(emb.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-9 },
      s"histogram mismatch: ${emb.toSeq} vs ${expected.toSeq}")
    // PNG -> BMP bridge -> existing resize kernel -> re-decodable BMP.
    val resized = Multimodal
      .resizeBmp(Multimodal.pngAsBmp(files), outW = 2, outH = 2).collect()
    assert(resized.length === 1)
    import spark.implicits._
    val rMeta = Multimodal.decodeMeta(
      Seq(Multimodal.MediaFile("r.bmp", resized.head.bmp.length,
        resized.head.bmp)).toDS()).collect().head
    assert(rMeta.format === "bmp" && rMeta.width === 2 && rMeta.height === 2)
    // Pixel spot-check through the whole chain: BMP bottom-up + BGR vs
    // PNG top-down + RGB. Output (0,0) image-space samples input (0,0):
    // PNG pixel (r,g,b) = (0, 13, 26); the BMP row is the LAST row in
    // the file, stored b,g,r.
    val b = resized.head.bmp
    val stride = ((2 * 3 + 3) / 4) * 4
    val lastRow = 54 + stride * 1
    assert((b(lastRow) & 0xFF) === 26 && (b(lastRow + 1) & 0xFF) === 13 &&
      (b(lastRow + 2) & 0xFF) === 0)
  }

  // ---- WebP lossless: spec-side encoder lives in WebpSpec; this is
  // the pipeline-flow twin of the PNG/JPEG tests ----------------------

  private lazy val webpDir: Path = {
    val p = Files.createTempDirectory("graft_media_webp")
    p.toFile.deleteOnExit()
    val px = Array.tabulate(5 * 4) { i =>
      0xFF000000 | (((i * 13) & 0xFF) << 16) | (((i * 29) & 0xFF) << 8) |
        ((i * 7) & 0xFF)
    }
    Files.write(p.resolve("real.webp"),
      WebpTestEncoder.encode(5, 4, WebpTestEncoder.litsOf(px.toSeq)))
    p
  }

  test("WebP-lossless flows through the pipeline: real meta, decoded-pixel histogram, resize") {
    val files = Multimodal.media(spark, webpDir + "/*")
    val meta = Multimodal.decodeMeta(files).collect().head
    assert(meta.format === "webp" && meta.width === 5 && meta.height === 4)
    assert(meta.channels === 4 && meta.duration_ms === 0L)
    // Embedding = 8-bin histogram over the decoded RGBA bytes, computed
    // independently from the known pixel array.
    val rgba = Array.tabulate[Byte](5 * 4 * 4) { j =>
      val i = j / 4
      (j % 4 match {
        case 0 => (i * 13) & 0xFF
        case 1 => (i * 29) & 0xFF
        case 2 => (i * 7) & 0xFF
        case _ => 0xFF
      }).toByte
    }
    val expected = new Array[Double](8)
    rgba.foreach(b => expected((b & 0xFF) >> 5) += 1.0 / rgba.length)
    val emb = Multimodal.embed(files).collect().head.embedding
    assert(emb.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-9 },
      s"histogram mismatch: ${emb.toSeq} vs ${expected.toSeq}")
    // WebP -> BMP bridge -> existing resize kernel -> re-decodable BMP.
    val resized = Multimodal
      .resizeBmp(Multimodal.webpAsBmp(files), outW = 2, outH = 2).collect()
    assert(resized.length === 1)
    import spark.implicits._
    val rMeta = Multimodal.decodeMeta(
      Seq(Multimodal.MediaFile("r.bmp", resized.head.bmp.length,
        resized.head.bmp)).toDS()).collect().head
    assert(rMeta.format === "bmp" && rMeta.width === 2 && rMeta.height === 2)
    // Pixel spot-check through the chain: output (0,0) samples input
    // (0,0) = RGB (0, 0, 0); BMP is bottom-up BGR, so the output's top
    // row is the LAST row in the file.
    val b = resized.head.bmp
    val stride = ((2 * 3 + 3) / 4) * 4
    val lastRow = 54 + stride * 1
    assert((b(lastRow) & 0xFF) === 0 && (b(lastRow + 1) & 0xFF) === 0 &&
      (b(lastRow + 2) & 0xFF) === 0)
  }

  test("VP8X (extended WebP) reports canvas dims; lossy VP8 reports honest zeros") {
    import spark.implicits._
    def riffWith(fourcc: String, payload: Array[Byte]): Array[Byte] = {
      val total = 4 + 8 + payload.length
      val bb = java.nio.ByteBuffer.allocate(8 + total)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(total)
      bb.put("WEBP".getBytes("US-ASCII"))
      bb.put(fourcc.getBytes("US-ASCII")).putInt(payload.length)
      bb.put(payload).array()
    }
    // VP8X: 4 flag/reserved bytes, then 24-bit (w-1), 24-bit (h-1).
    val vp8x = riffWith("VP8X", Array[Byte](0, 0, 0, 0,
      99, 0, 0, /* w-1 = 99 */ 49, 0, 0 /* h-1 = 49 */))
    val vp8 = riffWith("VP8 ", Array.fill[Byte](16)(0))
    val metas = Multimodal.decodeMeta(Seq(
        Multimodal.MediaFile("x.webp", vp8x.length, vp8x),
        Multimodal.MediaFile("l.webp", vp8.length, vp8)).toDS())
      .collect().map(m => m.path -> m).toMap
    assert(metas("x.webp").format === "webp" &&
      metas("x.webp").width === 100 && metas("x.webp").height === 50)
    assert(metas("l.webp").format === "webp" &&
      metas("l.webp").width === 0 && metas("l.webp").height === 0)
  }

  // ---- JPEG: spec-side baseline encoder, zero shared code with the
  // decoder — both independently derived from ITU T.81. The encoder
  // uses simple flat-length Huffman tables (all 12 DC categories at 4
  // bits, all 162 AC symbols at 9 bits — valid canonical tables that
  // never produce the forbidden all-ones code), so the decoder's
  // generic canonical-table builder is exercised on tables no standard
  // encoder emits. ----------------------------------------------------

  private val jZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val jDcBits = { val b = new Array[Int](17); b(4) = 12; b }
  private val jDcVals = (0 to 11).toArray
  private val jAcBits = { val b = new Array[Int](17); b(9) = 162; b }
  private val jAcVals = (Seq(0x00, 0xF0) ++
    (for { r <- 0 to 15; s <- 1 to 10 } yield (r << 4) | s)).toArray

  /** Canonical code assignment per T.81 Annex C: symbol -> (code, len). */
  private def jhuffCodes(bits: Array[Int],
      vals: Array[Int]): Map[Int, (Int, Int)] = {
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    var code = 0
    var k = 0
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l)) {
        m(vals(k)) = (code, l); code += 1; k += 1
      }
      code <<= 1
    }
    m.toMap
  }

  private final class JBitW(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = while (n != 0) put(1, 1) // pad with 1-bits
  }

  /** Forward DCT + quantize (all table entries = qval), zigzag order. */
  private def jFdctQuant(block: Array[Double], qval: Int): Array[Int] = {
    val f = new Array[Double](64)
    for (v <- 0 until 8; u <- 0 until 8) {
      var acc = 0.0
      for (y <- 0 until 8; x <- 0 until 8)
        acc += block(y * 8 + x) *
          math.cos((2 * x + 1) * u * math.Pi / 16) *
          math.cos((2 * y + 1) * v * math.Pi / 16)
      val cu = if (u == 0) 1 / math.sqrt(2.0) else 1.0
      val cv = if (v == 0) 1 / math.sqrt(2.0) else 1.0
      f(v * 8 + u) = acc * cu * cv / 4.0
    }
    jZigzag.map(i => math.round(f(i) / qval).toInt)
  }

  private def jEmitBlock(zz: Array[Int], dcPrev: Int, bw: JBitW,
      dcC: Map[Int, (Int, Int)], acC: Map[Int, (Int, Int)]): Int = {
    def cat(v: Int): Int =
      if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))
    val diff = zz(0) - dcPrev
    val s = cat(diff)
    assert(s <= 11, s"DC category $s out of baseline range")
    val (dc, dl) = dcC(s)
    bw.put(dc, dl)
    if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    var k = 1
    var run = 0
    while (k < 64) {
      val v = zz(k)
      if (v == 0) run += 1
      else {
        while (run >= 16) {
          val (zc, zl) = acC(0xF0); bw.put(zc, zl); run -= 16
        }
        val sa = cat(v)
        assert(sa <= 10, s"AC category $sa out of baseline range")
        val (ac, al) = acC((run << 4) | sa)
        bw.put(ac, al)
        bw.put(if (v >= 0) v else v + (1 << sa) - 1, sa)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = acC(0x00); bw.put(ec, el) }
    zz(0)
  }

  /** Baseline JFIF encode of interleaved top-down RGB: uniform quant
    * qval, optional 4:2:0 chroma subsampling (2x2 average), optional
    * single-component grayscale (from the red channel). Partial-MCU
    * edges pad by clamped (replicated) sampling. `restartMcus` > 0
    * emits a DRI segment and RSTn markers every that-many MCUs
    * (cycling D0..D7, DC predictors reset); `fillBytes` additionally
    * pads each restart marker with a leading 0xFF fill byte — legal
    * per T.81 B.1.1.2 and emitted by real encoders, so the decoder
    * must skip it. */
  private def jpegBytes(w: Int, h: Int, rgb: Array[Byte], qval: Int,
      subsample420: Boolean, gray: Boolean = false,
      restartMcus: Int = 0, fillBytes: Boolean = false): Array[Byte] = {
    def r(x: Int, y: Int) = rgb((y * w + x) * 3) & 0xFF
    def g(x: Int, y: Int) = rgb((y * w + x) * 3 + 1) & 0xFF
    def b(x: Int, y: Int) = rgb((y * w + x) * 3 + 2) & 0xFF
    def cl(v: Int, hi: Int) = math.max(0, math.min(v, hi - 1))
    def yOf(x0: Int, y0: Int): Double = {
      val (x, y) = (cl(x0, w), cl(y0, h))
      0.299 * r(x, y) + 0.587 * g(x, y) + 0.114 * b(x, y)
    }
    def cbOf(x0: Int, y0: Int): Double = {
      val (x, y) = (cl(x0, w), cl(y0, h))
      -0.168736 * r(x, y) - 0.331264 * g(x, y) + 0.5 * b(x, y) + 128
    }
    def crOf(x0: Int, y0: Int): Double = {
      val (x, y) = (cl(x0, w), cl(y0, h))
      0.5 * r(x, y) - 0.418688 * g(x, y) - 0.081312 * b(x, y) + 128
    }
    def sub(f: (Int, Int) => Double)(x: Int, y: Int): Double =
      (f(2 * x, 2 * y) + f(2 * x + 1, 2 * y) + f(2 * x, 2 * y + 1) +
        f(2 * x + 1, 2 * y + 1)) / 4.0
    def block(f: (Int, Int) => Double, x0: Int, y0: Int): Array[Double] =
      Array.tabulate(64)(i => f(x0 + i % 8, y0 + i / 8) - 128.0)

    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xFF); out.write(marker)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xFF)
      payload.foreach(p => out.write(p & 0xFF))
    }
    out.write(0xFF); out.write(0xD8) // SOI
    seg(0xDB, 0 +: Array.fill(64)(qval)) // DQT table 0, 8-bit
    val nc = if (gray) 1 else 3
    val sampling =
      if (gray) Seq(0x11)
      else if (subsample420) Seq(0x22, 0x11, 0x11)
      else Seq(0x11, 0x11, 0x11)
    seg(0xC0, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, nc) ++
      (0 until nc).flatMap(i => Seq(i + 1, sampling(i), 0))) // SOF0
    seg(0xC4, 0x00 +: (jDcBits.drop(1) ++ jDcVals)) // DHT DC 0
    seg(0xC4, 0x10 +: (jAcBits.drop(1) ++ jAcVals)) // DHT AC 0
    if (restartMcus > 0)
      seg(0xDD, Array(restartMcus >> 8, restartMcus & 0xFF)) // DRI
    seg(0xDA, nc +: ((0 until nc).flatMap(i => Seq(i + 1, 0x00)) ++
      Seq(0, 63, 0)).toArray) // SOS
    val dcC = jhuffCodes(jDcBits, jDcVals)
    val acC = jhuffCodes(jAcBits, jAcVals)
    val bw = new JBitW(out)
    var mcuIdx = 0
    var rstIdx = 0
    // Byte-align + RSTn BEFORE the MCU whose index is a multiple of
    // the interval (mirrors the decoder's expectation); returns true
    // when the caller must reset its DC predictors.
    def rstBoundary(): Boolean = {
      if (restartMcus > 0 && mcuIdx > 0 && mcuIdx % restartMcus == 0) {
        bw.flush()
        if (fillBytes) out.write(0xFF) // T.81 fill byte before marker
        out.write(0xFF); out.write(0xD0 + (rstIdx % 8))
        rstIdx += 1
        true
      } else false
    }
    if (gray) {
      var dc = 0
      for (my <- 0 until (h + 7) / 8; mx <- 0 until (w + 7) / 8) {
        if (rstBoundary()) dc = 0
        dc = jEmitBlock(jFdctQuant(block(yOf, mx * 8, my * 8), qval),
          dc, bw, dcC, acC)
        mcuIdx += 1
      }
    } else if (!subsample420) {
      var (dy, dcb, dcr) = (0, 0, 0)
      for (my <- 0 until (h + 7) / 8; mx <- 0 until (w + 7) / 8) {
        if (rstBoundary()) { dy = 0; dcb = 0; dcr = 0 }
        dy = jEmitBlock(jFdctQuant(block(yOf, mx * 8, my * 8), qval),
          dy, bw, dcC, acC)
        dcb = jEmitBlock(jFdctQuant(block(cbOf, mx * 8, my * 8), qval),
          dcb, bw, dcC, acC)
        dcr = jEmitBlock(jFdctQuant(block(crOf, mx * 8, my * 8), qval),
          dcr, bw, dcC, acC)
        mcuIdx += 1
      }
    } else {
      var (dy, dcb, dcr) = (0, 0, 0)
      for (my <- 0 until (h + 15) / 16; mx <- 0 until (w + 15) / 16) {
        if (rstBoundary()) { dy = 0; dcb = 0; dcr = 0 }
        for (by <- 0 until 2; bx <- 0 until 2)
          dy = jEmitBlock(jFdctQuant(
            block(yOf, mx * 16 + bx * 8, my * 16 + by * 8), qval),
            dy, bw, dcC, acC)
        dcb = jEmitBlock(jFdctQuant(
          block(sub(cbOf), mx * 8, my * 8), qval), dcb, bw, dcC, acC)
        dcr = jEmitBlock(jFdctQuant(
          block(sub(crOf), mx * 8, my * 8), qval), dcr, bw, dcC, acC)
        mcuIdx += 1
      }
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  // Progressive AC table adds the EOBn symbols (0x10..0xE0) the
  // baseline flat table never needs: 176 codes, all 9 bits — valid
  // canonical (176 < 511, all-ones never produced).
  private val jAcBitsP = { val b = new Array[Int](17); b(9) = 176; b }
  private val jAcValsP = (Seq(0x00, 0xF0) ++ (1 to 14).map(_ << 4) ++
    (for { r <- 0 to 15; s <- 1 to 10 } yield (r << 4) | s)).toArray

  /** Progressive (SOF2) encode of the same RGB input — zero shared
    * code with the decoder; shares only the sampling/FDCT helpers
    * with the baseline spec encoder, so both encoders produce the
    * SAME quantized coefficients and a progressive decode must equal
    * the baseline decode bit for bit. Scan script mirrors what real
    * encoders emit:
    *  - useSA=true: DC first (Al=1, interleaved) → DC refinement
    *    (raw bit per block) → per component, per spectral band
    *    (1..5, 6..63): AC first at Al=1 (EOB-run coded) → AC
    *    refinement at Al=0 (G.1.2.3 correction bits, buffered across
    *    EOB runs);
    *  - useSA=false: spectral selection only (DC scan + one full-band
    *    AC scan per component, Ah=Al=0).
    */
  private def jpegProgressiveBytes(w: Int, h: Int, rgb: Array[Byte],
      qval: Int, subsample420: Boolean, gray: Boolean = false,
      useSA: Boolean = true): Array[Byte] = {
    def r(x: Int, y: Int) = rgb((y * w + x) * 3) & 0xFF
    def g(x: Int, y: Int) = rgb((y * w + x) * 3 + 1) & 0xFF
    def b(x: Int, y: Int) = rgb((y * w + x) * 3 + 2) & 0xFF
    def cl(v: Int, hi: Int) = math.max(0, math.min(v, hi - 1))
    def yOf(x0: Int, y0: Int): Double = {
      val (x, y) = (cl(x0, w), cl(y0, h))
      0.299 * r(x, y) + 0.587 * g(x, y) + 0.114 * b(x, y)
    }
    def cbOf(x0: Int, y0: Int): Double = {
      val (x, y) = (cl(x0, w), cl(y0, h))
      -0.168736 * r(x, y) - 0.331264 * g(x, y) + 0.5 * b(x, y) + 128
    }
    def crOf(x0: Int, y0: Int): Double = {
      val (x, y) = (cl(x0, w), cl(y0, h))
      0.5 * r(x, y) - 0.418688 * g(x, y) - 0.081312 * b(x, y) + 128
    }
    def sub(f: (Int, Int) => Double)(x: Int, y: Int): Double =
      (f(2 * x, 2 * y) + f(2 * x + 1, 2 * y) + f(2 * x, 2 * y + 1) +
        f(2 * x + 1, 2 * y + 1)) / 4.0
    def block(f: (Int, Int) => Double, x0: Int, y0: Int): Array[Double] =
      Array.tabulate(64)(i => f(x0 + i % 8, y0 + i / 8) - 128.0)

    val nc = if (gray) 1 else 3
    val hs = if (gray) Array(1) else if (subsample420) Array(2, 1, 1)
      else Array(1, 1, 1)
    val vs = hs // square sampling in both spec encoders
    val hmax = hs.max
    val vmax = vs.max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val samplers: Array[(Int, Int) => Double] =
      if (gray) Array(yOf)
      else if (subsample420) Array(yOf, sub(cbOf), sub(crOf))
      else Array(yOf, cbOf, crOf)
    // Quantized zigzag coefficient blocks over each component's
    // PADDED grid (interleaved DC scans cover the padding).
    val gw = Array.tabulate(nc)(ci => mcusX * hs(ci))
    val gh = Array.tabulate(nc)(ci => mcusY * vs(ci))
    val niW = Array.tabulate(nc)(ci =>
      ((w * hs(ci) + hmax - 1) / hmax + 7) / 8)
    val niH = Array.tabulate(nc)(ci =>
      ((h * vs(ci) + vmax - 1) / vmax + 7) / 8)
    val blocks = Array.tabulate(nc) { ci =>
      Array.tabulate(gh(ci) * gw(ci)) { bi =>
        jFdctQuant(block(samplers(ci),
          (bi % gw(ci)) * 8, (bi / gw(ci)) * 8), qval)
      }
    }

    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xFF); out.write(marker)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xFF)
      payload.foreach(p => out.write(p & 0xFF))
    }
    out.write(0xFF); out.write(0xD8) // SOI
    seg(0xDB, 0 +: Array.fill(64)(qval))
    seg(0xC2, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, nc) ++
      (0 until nc).flatMap(i => Seq(i + 1, (hs(i) << 4) | vs(i), 0)))
    seg(0xC4, 0x00 +: (jDcBits.drop(1) ++ jDcVals))
    seg(0xC4, 0x10 +: (jAcBitsP.drop(1) ++ jAcValsP))
    val dcC = jhuffCodes(jDcBits, jDcVals)
    val acC = jhuffCodes(jAcBitsP, jAcValsP)
    def cat(v: Int): Int =
      if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def bitsOf(v: Int, s: Int): Int = if (v >= 0) v else v + (1 << s) - 1

    def emitScan(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int)(
        body: JBitW => Unit): Unit = {
      seg(0xDA, (comps.size +: comps.flatMap(ci =>
        Seq(ci + 1, 0x00)) :+ ss :+ se :+ ((ah << 4) | al)).toArray)
      val bw = new JBitW(out)
      body(bw)
      bw.flush()
    }
    // MCU-interleaved DC traversal shared by both DC scans.
    def dcOrder(visit: (Int, Int) => Unit): Unit =
      for {
        my <- 0 until mcusY; mx <- 0 until mcusX
        ci <- 0 until nc
        by <- 0 until vs(ci); bx <- 0 until hs(ci)
      } visit(ci, (my * vs(ci) + by) * gw(ci) + mx * hs(ci) + bx)

    val dcAl = if (useSA) 1 else 0
    emitScan(0 until nc, 0, 0, 0, dcAl) { bw =>
      val pred = new Array[Int](nc)
      dcOrder { (ci, bi) =>
        val v = blocks(ci)(bi)(0) >> dcAl // DC point transform
        val diff = v - pred(ci)
        pred(ci) = v
        val s = cat(diff)
        val (code, l) = dcC(s)
        bw.put(code, l)
        if (s > 0) bw.put(bitsOf(diff, s), s)
      }
    }
    if (useSA) emitScan(0 until nc, 0, 0, 1, 0) { bw =>
      dcOrder { (ci, bi) => bw.put(blocks(ci)(bi)(0) & 1, 1) }
    }

    val bands = if (useSA) Seq((1, 5), (6, 63)) else Seq((1, 63))
    for (ci <- 0 until nc; (b0, b1) <- bands) {
      def niBlocks: Seq[Array[Int]] =
        for (by <- 0 until niH(ci); bx <- 0 until niW(ci))
          yield blocks(ci)(by * gw(ci) + bx)
      val acAl = if (useSA) 1 else 0
      // AC FIRST scan at acAl: EOB runs accumulated across blocks.
      emitScan(Seq(ci), b0, b1, 0, acAl) { bw =>
        var eob = 0
        def flushEob(): Unit = if (eob > 0) {
          val rr = 31 - Integer.numberOfLeadingZeros(eob)
          val (code, l) = acC(rr << 4)
          bw.put(code, l)
          if (rr > 0) bw.put(eob - (1 << rr), rr)
          eob = 0
        }
        for (zz <- niBlocks) {
          val t = Array.tabulate(64)(k =>
            if (zz(k) >= 0) zz(k) >> acAl else -((-zz(k)) >> acAl))
          val lastNz = (b0 to b1).reverse.find(t(_) != 0).getOrElse(b0 - 1)
          if (lastNz < b0) { eob += 1; if (eob == 0x7FFF) flushEob() }
          else {
            flushEob()
            var run = 0
            for (k <- b0 to lastNz) {
              if (t(k) == 0) run += 1
              else {
                while (run > 15) {
                  val (zc, zl) = acC(0xF0); bw.put(zc, zl); run -= 16
                }
                val s = cat(t(k))
                val (code, l) = acC((run << 4) | s)
                bw.put(code, l)
                bw.put(bitsOf(t(k), s), s)
                run = 0
              }
            }
            if (lastNz < b1) eob += 1
          }
        }
        flushEob()
      }
      // AC REFINEMENT scan (G.1.2.3): correction bits ride the EOB
      // run's buffered-bit stream, exactly as jcphuff-style encoders
      // emit them.
      if (useSA) emitScan(Seq(ci), b0, b1, 1, 0) { bw =>
        var eob = 0
        val be = scala.collection.mutable.ArrayBuffer[Int]()
        def flushEob(): Unit = if (eob > 0 || be.nonEmpty) {
          if (eob > 0) {
            val rr = 31 - Integer.numberOfLeadingZeros(eob)
            val (code, l) = acC(rr << 4)
            bw.put(code, l)
            if (rr > 0) bw.put(eob - (1 << rr), rr)
          }
          be.foreach(bw.put(_, 1))
          be.clear()
          eob = 0
        }
        for (zz <- niBlocks) {
          val av = Array.tabulate(64)(k => math.abs(zz(k)))
          var lastNew = b0 - 1 // EOB position: last NEWLY-significant
          for (k <- b0 to b1) if (av(k) == 1) lastNew = k
          var run = 0 // zero-HISTORY positions since the last symbol
          val br = scala.collection.mutable.ArrayBuffer[Int]()
          for (k <- b0 to b1) {
            if (av(k) == 0) run += 1
            else {
              // ZRLs at ANY nonzero coefficient (not only the newly-
              // significant ones): the buffered correction bits must
              // flush here, or the decoder's next pass reads a
              // correction bit where it expects a Huffman symbol.
              // Zeros past lastNew fold into the EOB run instead.
              while (run > 15 && k <= lastNew) {
                flushEob()
                val (zc, zl) = acC(0xF0); bw.put(zc, zl)
                run -= 16
                br.foreach(bw.put(_, 1)); br.clear()
              }
              if (av(k) > 1) br += (av(k) & 1) // history: correction bit
              else { // newly significant at this precision
                flushEob()
                val (code, l) = acC((run << 4) | 1)
                bw.put(code, l)
                bw.put(if (zz(k) < 0) 0 else 1, 1)
                br.foreach(bw.put(_, 1)); br.clear()
                run = 0
              }
            }
          }
          if (run > 0 || br.nonEmpty) {
            eob += 1
            be ++= br
            if (eob == 0x7FFF) flushEob()
          }
        }
        flushEob()
      }
    }
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Smooth deterministic RGB test image (low AC energy keeps every
    * quantized coefficient inside baseline categories at qval=1). */
  private def jTestRgb(w: Int, h: Int): Array[Byte] =
    Array.tabulate[Byte](w * h * 3) { i =>
      val p = i / 3
      val (x, y) = (p % w, p / w)
      (i % 3 match {
        case 0 => 40 + 3 * x + 2 * y
        case 1 => 90 + 2 * x
        case _ => 160 + y
      }).toByte
    }

  private def maxDiff(a: Array[Byte], b: Array[Byte]): Int =
    a.zip(b).map { case (x, y) => math.abs((x & 0xFF) - (y & 0xFF)) }.max

  test("JPEG decode: 4:4:4 qval=1 color round-trips within tolerance") {
    val (w, h) = (24, 17) // partial MCUs on both axes
    val rgb = jTestRgb(w, h)
    val img = Multimodal.decodeJpeg(
      jpegBytes(w, h, rgb, qval = 1, subsample420 = false)).get
    assert(img.width === w && img.height === h && img.channels === 3)
    // qval=1 is near-lossless: error = FDCT rounding + IDCT rounding +
    // two colorspace conversions.
    assert(maxDiff(img.pixels, rgb) <= 4,
      s"max per-channel error ${maxDiff(img.pixels, rgb)}")
  }

  test("JPEG decode: 4:2:0 with constant chroma round-trips; solid survives q=16") {
    // Gray-as-RGB: chroma planes are constant 128, so 2x2 averaging is
    // exact and the 4:2:0 path's geometry (4 Y blocks + upsample) is
    // isolated from chroma interpolation error.
    val (w, h) = (20, 14)
    val rgb = Array.tabulate[Byte](w * h * 3) { i =>
      val p = i / 3; (30 + 4 * (p % w) + 5 * (p / w)).toByte
    }
    val img = Multimodal.decodeJpeg(
      jpegBytes(w, h, rgb, qval = 1, subsample420 = true)).get
    assert(img.width === w && img.height === h && img.channels === 3)
    assert(maxDiff(img.pixels, rgb) <= 4,
      s"max per-channel error ${maxDiff(img.pixels, rgb)}")
    // A solid color is DC-only: it must survive coarse quantization
    // (q=16) almost exactly — DC rounds to the nearest 16 media units
    // of the SHIFTED value, so allow one quantization step.
    val solid = Array.tabulate[Byte](8 * 8 * 3)(i =>
      (Seq(200, 60, 120)(i % 3)).toByte)
    val s = Multimodal.decodeJpeg(
      jpegBytes(8, 8, solid, qval = 16, subsample420 = false)).get
    assert(maxDiff(s.pixels, solid) <= 12,
      s"solid color error ${maxDiff(s.pixels, solid)}")
  }

  test("JPEG decode: single-component grayscale") {
    val (w, h) = (16, 9)
    val rgb = jTestRgb(w, h)
    val img = Multimodal.decodeJpeg(
      jpegBytes(w, h, rgb, qval = 1, subsample420 = false, gray = true)).get
    assert(img.width === w && img.height === h && img.channels === 1)
    // Compare against the encoder's own luma formula.
    val want = Array.tabulate[Byte](w * h) { p =>
      val (x, y) = (p % w, p / w)
      val (r, g, b) = (rgb(p * 3) & 0xFF, rgb(p * 3 + 1) & 0xFF,
        rgb(p * 3 + 2) & 0xFF)
      math.rint(0.299 * r + 0.587 * g + 0.114 * b).toInt.toByte
    }
    assert(maxDiff(img.pixels, want) <= 4)
  }

  test("JPEG decode: rejects mislabeled/truncated input; pipeline flows") {
    val (w, h) = (16, 16)
    val rgb = jTestRgb(w, h)
    val bytes = jpegBytes(w, h, rgb, qval = 1, subsample420 = false)
    // Flip SOF0 -> SOF2: the stream now claims progressive but holds a
    // baseline interleaved full-band scan (Ss=0, Se=63), which is
    // invalid in progressive mode — the SOF2 path must refuse it
    // cleanly (None), not loop or misdecode. (Genuine progressive
    // streams decode — see the progressive JPEG tests.)
    val prog = bytes.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(Multimodal.decodeJpeg(prog).isEmpty)
    // Truncate mid-entropy-data: None, never a hang or a throw.
    assert(Multimodal.decodeJpeg(bytes.take(bytes.length / 2)).isEmpty)
    assert(Multimodal.decodeJpeg(Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte)).isEmpty)
    // decodeMeta reports real SOF dims (cheap path, no entropy decode);
    // embed histograms the DECODED pixels; jpegAsBmp -> resize composes.
    val dir = Files.createTempDirectory("graft_media_jpeg")
    dir.toFile.deleteOnExit()
    Files.write(dir.resolve("img.jpeg"), bytes)
    val files = Multimodal.media(spark, dir + "/*")
    val meta = Multimodal.decodeMeta(files).collect().head
    assert(meta.format === "jpeg" && meta.width === w && meta.height === h)
    assert(meta.channels === 3 && meta.duration_ms === 0L)
    val decoded = Multimodal.decodeJpeg(bytes).get.pixels
    val expected = new Array[Double](8)
    decoded.foreach(p => expected((p & 0xFF) >> 5) += 1.0 / decoded.length)
    val emb = Multimodal.embed(files).collect().head.embedding
    assert(emb.zip(expected).forall { case (a, e) => math.abs(a - e) < 1e-9 },
      s"histogram mismatch: ${emb.toSeq} vs ${expected.toSeq}")
    val resized = Multimodal
      .resizeBmp(Multimodal.jpegAsBmp(files), outW = 4, outH = 4).collect()
    assert(resized.length === 1 && resized.head.width === 4)
    import spark.implicits._
    val rMeta = Multimodal.decodeMeta(
      Seq(Multimodal.MediaFile("r.bmp", resized.head.bmp.length,
        resized.head.bmp)).toDS()).collect().head
    assert(rMeta.format === "bmp" && rMeta.width === 4 && rMeta.height === 4)
  }

  test("progressive JPEG: SA scan script decodes bit-identical to baseline") {
    // Both spec encoders derive the SAME quantized coefficients, so a
    // progressive decode must reproduce the baseline decode EXACTLY —
    // any coefficient lost or misplaced across the 10-scan script
    // (DC first/refine + 2 bands × first/refine × 3 components) shows
    // up as a pixel diff.
    val (w, h) = (24, 17) // partial MCUs on both axes
    val rgb = jTestRgb(w, h)
    val base = Multimodal.decodeJpeg(
      jpegBytes(w, h, rgb, qval = 1, subsample420 = false)).get
    val prog = Multimodal.decodeJpeg(
      jpegProgressiveBytes(w, h, rgb, qval = 1, subsample420 = false)).get
    assert(prog.width === w && prog.height === h && prog.channels === 3)
    assert(prog.pixels.sameElements(base.pixels),
      "progressive decode != baseline decode")
    // And the decode is actually faithful to the source image.
    assert(maxDiff(prog.pixels, rgb) <= 4)
  }

  test("progressive JPEG: spectral-selection-only, grayscale, and 4:2:0") {
    val (w, h) = (21, 13)
    val rgb = jTestRgb(w, h)
    // Spectral selection only (Ah=Al=0 everywhere): EOB-run coding
    // without any refinement machinery.
    val spectral = Multimodal.decodeJpeg(jpegProgressiveBytes(
      w, h, rgb, qval = 1, subsample420 = false, useSA = false)).get
    val base = Multimodal.decodeJpeg(
      jpegBytes(w, h, rgb, qval = 1, subsample420 = false)).get
    assert(spectral.pixels.sameElements(base.pixels))
    // Grayscale progressive (single component, non-interleaved DC).
    val gBase = Multimodal.decodeJpeg(
      jpegBytes(w, h, rgb, qval = 1, subsample420 = false, gray = true)).get
    val gProg = Multimodal.decodeJpeg(jpegProgressiveBytes(
      w, h, rgb, qval = 1, subsample420 = false, gray = true)).get
    assert(gProg.channels === 1 && gProg.pixels.sameElements(gBase.pixels))
    // 4:2:0: the non-interleaved AC grids (ceil of component size)
    // genuinely differ from the padded MCU grids here — 3 of the luma
    // block columns are AC-coded, the 4th (dummy) is DC-only.
    val sBase = Multimodal.decodeJpeg(
      jpegBytes(20, 14, jTestRgb(20, 14), qval = 1, subsample420 = true)).get
    val sProg = Multimodal.decodeJpeg(jpegProgressiveBytes(
      20, 14, jTestRgb(20, 14), qval = 1, subsample420 = true)).get
    assert(sProg.pixels.sameElements(sBase.pixels))
    // Coarser quantization exercises wider coefficient categories.
    val qBase = Multimodal.decodeJpeg(
      jpegBytes(w, h, rgb, qval = 4, subsample420 = false)).get
    val qProg = Multimodal.decodeJpeg(jpegProgressiveBytes(
      w, h, rgb, qval = 4, subsample420 = false)).get
    assert(qProg.pixels.sameElements(qBase.pixels))
    // Solid color at q=16: every AC band collapses to one EOB run
    // spanning all blocks of the component (the multi-block eobrun
    // decode path with rr > 0 and extra bits).
    val solid = Array.tabulate[Byte](24 * 16 * 3)(i =>
      (Seq(200, 60, 120)(i % 3)).toByte)
    val fBase = Multimodal.decodeJpeg(
      jpegBytes(24, 16, solid, qval = 16, subsample420 = false)).get
    val fProg = Multimodal.decodeJpeg(jpegProgressiveBytes(
      24, 16, solid, qval = 16, subsample420 = false)).get
    assert(fProg.pixels.sameElements(fBase.pixels))
  }

  test("progressive JPEG: pipeline flow and narrowed rejection") {
    val (w, h) = (16, 16)
    val rgb = jTestRgb(w, h)
    val bytes = jpegProgressiveBytes(w, h, rgb, qval = 1,
      subsample420 = false)
    // Progressive files now flow through meta → embed → resize like
    // any media file (they fell into the metadata-only path before).
    val dir = Files.createTempDirectory("graft_media_prog")
    dir.toFile.deleteOnExit()
    Files.write(dir.resolve("img.jpeg"), bytes)
    val files = Multimodal.media(spark, dir + "/*")
    val meta = Multimodal.decodeMeta(files).collect().head
    assert(meta.format === "jpeg" && meta.width === w && meta.height === h)
    val decoded = Multimodal.decodeJpeg(bytes).get.pixels
    val expected = new Array[Double](8)
    decoded.foreach(p => expected((p & 0xFF) >> 5) += 1.0 / decoded.length)
    val emb = Multimodal.embed(files).collect().head.embedding
    assert(emb.zip(expected).forall { case (a, e) => math.abs(a - e) < 1e-9 })
    val resized = Multimodal
      .resizeBmp(Multimodal.jpegAsBmp(files), outW = 4, outH = 4).collect()
    assert(resized.length === 1 && resized.head.width === 4)
    // Rejection narrows to what is genuinely undecodable: truncation
    // mid-scan and arithmetic/lossless SOFs still drop to None.
    assert(Multimodal.decodeJpeg(bytes.take(bytes.length / 3)).isEmpty)
    val arith = bytes.clone()
    val sofAt = arith.indices.find(i =>
      (arith(i) & 0xFF) == 0xFF && (arith(i + 1) & 0xFF) == 0xC2).get
    arith(sofAt + 1) = 0xCA.toByte // SOF10: arithmetic progressive
    assert(Multimodal.decodeJpeg(arith).isEmpty)
  }

  /** 4-component Adobe JPEG (CMYK / YCCK) spec-side encoder: the
    * baseline machinery (flat tables, FDCT, 1x1 sampling) with four
    * planes and the APP14 marker carrying the transform byte. Input
    * `cmyk` uses the STORED convention (Adobe-inverted: 255 = no
    * ink); transform 2 (YCCK) routes the first three planes through
    * the YCbCr forward transform, transform 0 stores them as-is. */
  private def jpegCmykBytes(w: Int, h: Int, cmyk: Array[Byte], qval: Int,
      transform: Int): Array[Byte] = {
    def ch(i: Int)(x0: Int, y0: Int): Double = {
      val x = math.max(0, math.min(x0, w - 1))
      val y = math.max(0, math.min(y0, h - 1))
      (cmyk((y * w + x) * 4 + i) & 0xFF).toDouble
    }
    def yOf(x: Int, y: Int) =
      0.299 * ch(0)(x, y) + 0.587 * ch(1)(x, y) + 0.114 * ch(2)(x, y)
    def cbOf(x: Int, y: Int) =
      -0.168736 * ch(0)(x, y) - 0.331264 * ch(1)(x, y) + 0.5 * ch(2)(x, y) + 128
    def crOf(x: Int, y: Int) =
      0.5 * ch(0)(x, y) - 0.418688 * ch(1)(x, y) - 0.081312 * ch(2)(x, y) + 128
    val samplers: Array[(Int, Int) => Double] =
      if (transform == 2) Array(yOf, cbOf, crOf, ch(3))
      else Array(ch(0), ch(1), ch(2), ch(3))
    def block(f: (Int, Int) => Double, x0: Int, y0: Int): Array[Double] =
      Array.tabulate(64)(i => f(x0 + i % 8, y0 + i / 8) - 128.0)
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xFF); out.write(marker)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xFF)
      payload.foreach(p => out.write(p & 0xFF))
    }
    out.write(0xFF); out.write(0xD8)
    seg(0xEE, "Adobe".getBytes("US-ASCII").map(_.toInt) ++
      Array(0, 100, 0, 0, 0, 0, transform)) // APP14
    seg(0xDB, 0 +: Array.fill(64)(qval))
    seg(0xC0, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 4) ++
      (0 until 4).flatMap(i => Seq(i + 1, 0x11, 0)))
    seg(0xC4, 0x00 +: (jDcBits.drop(1) ++ jDcVals))
    seg(0xC4, 0x10 +: (jAcBits.drop(1) ++ jAcVals))
    seg(0xDA, 4 +: ((0 until 4).flatMap(i => Seq(i + 1, 0x00)) ++
      Seq(0, 63, 0)).toArray)
    val dcC = jhuffCodes(jDcBits, jDcVals)
    val acC = jhuffCodes(jAcBits, jAcVals)
    val bw = new JBitW(out)
    val dc = new Array[Int](4)
    for (my <- 0 until (h + 7) / 8; mx <- 0 until (w + 7) / 8; ci <- 0 until 4)
      dc(ci) = jEmitBlock(jFdctQuant(block(samplers(ci), mx * 8, my * 8),
        qval), dc(ci), bw, dcC, acC)
    bw.flush()
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }

  test("JPEG decode: Adobe CMYK and YCCK 4-component") {
    val (w, h) = (19, 13) // partial MCUs both axes
    val rnd = new scala.util.Random(61)
    // Stored-convention CMYK (inverted). Smooth-ish fields keep the
    // qval=1 round-trip error in the same band as the RGB tests.
    val cmyk = new Array[Byte](w * h * 4)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 4
      cmyk(o) = (120 + 6 * x).toByte
      cmyk(o + 1) = (230 - 5 * y).toByte
      cmyk(o + 2) = (60 + 4 * x + 3 * y).toByte
      cmyk(o + 3) = (250 - 2 * x).toByte
    }
    // Expected RGB via the documented math on the ORIGINAL samples.
    def expected(o: Int): (Int, Int, Int) = {
      val k = cmyk(o + 3) & 0xFF
      def m(v: Int) = (v * k + 127) / 255
      (m(cmyk(o) & 0xFF), m(cmyk(o + 1) & 0xFF), m(cmyk(o + 2) & 0xFF))
    }
    for (transform <- Seq(0, 2)) {
      val img = Multimodal.decodeJpeg(
        jpegCmykBytes(w, h, cmyk, qval = 1, transform)).get
      assert(img.width === w && img.height === h && img.channels === 3,
        s"transform $transform")
      var worst = 0
      for (y <- 0 until h; x <- 0 until w) {
        val (er, eg, eb) = expected((y * w + x) * 4)
        val o = (y * w + x) * 3
        worst = math.max(worst, math.abs((img.pixels(o) & 0xFF) - er))
        worst = math.max(worst, math.abs((img.pixels(o + 1) & 0xFF) - eg))
        worst = math.max(worst, math.abs((img.pixels(o + 2) & 0xFF) - eb))
      }
      // quantization + (for YCCK) two colorspace trips; the K scaling
      // divides absolute error, so the band matches the RGB tests.
      assert(worst <= 5, s"transform $transform: max error $worst")
    }
    // Pipeline: meta + embed see the 4-component file.
    import spark.implicits._
    val bytes = jpegCmykBytes(w, h, cmyk, qval = 1, 2)
    val meta = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("c.jpg", bytes.length, bytes)).toDS()).collect().head
    assert(meta.format === "jpeg" && meta.width === w && meta.height === h)
    val emb = Multimodal.embed(Seq(
      Multimodal.MediaFile("c.jpg", bytes.length, bytes)).toDS()).collect().head
    assert(math.abs(emb.embedding.sum - 1.0) < 1e-9)
  }

  test("PNG: zlib-reference files decode bit-exact (independent deflate)") {
    // Fixture provenance (src/test/resources/png_ref/): IDAT streams
    // produced by a REAL zlib (python) at levels 1/6/9 — dynamic-
    // huffman deflate from an independent implementation, the input
    // class a self-consistent spec-encoder round-trip can never cover
    // (the VP8L code-length-order lesson applied to the inflate path).
    def res(p: String) = {
      val in = getClass.getResourceAsStream(p)
      try in.readAllBytes() finally in.close()
    }
    for (n <- Seq("grad_l1", "grad_l6", "grad_l9", "noise_l1", "noise_l6",
        "noise_l9", "text_l1", "text_l6", "text_l9")) {
      val png = res(s"/png_ref/$n.png")
      val gold = res(s"/png_ref/$n.rgb")
      val w = (gold(0) & 0xFF) | ((gold(1) & 0xFF) << 8)
      val h = (gold(2) & 0xFF) | ((gold(3) & 0xFF) << 8)
      val img = Multimodal.decodePng(png).getOrElse(fail(s"$n refused"))
      assert((img.width, img.height) === ((w, h)), n)
      var i = 0
      while (i < w * h * 3) {
        assert(img.pixels(i) === gold(4 + i), s"$n byte $i")
        i += 1
      }
    }
  }

  test("JPEG decode: restart intervals with and without fill bytes") {
    val (w, h) = (24, 17) // 3x3 MCUs at 4:4:4 → two restart boundaries
    val rgb = jTestRgb(w, h)
    val plain = Multimodal.decodeJpeg(
      jpegBytes(w, h, rgb, qval = 1, subsample420 = false)).get
    for (fill <- Seq(false, true)) {
      val img = Multimodal.decodeJpeg(jpegBytes(w, h, rgb, qval = 1,
        subsample420 = false, restartMcus = 4, fillBytes = fill)).get
      assert(img.width === w && img.height === h)
      // Restart markers change the byte stream but not the pixels:
      // identical to the single-interval decode, bit for bit.
      assert(img.pixels.sameElements(plain.pixels),
        s"restart decode diverged (fillBytes=$fill)")
    }
    // 4:2:0 restart path too (MCU = 16x16, different block cadence).
    val sub = Multimodal.decodeJpeg(jpegBytes(w, h, rgb, qval = 1,
      subsample420 = true, restartMcus = 1, fillBytes = true)).get
    val subPlain = Multimodal.decodeJpeg(
      jpegBytes(w, h, rgb, qval = 1, subsample420 = true)).get
    assert(sub.pixels.sameElements(subPlain.pixels))
  }

  test("JPEG: fill bytes before headers tolerated; truncated SOF meta is safe") {
    val (w, h) = (16, 9)
    val bytes = jpegBytes(w, h, jTestRgb(w, h), qval = 1,
      subsample420 = false)
    // Splice a 0xFF fill byte right after SOI, before the first marker
    // segment — the pre-SOS walk must skip it, not parse FF FF as a
    // marker with a bogus length.
    val padded = bytes.take(2) ++ Array(0xFF.toByte) ++ bytes.drop(2)
    val img = Multimodal.decodeJpeg(padded).get
    assert(img.pixels.sameElements(Multimodal.decodeJpeg(bytes).get.pixels))
    // Truncated SOF segment at EOF: the metadata walk must fall back
    // to 0-dims, not throw from inside mapPartitions (the decode path
    // already catches; the meta path is the one the advisor flagged).
    val truncated = Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x02)
      .map(_.toByte)
    import spark.implicits._
    val meta = Multimodal.decodeMeta(
      Seq(Multimodal.MediaFile("t.jpeg", truncated.length, truncated))
        .toDS()).collect().head
    assert(meta.format === "jpeg" && meta.width === 0 && meta.height === 0)
  }

  // ---- AVI (RIFF video container): spec-side encoder + decode pins ----
  // Encoder written here independently from the public RIFF/AVI layout
  // (no shared code with the decoder): chunks are fourcc + LE32 size +
  // payload + even-pad; LISTs carry a 4-byte type before subchunks.

  private def aviChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer
      .allocate(8 + body.length + (body.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
    b.array()
  }

  private def aviList(typ: String, parts: Seq[Array[Byte]]): Array[Byte] =
    aviChunk("LIST", typ.getBytes("US-ASCII") ++ parts.flatten)

  /** A complete AVI: one video stream, `movi` = (chunkId, payload). */
  private def aviBytes(w: Int, h: Int, usPerFrame: Int, totalFrames: Int,
      movi: Seq[(String, Array[Byte])]): Array[Byte] = {
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(totalFrames).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h) // 16 reserved bytes stay zero
    val strh = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
    strh.position(20); strh.putInt(1) // dwScale
    strh.putInt(1000000 / math.max(usPerFrame, 1)) // dwRate
    strh.position(32); strh.putInt(totalFrames) // dwLength
    val strf = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    val hdrl = aviList("hdrl", Seq(aviChunk("avih", avih.array()),
      aviList("strl", Seq(aviChunk("strh", strh.array()),
        aviChunk("strf", strf.array())))))
    val moviL = aviList("movi",
      movi.map { case (id, body) => aviChunk(id, body) })
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ moviL
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  /** Top-down interleaved RGB -> raw bottom-up BGR DIB ('00db'). */
  private def dibPayload(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](stride * h)
    for (y <- 0 until h; x <- 0 until w) {
      val src = (y * w + x) * 3
      val dst = (h - 1 - y) * stride + x * 3
      out(dst) = rgb(src + 2); out(dst + 1) = rgb(src + 1)
      out(dst + 2) = rgb(src)
    }
    out
  }

  test("AVI decode: uncompressed DIB frames round-trip pixel-exact; meta from avih") {
    val (w, h) = (3, 2)
    val f0 = Array.tabulate(w * h * 3)(i => (i * 11 + 5).toByte)
    val f1 = Array.tabulate(w * h * 3)(i => (255 - i * 7).toByte)
    val avi = aviBytes(w, h, usPerFrame = 40000, totalFrames = 2,
      Seq("00db" -> dibPayload(w, h, f0), "00db" -> dibPayload(w, h, f1)))
    val vid = Multimodal.decodeAvi(avi).get
    assert(vid.width === w && vid.height === h &&
      vid.usPerFrame === 40000L && vid.frames.length === 2)
    assert(vid.frames(0).sameElements(f0) && vid.frames(1).sameElements(f1))
    import spark.implicits._
    val meta = Multimodal.decodeMeta(
      Seq(Multimodal.MediaFile("clip.avi", avi.length, avi)).toDS())
      .collect().head
    assert(meta.format === "avi" && meta.width === w && meta.height === h)
    assert(meta.duration_ms === 80L && meta.channels === 3)
  }

  test("AVI decode: MJPEG '00dc' frames decode via the in-repo JPEG path") {
    val (w, h) = (8, 8)
    val rgb = Array.fill(w * h * 3)(0.toByte)
    for (i <- 0 until w * h) {
      rgb(i * 3) = 200.toByte; rgb(i * 3 + 1) = 80.toByte
      rgb(i * 3 + 2) = 40.toByte
    }
    val jpg = jpegBytes(w, h, rgb, qval = 1, subsample420 = false)
    val avi = aviBytes(w, h, usPerFrame = 33333, totalFrames = 2,
      Seq("00dc" -> jpg, "00dc" -> jpg))
    val vid = Multimodal.decodeAvi(avi).get
    val direct = Multimodal.decodeJpeg(jpg).get
    assert(vid.frames.length === 2 && direct.channels === 3)
    assert(vid.frames(0).sameElements(direct.pixels),
      "AVI MJPEG frame must be byte-identical to the direct JPEG decode")
    // Grayscale MJPEG expands to the shared 3-channel frame layout.
    val gjpg = jpegBytes(w, h, rgb, qval = 1, subsample420 = false,
      gray = true)
    val gvid = Multimodal.decodeAvi(aviBytes(w, h, 33333, 1,
      Seq("00dc" -> gjpg))).get
    val gdirect = Multimodal.decodeJpeg(gjpg).get
    assert(gdirect.channels === 1)
    assert(gvid.frames(0).length === w * h * 3)
    assert((0 until w * h).forall { i =>
      gvid.frames(0)(i * 3) === gdirect.pixels(i) &&
        gvid.frames(0)(i * 3 + 1) === gdirect.pixels(i) &&
        gvid.frames(0)(i * 3 + 2) === gdirect.pixels(i)
    })
  }

  test("AVI frame fan-out: re-decodable BMPs, everyMs timeline sampling, embed") {
    import spark.implicits._
    val (w, h) = (4, 3)
    val frames = (0 until 4).map(k =>
      Array.tabulate(w * h * 3)(i => (k * 50 + i).toByte))
    val avi = aviBytes(w, h, usPerFrame = 40000, totalFrames = 4,
      frames.map(f => "00db" -> dibPayload(w, h, f)))
    val ds = Seq(Multimodal.MediaFile("clip.avi", avi.length, avi)).toDS()
    // everyMs=0: all four frames, each a spec-valid BMP with exact pixels.
    val all = Multimodal.aviFramesAsBmp(ds).collect().sortBy(_.path)
    assert(all.map(_.path).toSeq ===
      (0 until 4).map(i => s"clip.avi#frame$i"))
    val metas = Multimodal.decodeMeta(
      Multimodal.aviFramesAsBmp(ds)).collect()
    assert(metas.forall(m => m.format == "bmp" && m.width == w &&
      m.height == h))
    // Pixel spot-check frame 2 through the emitted BMP (bottom-up BGR).
    val bmp2 = all(2).content
    val stride = ((w * 3 + 3) / 4) * 4
    val px = (x: Int, y: Int, c: Int) =>
      bmp2(54 + (h - 1 - y) * stride + x * 3 + c) & 0xFF
    assert(px(1, 1, 2) === (frames(2)((1 * w + 1) * 3) & 0xFF)) // R
    assert(px(1, 1, 0) === (frames(2)((1 * w + 1) * 3 + 2) & 0xFF)) // B
    // 40 ms frame clock, sample every 80 ms -> frames 0 and 2.
    val sampled = Multimodal.aviFramesAsBmp(ds, everyMs = 80L)
      .collect().map(_.path).sorted
    assert(sampled.toSeq === Seq("clip.avi#frame0", "clip.avi#frame2"))
    // embed histograms the DECODED first frame's pixels.
    val emb = Multimodal.embed(ds).collect().head.embedding
    val expected = new Array[Double](8)
    frames(0).foreach(b => expected((b & 0xFF) >> 5) += 1.0)
    (0 until 8).foreach(i => expected(i) /= frames(0).length)
    assert(emb.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  // ---- MP4 / ISO BMFF: spec-side box writer + header-only meta pins ----

  private def mp4Box(typ: String, body: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + body.length)
    b.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
    b.array()
  }

  test("MP4 meta: real mvhd/tkhd walk (v0 and v1), honest no-decode fallback") {
    import spark.implicits._
    // v0: timescale 600, duration 1500 ticks = 2500 ms; track 640x360.
    val mvhd0 = java.nio.ByteBuffer.allocate(100)
    mvhd0.putInt(0).putInt(0).putInt(0).putInt(600).putInt(1500)
    val tkhd0 = java.nio.ByteBuffer.allocate(84)
    tkhd0.position(76)
    tkhd0.putInt(640 << 16).putInt(360 << 16)
    val mp4v0 = mp4Box("ftyp", "isom0000".getBytes) ++
      mp4Box("moov", mp4Box("mvhd", mvhd0.array()) ++
        mp4Box("trak", mp4Box("tkhd", tkhd0.array())))
    val meta0 = Multimodal.decodeMeta(
      Seq(Multimodal.MediaFile("v.mp4", mp4v0.length, mp4v0)).toDS())
      .collect().head
    assert(meta0.format === "mp4" && meta0.duration_ms === 2500L)
    assert(meta0.width === 640 && meta0.height === 360 &&
      meta0.channels === 3)
    // v1 layouts: 64-bit duration, wider tkhd prefix.
    val mvhd1 = java.nio.ByteBuffer.allocate(112)
    mvhd1.put(1.toByte); mvhd1.position(20)
    mvhd1.putInt(1000).putLong(90000L) // 90 s
    val tkhd1 = java.nio.ByteBuffer.allocate(96)
    tkhd1.put(1.toByte); tkhd1.position(88)
    tkhd1.putInt(1920 << 16).putInt(1080 << 16)
    val mp4v1 = mp4Box("ftyp", "isom0000".getBytes) ++
      mp4Box("moov", mp4Box("mvhd", mvhd1.array()) ++
        mp4Box("trak", mp4Box("tkhd", tkhd1.array())))
    val meta1 = Multimodal.decodeMeta(
      Seq(Multimodal.MediaFile("w.mp4", mp4v1.length, mp4v1)).toDS())
      .collect().head
    assert(meta1.duration_ms === 90000L)
    assert(meta1.width === 1920 && meta1.height === 1080)
    // Truncated moov: walk stops, zeros remain — no crash.
    val trunc = mp4v0.take(mp4v0.length - 20)
    val metaT = Multimodal.decodeMeta(
      Seq(Multimodal.MediaFile("t.mp4", trunc.length, trunc)).toDS())
      .collect().head
    assert(metaT.format === "mp4")
    // embed still takes the documented fallback (no H.264 decode).
    val emb = Multimodal.embed(
      Seq(Multimodal.MediaFile("v.mp4", mp4v0.length, mp4v0)).toDS())
      .collect().head.embedding
    assert(emb.length === 8) // deterministic fake, not a histogram claim
  }

  test("AVI rejection: truncation, frame-dim mismatch, short DIB, bombs") {
    val (w, h) = (3, 2)
    val f0 = Array.tabulate(w * h * 3)(i => i.toByte)
    val good = aviBytes(w, h, 40000, 1, Seq("00db" -> dibPayload(w, h, f0)))
    assert(Multimodal.decodeAvi(good).isDefined)
    // Truncated mid-payload: structure lost, whole file drops.
    assert(Multimodal.decodeAvi(good.take(good.length - 5)).isEmpty)
    // MJPEG frame whose dims disagree with the canvas: drop.
    val jpg = jpegBytes(8, 8, Array.fill(8 * 8 * 3)(99.toByte),
      qval = 1, subsample420 = false)
    assert(Multimodal.decodeAvi(
      aviBytes(w, h, 40000, 1, Seq("00dc" -> jpg))).isEmpty)
    // DIB payload shorter than stride*h: drop.
    assert(Multimodal.decodeAvi(aviBytes(w, h, 40000, 1,
      Seq("00db" -> dibPayload(w, h, f0).take(8)))).isEmpty)
    // Declared canvas over the pixel bomb guard: refused before alloc.
    assert(Multimodal.decodeAvi(aviBytes(8192, 8192, 40000, 1,
      Seq("00db" -> Array[Byte](1)))).isEmpty)
    // Not an AVI at all.
    assert(Multimodal.decodeAvi("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  // ---- FLAC / MP3: spec-side header writers + header-only meta pins ----

  /** Independent STREAMINFO writer straight from the FLAC spec's bit
    * layout (no shared code with the parser). */
  private def flacBytes(rate: Int, channels: Int, totalSamples: Long,
      extraBlock: Boolean = false): Array[Byte] = {
    val si = new Array[Byte](34)
    // bytes 0-9: block/frame sizes — irrelevant to meta, leave zero
    si(10) = ((rate >> 12) & 0xFF).toByte
    si(11) = ((rate >> 4) & 0xFF).toByte
    si(12) = (((rate & 0xF) << 4) | (((channels - 1) & 0x7) << 1) |
      ((16 - 1) >> 4)).toByte // bits-per-sample-1 high bit
    si(13) = ((((16 - 1) & 0xF) << 4) | ((totalSamples >> 32) & 0xF)).toInt.toByte
    si(14) = ((totalSamples >> 24) & 0xFF).toByte
    si(15) = ((totalSamples >> 16) & 0xFF).toByte
    si(16) = ((totalSamples >> 8) & 0xFF).toByte
    si(17) = (totalSamples & 0xFF).toByte
    val pad = Array[Byte](0x81.toByte, 0, 0, 4, 0, 0, 0, 0) // last PADDING
    val siHdr = Array[Byte](if (extraBlock) 0 else 0x80.toByte, 0, 0, 34)
    "fLaC".getBytes("US-ASCII") ++ siHdr ++ si ++
      (if (extraBlock) pad else Array.emptyByteArray)
  }

  test("FLAC meta: STREAMINFO rate/channels/duration, block-walk past non-last") {
    import spark.implicits._
    // 44.1 kHz stereo, 441 000 samples = exactly 10 s.
    val f = flacBytes(44100, 2, 441000L, extraBlock = true)
    val m = Multimodal.decodeMeta(
      Seq(Multimodal.MediaFile("a.flac", f.length, f)).toDS()).collect().head
    assert(m.format === "flac" && m.channels === 2 && m.duration_ms === 10000L)
    // 36-bit total-samples path: 8 kHz mono, 2^33 samples.
    val big = flacBytes(8000, 1, 1L << 33)
    val mb = Multimodal.decodeMeta(
      Seq(Multimodal.MediaFile("b.flac", big.length, big)).toDS()).collect().head
    assert(mb.channels === 1 && mb.duration_ms === (1L << 33) * 1000L / 8000L)
    // Truncated below the 42-byte sniff minimum: never reaches the
    // parser — extension-named stub fallback, no crash.
    val mt = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("t.flac", 6, f.take(6))).toDS()).collect().head
    assert(mt.format === "flac")
    // No STREAMINFO block at all (type field corrupted): walk completes
    // over the remaining blocks, zeros stay — no crash, no fake values.
    val bad = f.clone(); bad(4) = 0x03.toByte // STREAMINFO -> SEEKTABLE
    val mz = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("z.flac", bad.length, bad)).toDS()).collect().head
    assert(mz.duration_ms === 0L && mz.channels === 0)
  }

  test("EXIF orientation: APP1 parse (both byte orders), upright transforms") {
    import spark.implicits._
    def app1(orient: Int, le: Boolean): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(36)
      b.put(0xFF.toByte).put(0xE1.toByte).putShort(34)
      b.put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
      val t = java.nio.ByteBuffer.allocate(26).order(
        if (le) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN)
      t.put((if (le) "II" else "MM").getBytes).putShort(42)
        .putInt(8).putShort(1)
        .putShort(0x0112.toShort).putShort(3).putInt(1)
        .putShort(orient.toShort).putShort(0).putInt(0)
      b.put(t.array())
      b.array()
    }
    val jpg = jpegBytes(16, 8, Array.fill(16 * 8 * 3)(100.toByte),
      qval = 1, subsample420 = false)
    def withApp1(o: Int, le: Boolean) =
      jpg.take(2) ++ app1(o, le) ++ jpg.drop(2)
    assert(Multimodal.jpegOrientation(jpg) === 1)
    assert(Multimodal.jpegOrientation(withApp1(6, le = true)) === 6)
    assert(Multimodal.jpegOrientation(withApp1(8, le = false)) === 8)
    assert(Multimodal.jpegOrientation(withApp1(99, le = true)) === 1)
    // Hostile IFD offsets: the unsigned-32 offset field set past the
    // buffer and to >= 2^31 (which would wrap negative under a bare
    // .toInt) must both return upright, not throw — the module's
    // drop-don't-crash contract against crafted/corrupt EXIF.
    def app1Off(off: Long, le: Boolean): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(36)
      b.put(0xFF.toByte).put(0xE1.toByte).putShort(34)
      b.put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
      val t = java.nio.ByteBuffer.allocate(26).order(
        if (le) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN)
      t.put((if (le) "II" else "MM").getBytes).putShort(42)
        .putInt(off.toInt).putShort(0)
      b.put(t.array())
      b.array()
    }
    for (le <- Seq(true, false); off <- Seq(0x80000010L, 0xFFFFFFF0L, 1L << 20))
      assert(Multimodal.jpegOrientation(
        jpg.take(2) ++ app1Off(off, le) ++ jpg.drop(2)) === 1,
        s"offset $off le=$le")
    // Pixel mapping: [A B] strip rotated 90 CW (orientation 6) stacks
    // A above B; involution/inverse-pair properties pin the rest.
    val strip = Array[Byte](1, 2, 3, 4, 5, 6) // A=(1,2,3) B=(4,5,6)
    val (w6, h6, p6) = Multimodal.applyOrientation(2, 1, 3, strip, 6)
    assert((w6, h6) === (1, 2) && p6.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6))
    val rnd = new scala.util.Random(31)
    val img = Array.fill[Byte](5 * 4 * 3)(rnd.nextInt(256).toByte)
    for (o <- Seq(2, 3, 4, 5)) { // self-inverse transforms
      val (w1, h1, p1) = Multimodal.applyOrientation(5, 4, 3, img, o)
      val (w2, h2, p2) = Multimodal.applyOrientation(w1, h1, 3, p1, o)
      assert((w2, h2) === (5, 4) && p2.toSeq === img.toSeq, s"o=$o")
    }
    // 6 (90 CW) undone by 8 (90 CCW).
    val (wa, ha, pa) = Multimodal.applyOrientation(5, 4, 3, img, 6)
    val (wb, hb, pb) = Multimodal.applyOrientation(wa, ha, 3, pa, 8)
    assert((wb, hb) === (5, 4) && pb.toSeq === img.toSeq)
    // End-to-end: jpegAsBmp honors the tag — 16x8 becomes an 8x16 BMP.
    val rot = withApp1(6, le = true)
    val bmp = Multimodal.jpegAsBmp(
      Seq(Multimodal.MediaFile("r.jpg", rot.length, rot)).toDS())
      .collect().head
    val meta = Multimodal.decodeMeta(Seq(bmp).toDS()).collect().head
    assert(meta.width === 8 && meta.height === 16)
  }

  test("decodeMeta survives arbitrary bytes: no sniffer or parser throws") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val magic = Seq("OggS", "fLaC", "ID3", "RIFF", "PNG",
      "GIF89a", "BM", "II* ", "MM *", "ÿØÿ")
    val files = (0 until 200).map { i =>
      val len = 8 + rnd.nextInt(400)
      val b = new Array[Byte](len); rnd.nextBytes(b)
      // Half the corpus grafts a REAL magic prefix onto garbage, so
      // every parser sees malformed input past its sniff, not just the
      // stub fallback.
      val withMagic = if (i % 2 == 0) {
        val m = magic(i % magic.size).getBytes("ISO-8859-1")
        m ++ b.drop(m.length)
      } else b
      Multimodal.MediaFile(s"f$i.bin", withMagic.length, withMagic)
    }
    val metas = Multimodal.decodeMeta(files.toDS()).collect()
    assert(metas.length === 200)
    // And the embed stage survives the same corpus.
    assert(Multimodal.embed(files.toDS()).collect().length === 200)
  }

  test("VP8 fuzz: mutated and truncated lossy WebP never throws") {
    import spark.implicits._
    val in = getClass.getResourceAsStream("/vp8/photo_80x56_q20.webp")
    val base = try in.readAllBytes() finally in.close()
    val rnd = new scala.util.Random(123)
    val files = (0 until 150).map { i =>
      val b = base.clone()
      i % 3 match {
        case 0 => // point mutations anywhere (headers, probs, tokens)
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          Multimodal.MediaFile(s"m$i.webp", b.length, b)
        case 1 => // truncation at every depth
          val cut = 1 + rnd.nextInt(b.length - 1)
          Multimodal.MediaFile(s"t$i.webp", cut, b.take(cut))
        case _ => // mutation + truncation combined
          (0 until 4).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          val cut = 12 + rnd.nextInt(b.length - 12)
          Multimodal.MediaFile(s"mt$i.webp", cut, b.take(cut))
      }
    }
    // Direct decode: Some or None, never a throw.
    files.foreach(f => Multimodal.decodeWebpLossy(f.content))
    // And through the full pipeline stages.
    assert(Multimodal.decodeMeta(files.toDS()).collect().length === 150)
    assert(Multimodal.embed(files.toDS()).collect().length === 150)
    assert(Multimodal.webpAsBmp(files.toDS()).collect().length <= 150)
  }

  test("ICO: largest-entry meta; PNG-payload entries decode") {
    import spark.implicits._
    val png16 = pngBytesExt(16, 16, 2, 8,
      Array.tabulate(16 * 16 * 3)(i => i % 251))
    val png32 = pngBytesExt(32, 32, 2, 8,
      Array.tabulate(32 * 32 * 3)(i => (i * 7) % 253))
    def ico(entries: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
      val n = entries.length
      var off = 6 + n * 16
      val b = java.nio.ByteBuffer
        .allocate(off + entries.map(_._3.length).sum)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(0).putShort(1).putShort(n.toShort)
      entries.foreach { case (w, h, p) =>
        b.put((if (w == 256) 0 else w).toByte)
          .put((if (h == 256) 0 else h).toByte)
          .put(0.toByte).put(0.toByte).putShort(1).putShort(32)
          .putInt(p.length).putInt(off)
        off += p.length
      }
      entries.foreach(e => b.put(e._3))
      b.array()
    }
    val file = ico(Seq((16, 16, png16), (32, 32, png32)))
    val meta = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("f.ico", file.length, file)).toDS()).collect().head
    assert(meta.format === "ico" && meta.width === 32 && meta.height === 32)
    // decode picks the LARGEST entry and round-trips its PNG pixels.
    val img = Multimodal.decodeIco(file).get
    assert(img.width === 32 && img.height === 32)
    assert(img.pixels.toSeq ===
      Array.tabulate(32 * 32 * 3)(i => ((i * 7) % 253).toByte).toSeq)
    // Garbage payload (neither PNG nor a 40-byte-header DIB): None.
    assert(Multimodal.decodeIco(
      ico(Seq((16, 16, new Array[Byte](100))))).isEmpty)
    // Truncating the 32x32 payload region: that entry is skipped and
    // decode falls to the intact 16x16 one.
    val cut = Multimodal.decodeIco(file.take(file.length - 4)).get
    assert(cut.width === 16 && cut.height === 16)
    assert(Multimodal.decodeIco(Array[Byte](0, 0, 1, 0)) === None)
  }

  test("ICO: legacy DIB entries — palette depths, BGR(A), AND mask") {
    // Independent DIB writer: BITMAPINFOHEADER with doubled height,
    // bottom-up 32-bit-aligned XOR rows, then the 1-bit AND mask.
    def dib(w: Int, h: Int, bpp: Int, pal: Seq[(Int, Int, Int)],
        pix: (Int, Int) => Int, and: (Int, Int) => Boolean,
        alpha: (Int, Int) => Int = (_, _) => 255): Array[Byte] = {
      val xorStride = ((w * bpp + 31) / 32) * 4
      val andStride = ((w + 31) / 32) * 4
      val b = java.nio.ByteBuffer
        .allocate(40 + pal.length * 4 + (xorStride + andStride) * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(w).putInt(h * 2).putShort(1).putShort(bpp.toShort)
      b.putInt(0).putInt(0).putInt(0).putInt(0)
      b.putInt(pal.length).putInt(0)
      pal.foreach { case (r, g, bl) =>
        b.put(bl.toByte).put(g.toByte).put(r.toByte).put(0.toByte) }
      for (row <- (h - 1) to 0 by -1) {
        val bytes = new Array[Byte](xorStride)
        for (x <- 0 until w) {
          val v = pix(x, row)
          bpp match {
            case 8 => bytes(x) = v.toByte
            case 4 => bytes(x >> 1) =
              (bytes(x >> 1) | (v << (if ((x & 1) == 0) 4 else 0))).toByte
            case 1 => if (v != 0) bytes(x >> 3) =
              (bytes(x >> 3) | (1 << (7 - (x & 7)))).toByte
            case 24 =>
              bytes(x * 3) = (v & 0xFF).toByte
              bytes(x * 3 + 1) = ((v >> 8) & 0xFF).toByte
              bytes(x * 3 + 2) = ((v >> 16) & 0xFF).toByte
            case 32 =>
              bytes(x * 4) = (v & 0xFF).toByte
              bytes(x * 4 + 1) = ((v >> 8) & 0xFF).toByte
              bytes(x * 4 + 2) = ((v >> 16) & 0xFF).toByte
              bytes(x * 4 + 3) = alpha(x, row).toByte
          }
        }
        b.put(bytes)
      }
      for (row <- (h - 1) to 0 by -1) {
        val bytes = new Array[Byte](andStride)
        for (x <- 0 until w if and(x, row))
          bytes(x >> 3) = (bytes(x >> 3) | (1 << (7 - (x & 7)))).toByte
        b.put(bytes)
      }
      b.array()
    }
    def icoOf(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(6 + 16 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(0).putShort(1).putShort(1)
      b.put(w.toByte).put(h.toByte).put(0.toByte).put(0.toByte)
        .putShort(1).putShort(0).putInt(payload.length).putInt(22)
      b.put(payload)
      b.array()
    }
    // 8-bpp palette, odd width (row padding), AND mask on a diagonal.
    val pal = Seq((250, 10, 20), (30, 200, 40), (5, 6, 255))
    val d8 = icoOf(5, 3, dib(5, 3, 8, pal,
      (x, y) => (x + y) % 3, (x, y) => x == y))
    val i8 = Multimodal.decodeIco(d8).get
    assert((i8.width, i8.height, i8.channels) === ((5, 3, 4)))
    for (y <- 0 until 3; x <- 0 until 5) {
      val (r, g, b2) = pal((x + y) % 3)
      val o = (y * 5 + x) * 4
      assert((i8.pixels(o) & 0xFF) === r && (i8.pixels(o + 1) & 0xFF) === g
        && (i8.pixels(o + 2) & 0xFF) === b2, s"($x,$y)")
      assert((i8.pixels(o + 3) & 0xFF) === (if (x == y) 0 else 255))
    }
    // 4-bpp and 1-bpp run the nibble/bit unpack.
    val i4 = Multimodal.decodeIco(icoOf(7, 2, dib(7, 2, 4, pal,
      (x, y) => (x * 2 + y) % 3, (_, _) => false))).get
    for (y <- 0 until 2; x <- 0 until 7) {
      val (r, _, _) = pal((x * 2 + y) % 3)
      assert((i4.pixels((y * 7 + x) * 4) & 0xFF) === r, s"4bpp ($x,$y)")
    }
    val i1 = Multimodal.decodeIco(icoOf(9, 2, dib(9, 2, 1,
      Seq((0, 0, 0), (255, 255, 255)),
      (x, _) => x % 2, (_, _) => false))).get
    for (x <- 0 until 9)
      assert((i1.pixels(x * 4) & 0xFF) === (if (x % 2 == 1) 255 else 0))
    // 24-bpp BGR ordering, and 32-bpp with a REAL alpha channel.
    val i24 = Multimodal.decodeIco(icoOf(3, 2, dib(3, 2, 24, Nil,
      (x, y) => (x * 40 << 16) | (y * 90 << 8) | 7, (_, _) => false))).get
    assert((i24.pixels(0) & 0xFF, i24.pixels(1) & 0xFF,
      i24.pixels(2) & 0xFF) === ((0, 0, 7)))
    assert((i24.pixels((1 * 3 + 2) * 4) & 0xFF) === 80)
    val i32 = Multimodal.decodeIco(icoOf(2, 2, dib(2, 2, 32, Nil,
      (x, y) => (10 << 16) | (20 << 8) | 30, (_, _) => false,
      alpha = (x, y) => x * 100 + y))).get
    assert((i32.pixels(3) & 0xFF) === 0) // alpha(0,0)
    assert((i32.pixels(7) & 0xFF) === 100) // alpha(1,0)
    // 32-bpp with ALL-ZERO alpha: the legacy pre-alpha convention —
    // opaque, then the AND mask cuts.
    val iLegacy = Multimodal.decodeIco(icoOf(2, 2, dib(2, 2, 32, Nil,
      (_, _) => 0x112233, (x, y) => x == 0 && y == 0,
      alpha = (_, _) => 0))).get
    assert((iLegacy.pixels(3) & 0xFF) === 0) // masked corner
    assert((iLegacy.pixels(7) & 0xFF) === 255) // opaque elsewhere
    // Truncated DIB (mask missing): drop.
    val whole = dib(5, 3, 8, pal, (x, y) => 0, (_, _) => false)
    assert(Multimodal.decodeIco(icoOf(5, 3, whole.take(whole.length - 8))).isEmpty)
  }

  /** Independent EBML element writer: 2-byte IDs written verbatim,
    * sizes in the minimal 1-byte form (or 8-byte form when forced). */
  private def ebml(id: Long, body: Array[Byte],
      unknownSize: Boolean = false): Array[Byte] = {
    val idBytes = {
      var n = 1L; var len = 1
      while (id > (0xFFL << ((len - 1) * 8)) && len < 4) len += 1
      (0 until len).reverse.map(i => ((id >> (i * 8)) & 0xFF).toByte).toArray
    }
    val szBytes =
      if (unknownSize) Array(0xFF.toByte)
      else if (body.length < 0x7F) Array((0x80 | body.length).toByte)
      else {
        val b = java.nio.ByteBuffer.allocate(8)
        b.putLong(body.length.toLong | (1L << 56))
        b.array()
      }
    idBytes ++ szBytes ++ body
  }

  private def ebmlUint(id: Long, v: Long): Array[Byte] = {
    var len = 1
    while (v >= (1L << (8 * len)) && len < 8) len += 1
    ebml(id, (0 until len).reverse.map(i => ((v >> (i * 8)) & 0xFF).toByte).toArray)
  }

  test("Matroska meta: Info duration x timecode scale, Video dims, unknown-size segment") {
    import spark.implicits._
    val header = ebml(0x1A45DFA3L, Array[Byte](1, 2, 3))
    def mkv(durBytes: Array[Byte], tcScale: Option[Long],
        unknownSeg: Boolean) = {
      val info = ebml(0x1549A966L,
        tcScale.map(ebmlUint(0x2AD7B1L, _)).getOrElse(Array.emptyByteArray) ++
          ebml(0x4489L, durBytes))
      val tracks = ebml(0x1654AE6BL, ebml(0xAEL,
        ebml(0xE0L, ebmlUint(0xB0L, 1280) ++ ebmlUint(0xBAL, 720))))
      header ++ ebml(0x18538067L, info ++ tracks, unknownSize = unknownSeg)
    }
    // float32 duration 90000 ticks at the default 1 ms tick = 90 s.
    val f32 = java.nio.ByteBuffer.allocate(4).putFloat(90000f).array()
    val m = Multimodal.decodeMeta(Seq(Multimodal.MediaFile("a.webm",
      0, mkv(f32, None, unknownSeg = false))).toDS()).collect().head
    assert(m.format === "mkv" && m.width === 1280 && m.height === 720)
    assert(m.duration_ms === 90000L)
    // float64 duration + explicit 20 ms tick + UNKNOWN-SIZE segment
    // (the live-stream convention): 1500 ticks x 20 ms = 30 s.
    val f64 = java.nio.ByteBuffer.allocate(8).putDouble(1500.0).array()
    val m2 = Multimodal.decodeMeta(Seq(Multimodal.MediaFile("b.webm",
      0, mkv(f64, Some(20000000L), unknownSeg = true))).toDS()).collect().head
    assert(m2.duration_ms === 30000L && m2.width === 1280)
    // Truncated mid-element: walk stops, no crash, partial zeros.
    val whole = mkv(f32, None, unknownSeg = false)
    val mt = Multimodal.decodeMeta(Seq(Multimodal.MediaFile("t.webm",
      0, whole.take(12))).toDS()).collect().head
    assert(mt.format === "mkv" && mt.duration_ms === 0L)
  }

  /** Independent Ogg page writer (CRC left zero — the meta walk hops
    * on lacing sums, it does not checksum). */
  private def oggPage(granule: Long, seq: Int,
      payload: Array[Byte]): Array[Byte] = {
    val full = payload.length / 255
    val rem = payload.length % 255
    val lacing = Array.fill[Byte](full)(255.toByte) :+ rem.toByte
    val b = java.nio.ByteBuffer.allocate(27 + lacing.length + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("OggS".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
      .putLong(granule).putInt(0x1234).putInt(seq).putInt(0)
      .put(lacing.length.toByte).put(lacing).put(payload)
    b.array()
  }

  test("Ogg meta: Vorbis id + last-granule duration; Opus; non-audio zeros") {
    import spark.implicits._
    // Vorbis id header: packet type 1, "vorbis", version, ch 2, 44.1 kHz.
    val vid = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vid.put(1.toByte).put("vorbis".getBytes("US-ASCII")).putInt(0)
      .put(2.toByte).putInt(44100)
    val ogg = oggPage(0L, 0, vid.array()) ++
      oggPage(-1L, 1, Array.fill[Byte](300)(7)) ++ // continued: granule -1
      oggPage(88200L, 2, Array[Byte](1, 2, 3))
    val m = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("a.ogg", ogg.length, ogg)).toDS()).collect().head
    assert(m.format === "ogg" && m.channels === 2 && m.duration_ms === 2000L)
    // Opus: granules tick at 48 kHz whatever the input rate field says.
    val oid = java.nio.ByteBuffer.allocate(19)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    oid.put("OpusHead".getBytes("US-ASCII")).put(1.toByte).put(1.toByte)
      .putShort(312.toShort).putInt(16000)
    val opus = oggPage(0L, 0, oid.array()) ++ oggPage(96000L, 1, Array[Byte](9))
    val mo = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("b.ogg", opus.length, opus)).toDS()).collect().head
    assert(mo.channels === 1 && mo.duration_ms === 2000L)
    // Unknown codec in an Ogg container: honest zeros, no crash.
    val other = oggPage(0L, 0, "theora!!".getBytes) ++
      oggPage(123L, 1, Array[Byte](1))
    val mu = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("c.ogg", other.length, other)).toDS()).collect().head
    assert(mu.format === "ogg" && mu.channels === 0 && mu.duration_ms === 0L)
    // Truncated mid-lacing-table: walk stops at the valid prefix.
    val trunc = ogg.take(ogg.length - 10)
    val mt = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("t.ogg", trunc.length, trunc)).toDS()).collect().head
    assert(mt.format === "ogg" && mt.channels === 2)
  }

  /** Independent MP3 frame-header writer (MPEG1 Layer III). */
  private def mp3Frame(kbpsIdx: Int, rateIdx: Int, mono: Boolean,
      xingFrames: Option[Int]): Array[Byte] = {
    val h1 = 0xFB // MPEG1, Layer III, no CRC
    val h2 = (kbpsIdx << 4) | (rateIdx << 2)
    val h3 = if (mono) 0xC0 else 0x00
    val side = if (mono) 17 else 32
    val body = new Array[Byte](4 + side + 16 + 64)
    body(0) = 0xFF.toByte; body(1) = h1.toByte
    body(2) = h2.toByte; body(3) = h3.toByte
    xingFrames.foreach { n =>
      val xo = 4 + side
      "Xing".getBytes("US-ASCII").copyToArray(body, xo)
      val bb = java.nio.ByteBuffer.wrap(body, xo + 4, 8)
      bb.putInt(1).putInt(n) // flags: FRAMES present
    }
    body
  }

  test("MP3 meta: ID3 skip, Xing frame count, CBR fallback, channels") {
    import spark.implicits._
    // ID3v2 tag (100 syncsafe bytes) + stereo 44.1 kHz Xing frame:
    // 1234 frames * 1152 / 44100 = 32 234 ms.
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 100.toByte) ++
      new Array[Byte](100)
    val withXing = id3 ++ mp3Frame(9, 0, mono = false, Some(1234))
    val m = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("x.mp3", withXing.length, withXing)).toDS())
      .collect().head
    assert(m.format === "mp3" && m.channels === 2)
    assert(m.duration_ms === 1234L * 1152 * 1000 / 44100)
    // Mono CBR 128 kbps, no Xing: duration = bytes*8/kbps ms.
    val cbr = mp3Frame(9, 0, mono = true, None) ++ new Array[Byte](16000)
    val mc = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("c.mp3", cbr.length, cbr)).toDS()).collect().head
    assert(mc.channels === 1 && mc.duration_ms === cbr.length * 8L / 128)
    // Garbage: not sniffed as mp3 (falls back to the stub path).
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val mj = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("j.mp3", junk.length, junk)).toDS()).collect().head
    assert(mj.format === "mp3") // extension-named stub fallback
  }

  test("sampleTimeline: long frames advance the sample point past the clock, no burst") {
    // frames (delayMs): one long frame then rapid short ones. The r11
    // loop advanced nextSample by ONE everyMs per take, so after a
    // frame longer than everyMs it lagged the clock and every
    // following frame was taken in a catch-up burst.
    def sampled(delays: Seq[Long], everyMs: Long): Seq[Int] =
      Multimodal.sampleTimeline(delays.iterator, (d: Long) => d, everyMs)
        .map(_._2).toSeq
    // clocks: 0, 1000, 1010, 1020, 1030 - the long frame covers
    // [0,1000); the next sample point is 1000+ (not a burst of all).
    assert(sampled(Seq(1000L, 10L, 10L, 10L, 10L), 100L) === Seq(0, 1))
    // everyMs <= 0: every frame, indices preserved
    assert(sampled(Seq(5L, 5L, 5L), 0L) === Seq(0, 1, 2))
    // regular cadence unchanged: clocks 0,50,120,210 @ 100ms -> 0,2,3
    assert(sampled(Seq(50L, 70L, 90L, 110L), 100L) === Seq(0, 2, 3))
    // a take at an exact multiple advances to the NEXT multiple:
    // clocks 0,100,200 @ 100 -> all taken
    assert(sampled(Seq(100L, 100L, 100L), 100L) === Seq(0, 1, 2))
  }

  // ---- WebM/Matroska key-frame decode (EBML writer + VP8 fixtures) ----
  // The container is spec-encoded HERE (EBML vint IDs/sizes, Segment →
  // Info/Tracks/Cluster layout); the VP8 payloads are REAL lossy
  // streams lifted from the src/test/resources/vp8 fixture set, whose
  // decodes are already pinned bit-exact against libwebp in WebpSpec.

  private def ebmlEl(id: Long, body: Array[Byte]): Array[Byte] = {
    val n = if (id <= 0xFF) 1 else if (id <= 0xFFFF) 2
      else if (id <= 0xFFFFFF) 3 else 4
    val idB = Array.tabulate(n)(i =>
      ((id >> (8 * (n - 1 - i))) & 0xFF).toByte)
    // size as an 8-byte vint (marker 0x01 + 7 size bytes)
    val szB = new Array[Byte](8)
    szB(0) = 0x01
    for (i <- 1 until 8)
      szB(i) = ((body.length.toLong >> (8 * (7 - i))) & 0xFF).toByte
    idB ++ szB ++ body
  }

  private def ebmlUint(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >>> (8 * n)) != 0) n += 1
    Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte)
  }

  /** A minimal spec-valid WebM: one V_VP8 track, one cluster at
    * timestamp `clusterTicks`, `blocks` = (relTicks, flags, payload)
    * SimpleBlocks on track 1. */
  private def webmBytes(w: Int, h: Int, tcScaleNs: Long,
      clusterTicks: Long,
      blocks: Seq[(Int, Int, Array[Byte])],
      groups: Seq[(Int, Boolean, Array[Byte])] = Seq.empty,
      groupFlags: Int = 0): Array[Byte] = {
    val hdr = ebmlEl(0x1A45DFA3L,
      ebmlEl(0x4282L, "webm".getBytes("US-ASCII"))) // DocType
    val info = ebmlEl(0x1549A966L,
      ebmlEl(0x2AD7B1L, ebmlUint(tcScaleNs)))
    val video = ebmlEl(0xE0L,
      ebmlEl(0xB0L, ebmlUint(w)) ++ ebmlEl(0xBAL, ebmlUint(h)))
    val entry = ebmlEl(0xAEL,
      ebmlEl(0xD7L, ebmlUint(1)) ++ ebmlEl(0x83L, ebmlUint(1)) ++
        ebmlEl(0x86L, "V_VP8".getBytes("US-ASCII")) ++ video)
    val tracks = ebmlEl(0x1654AE6BL, entry)
    val simpleEls = blocks.map { case (rel, flags, payload) =>
      ebmlEl(0xA3L, Array[Byte](0x81.toByte, ((rel >> 8) & 0xFF).toByte,
        (rel & 0xFF).toByte, flags.toByte) ++ payload)
    }
    val groupEls = groups.map { case (rel, ref, payload) =>
      val block = ebmlEl(0xA1L, Array[Byte](0x81.toByte,
        ((rel >> 8) & 0xFF).toByte, (rel & 0xFF).toByte,
        groupFlags.toByte) ++ payload)
      val refEl = if (ref) ebmlEl(0xFBL, ebmlUint(0)) else Array.empty[Byte]
      ebmlEl(0xA0L, block ++ refEl)
    }
    val cluster = ebmlEl(0x1F43B675L,
      ebmlEl(0xE7L, ebmlUint(clusterTicks)) ++
        (simpleEls ++ groupEls).flatten.toArray)
    hdr ++ ebmlEl(0x18538067L, info ++ tracks ++ cluster)
  }

  /** The raw VP8 payload of a fixture lossy .webp (RIFF chunk walk). */
  private def vp8PayloadOf(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name.webp")
    val webp = try in.readAllBytes() finally in.close()
    var off = 12
    while (off + 8 <= webp.length) {
      val t = new String(webp, off, 4, "US-ASCII")
      val sz = (webp(off + 4) & 0xFF) | ((webp(off + 5) & 0xFF) << 8) |
        ((webp(off + 6) & 0xFF) << 16) | ((webp(off + 7) & 0xFF) << 24)
      if (t == "VP8 ")
        return java.util.Arrays.copyOfRange(webp, off + 8, off + 8 + sz)
      off += 8 + sz + (sz & 1)
    }
    sys.error(s"no VP8 chunk in $name.webp")
  }

  private def fixtureWebp(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name.webp")
    try in.readAllBytes() finally in.close()
  }

  test("WebM: key frames decode bit-identical to the lossy-WebP path") {
    import spark.implicits._
    val payload = vp8PayloadOf("photo_16x16_q75")
    val direct = Multimodal.decodeWebpLossy(
      fixtureWebp("photo_16x16_q75")).get
    assert(direct.channels === 3)
    // 3 key frames at 0/40/80 ms (1 ms ticks), plus one NON-key block
    // and one LACED block of garbage that must be skipped, not decoded
    val junk = Array.tabulate[Byte](40)(i => (i * 13).toByte)
    val webm = webmBytes(16, 16, 1000000L, 0L, Seq(
      (0, 0x80, payload),
      (20, 0x00, junk),      // inter frame: skipped (no keyframe flag)
      (40, 0x80, payload),
      (60, 0x06, junk),      // EBML-laced NON-key (inter) frames: skipped
      (80, 0x80, payload)))
    val vid = Multimodal.decodeMkv(webm).get
    assert(vid.width === 16 && vid.height === 16)
    assert(vid.frames.map(_.timeMs) === Seq(0L, 40L, 80L))
    vid.frames.foreach(fr =>
      assert(fr.pixels.sameElements(direct.pixels),
        "WebM key frame must be bit-identical to the WebP-path decode " +
          "of the same payload"))
    // BlockGroup spelling: Block without ReferenceBlock = key frame;
    // with ReferenceBlock = inter frame, skipped.
    val grouped = webmBytes(16, 16, 1000000L, 100L, Seq.empty, groups =
      Seq((0, false, payload), (30, true, junk)))
    val gvid = Multimodal.decodeMkv(grouped).get
    assert(gvid.frames.map(_.timeMs) === Seq(100L))
    assert(gvid.frames.head.pixels.sameElements(direct.pixels))
    // TimecodeScale respected: 2 ms ticks double the timestamps.
    val scaled = Multimodal.decodeMkv(webmBytes(16, 16, 2000000L, 5L,
      Seq((0, 0x80, payload), (40, 0x80, payload)))).get
    assert(scaled.frames.map(_.timeMs) === Seq(10L, 90L))
    // embed: histogram over the DECODED first key frame's pixels.
    val emb = Multimodal.embed(Seq(
      Multimodal.MediaFile("v.webm", webm.length, webm)).toDS())
      .collect().head.embedding
    val expected = new Array[Double](8)
    direct.pixels.foreach(b => expected((b & 0xFF) >> 5) += 1.0)
    (0 until 8).foreach(i => expected(i) /= direct.pixels.length)
    assert(emb.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // header-only meta still reports the container dims (no decode).
    val meta = Multimodal.decodeMeta(Seq(
      Multimodal.MediaFile("v.webm", webm.length, webm)).toDS())
      .collect().head
    assert(meta.format === "mkv" && meta.width === 16 && meta.height === 16)
  }

  test("WebM: unknown-size Segment (live-stream shape) and multiple clusters") {
    val payload = vp8PayloadOf("photo_16x16_q75")
    // Two clusters at timestamps 0 and 1000 ms, inside a Segment with
    // the UNKNOWN size marker (all-ones vint) — the live-stream
    // convention: the element runs to the parent's end.
    def cluster(ts: Long, rel: Int): Array[Byte] =
      ebmlEl(0x1F43B675L, ebmlEl(0xE7L, ebmlUint(ts)) ++
        ebmlEl(0xA3L, Array[Byte](0x81.toByte, ((rel >> 8) & 0xFF).toByte,
          (rel & 0xFF).toByte, 0x80.toByte) ++ payload))
    val hdr = ebmlEl(0x1A45DFA3L,
      ebmlEl(0x4282L, "webm".getBytes("US-ASCII")))
    val info = ebmlEl(0x1549A966L, ebmlEl(0x2AD7B1L, ebmlUint(1000000L)))
    val video = ebmlEl(0xE0L,
      ebmlEl(0xB0L, ebmlUint(16)) ++ ebmlEl(0xBAL, ebmlUint(16)))
    val entry = ebmlEl(0xAEL,
      ebmlEl(0xD7L, ebmlUint(1)) ++ ebmlEl(0x83L, ebmlUint(1)) ++
        ebmlEl(0x86L, "V_VP8".getBytes("US-ASCII")) ++ video)
    val segBody = info ++ ebmlEl(0x1654AE6BL, entry) ++
      cluster(0L, 0) ++ cluster(1000L, 17)
    val unknownSize = Array[Byte](0x01) ++ Array.fill[Byte](7)(0xFF.toByte)
    val segId = Array[Byte](0x18, 0x53.toByte, 0x80.toByte, 0x67)
    val webm = hdr ++ segId ++ unknownSize ++ segBody
    val vid = Multimodal.decodeMkv(webm).get
    assert(vid.frames.map(_.timeMs) === Seq(0L, 1017L),
      "cluster timestamps + block relatives must compose across clusters")
    assert(vid.frames.forall(_.pixels.length === 16 * 16 * 3))
    // a cluster MISSING its (spec-mandatory) Timestamp is structure
    // loss: inheriting the previous cluster's time would emit
    // silently mis-timed frames, so the file drops (r18 review #6)
    val noTsCluster = ebmlEl(0x1F43B675L,
      ebmlEl(0xA3L, Array[Byte](0x81.toByte, 0, 0, 0x80.toByte) ++ payload))
    val bad = hdr ++ segId ++ unknownSize ++
      (info ++ ebmlEl(0x1654AE6BL, entry) ++ cluster(0L, 0) ++ noTsCluster)
    assert(Multimodal.decodeMkv(bad).isEmpty,
      "block before its cluster's Timestamp must drop the file")
  }

  test("EBML lacing: 3-frame laces exercise the signed-delta branch; lying deltas drop") {
    // The 2-frame cases below never reach the k>=1 delta arithmetic
    // (one unsigned vint sizes frame 0; frame 1 is the remainder), so
    // this lace holds THREE frames of two different 16x16 fixtures:
    // frame sizes 54, 20, 54 — the first delta is NEGATIVE (-34) and
    // deliberately encoded as an over-long TWO-byte signed vint
    // (marker 0x40, bias 2^13-1), covering both the multi-byte vint
    // path and the raw - (2^(7*lk-1) - 1) bias arithmetic.
    val big = vp8PayloadOf("photo_16x16_q75") // 54 bytes
    val small = vp8PayloadOf("mag0001")       // 20 bytes
    assert(big.length === 54 && small.length === 20, "fixture drift")
    val delta = small.length - big.length + 8191 // -34 biased into 14 bits
    val sizes = Array[Byte]((0x80 | big.length).toByte,
      (0x40 | (delta >> 8)).toByte, (delta & 0xFF).toByte)
    val lace = Array[Byte](2) ++ sizes ++ big ++ small ++ big
    val vid = Multimodal.decodeMkv(
      webmBytes(16, 16, 1000000L, 0L, Seq((0, 0x86, lace)))).getOrElse(
      fail("3-frame EBML lace did not decode"))
    assert(vid.frames.length === 3, "EBML 3-lace frame count")
    assert(vid.frames.map(_.timeMs) === Seq(0L, 0L, 0L))
    def direct(p: Array[Byte]): Array[Byte] =
      Multimodal.decodeMkv(webmBytes(16, 16, 1000000L, 0L,
        Seq((0, 0x80, p)))).get.frames.head.pixels
    val (db, ds) = (direct(big), direct(small))
    assert(vid.frames(0).pixels.sameElements(db), "laced frame 0")
    assert(vid.frames(1).pixels.sameElements(ds), "laced frame 1")
    assert(vid.frames(2).pixels.sameElements(db), "laced frame 2")
    // A delta that drives a frame size NEGATIVE is a lying table: the
    // file drops (never mis-slices). s0 = 5, delta = -10 (1-byte
    // signed vint, bias 63).
    val lying = Array[Byte](2, (0x80 | 5).toByte, (0x80 | 53).toByte) ++
      big ++ small ++ big
    assert(Multimodal.decodeMkv(webmBytes(16, 16, 1000000L, 0L,
      Seq((0, 0x86, lying)))).isEmpty, "negative-size delta must drop")
    // And a delta whose sizes overrun the payload (remainder < 0).
    val over = delta + 500 // claims frame 1 is 466 bytes larger
    val overSizes = Array[Byte]((0x80 | big.length).toByte,
      (0x40 | (over >> 8)).toByte, (over & 0xFF).toByte)
    assert(Multimodal.decodeMkv(webmBytes(16, 16, 1000000L, 0L,
      Seq((0, 0x86, Array[Byte](2) ++ overSizes ++ big ++ small ++ big))))
      .isEmpty, "overrunning delta must drop")
  }

  test("WebM lacing: Xiph/fixed/EBML key laces decode every frame; a bad table drops the file") {
    val payload = vp8PayloadOf("photo_16x16_q75")
    val L = payload.length
    // Xiph size table for the FIRST of two frames: runs of 255 + rest.
    val xiphSizes =
      Array.fill[Byte](L / 255)(0xFF.toByte) :+ (L % 255).toByte
    val xiph = Array[Byte](1) ++ xiphSizes ++ payload ++ payload
    // EBML size table: one unsigned 2-byte vint (0x40xx) for frame 0.
    require(L < 0x3FFF)
    val ebmlSizes = Array[Byte]((0x40 | (L >> 8)).toByte, (L & 0xFF).toByte)
    val ebml = Array[Byte](1) ++ ebmlSizes ++ payload ++ payload
    // Fixed-size lacing: count byte only; two equal frames divide.
    val fixed = Array[Byte](1) ++ payload ++ payload
    for ((flags, laced, name) <- Seq((0x82, xiph, "Xiph"),
        (0x86, ebml, "EBML"), (0x84, fixed, "fixed"))) {
      val webm = webmBytes(16, 16, 1000000L, 0L, Seq((0, flags, laced)))
      val vid = Multimodal.decodeMkv(webm).getOrElse(
        fail(s"$name-laced key block did not decode"))
      assert(vid.frames.length === 2, s"$name lace frame count")
      // laced frames share the block timestamp (video lacing carries
      // no per-frame times) and are bit-identical to the single-frame
      // decode of the same payload
      assert(vid.frames.map(_.timeMs) === Seq(0L, 0L), name)
      val direct = Multimodal.decodeMkv(webmBytes(16, 16, 1000000L, 0L,
        Seq((0, 0x80, payload)))).get.frames.head.pixels
      vid.frames.foreach(fr => assert(fr.pixels.sameElements(direct),
        s"$name-laced frame not bit-identical"))
    }
    // BlockGroup spelling: a laced keyframe group decodes both frames.
    val grouped = webmBytes(16, 16, 1000000L, 7L, Seq.empty,
      groups = Seq((0, false, fixed)), groupFlags = 0x04)
    val gvid = Multimodal.decodeMkv(grouped).get
    assert(gvid.frames.length === 2 &&
      gvid.frames.map(_.timeMs) === Seq(7L, 7L))
    // An unparseable lacing table on the video track is declared
    // structure we failed to honor: the FILE drops (the
    // cluster-timestamp discipline), it is never mis-sliced. Xiph
    // table claiming more bytes than the payload holds:
    val badXiph = Array[Byte](1, 0xFF.toByte, 0xFF.toByte,
      0xFF.toByte, 200.toByte) ++ payload.take(64)
    assert(Multimodal.decodeMkv(webmBytes(16, 16, 1000000L, 0L,
      Seq((0, 0x82, badXiph)))).isEmpty, "bad Xiph table must drop")
    // fixed-size lacing whose payload does not divide evenly:
    val badFixed = Array[Byte](2) ++ payload ++ payload // 3 frames, 2L bytes
    assert(Multimodal.decodeMkv(webmBytes(16, 16, 1000000L, 0L,
      Seq((0, 0x84, badFixed)))).isEmpty, "uneven fixed lace must drop")
    // lacing fuzz: point mutations + truncations over a valid laced
    // container never throw and never emit a non-16x16 frame
    val base = webmBytes(16, 16, 1000000L, 0L, Seq((0, 0x82, xiph)))
    val rnd = new scala.util.Random(654)
    (0 until 120).foreach { i =>
      val b = base.clone()
      val f =
        if (i % 2 == 0) {
          (0 until 1 + rnd.nextInt(6)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          b
        } else b.take(8 + rnd.nextInt(b.length - 8))
      Multimodal.decodeMkv(f).foreach(v =>
        assert(v.width === 16 && v.height === 16))
    }
  }

  test("WebM frame fan-out: re-decodable BMPs, everyMs sampling, dims guard") {
    import spark.implicits._
    val payload = vp8PayloadOf("photo_16x16_q75")
    // key frames at 0/40/80/120 ms
    val webm = webmBytes(16, 16, 1000000L, 0L,
      Seq(0, 40, 80, 120).map(t => (t, 0x80, payload)))
    val ds = Seq(Multimodal.MediaFile("v.webm", webm.length, webm)).toDS()
    val all = Multimodal.mkvFramesAsBmp(ds).collect().sortBy(_.path)
    assert(all.map(_.path).toSeq ===
      (0 until 4).map(i => s"v.webm#frame$i"))
    // every emitted frame is a spec-valid BMP the meta kernel re-reads
    val metas = Multimodal.decodeMeta(Multimodal.mkvFramesAsBmp(ds)).collect()
    assert(metas.forall(m => m.format == "bmp" && m.width == 16 &&
      m.height == 16))
    // 40 ms key-frame cadence, sample every 80 ms -> frames 0 and 2
    val sampled = Multimodal.mkvFramesAsBmp(ds, everyMs = 80L)
      .collect().map(_.path).sorted
    assert(sampled.toSeq === Seq("v.webm#frame0", "v.webm#frame2"))
    // track dims disagreeing with the coded frame = structure loss:
    // the whole file drops (the AVI discipline)
    val mismatched = webmBytes(32, 32, 1000000L, 0L,
      Seq((0, 0x80, payload)))
    assert(Multimodal.decodeMkv(mismatched).isEmpty)
    assert(Multimodal.mkvFramesAsBmp(Seq(
      Multimodal.MediaFile("m.webm", mismatched.length, mismatched))
      .toDS()).collect().isEmpty)
  }

  test("WebM bomb guard and fuzz: hostile containers drop, never throw or allocate") {
    import spark.implicits._
    val payload = vp8PayloadOf("photo_16x16_q75")
    // a container declaring a 65535x65535 canvas trips the pixel bound
    // BEFORE any frame decode allocates
    val bomb = webmBytes(65535, 65535, 1000000L, 0L,
      Seq((0, 0x80, payload)))
    val t0 = System.nanoTime()
    assert(Multimodal.decodeMkv(bomb).isEmpty)
    assert((System.nanoTime() - t0) < 2e9, "bomb refusal must be cheap")
    // a torn key frame (truncated payload) drops the whole file
    val torn = webmBytes(16, 16, 1000000L, 0L,
      Seq((0, 0x80, payload.take(payload.length / 3))))
    assert(Multimodal.decodeMkv(torn).isEmpty)
    // fuzz: point mutations + truncations over the valid container
    val base = webmBytes(16, 16, 1000000L, 0L,
      Seq((0, 0x80, payload), (40, 0x80, payload)))
    val rnd = new scala.util.Random(321)
    val files = (0 until 120).map { i =>
      val b = base.clone()
      i % 3 match {
        case 0 =>
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          Multimodal.MediaFile(s"m$i.webm", b.length, b)
        case 1 =>
          val cut = 1 + rnd.nextInt(b.length - 1)
          Multimodal.MediaFile(s"t$i.webm", cut, b.take(cut))
        case _ =>
          (0 until 4).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          val cut = 8 + rnd.nextInt(b.length - 8)
          Multimodal.MediaFile(s"mt$i.webm", cut, b.take(cut))
      }
    }
    files.foreach(f => Multimodal.decodeMkv(f.content)) // never throws
    assert(Multimodal.decodeMeta(files.toDS()).collect().length === 120)
    assert(Multimodal.embed(files.toDS()).collect().length === 120)
    assert(Multimodal.mkvFramesAsBmp(files.toDS()).collect().length <= 240)
  }
}
