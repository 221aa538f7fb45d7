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
}
