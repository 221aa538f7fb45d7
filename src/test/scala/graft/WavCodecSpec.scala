package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** WAV sample-decode pins (PCM8/16, G.711 mu-law/A-law, IMA ADPCM).
  * Encoders AND reference decoders here are written independently from
  * the public algorithm descriptions (G.711 segmented companding; the
  * IMA step/index tables) — no shared code with the library decoder,
  * so agreement proves both sides against the spec (the TIFF/WebP/GIF
  * spec discipline).
  */
class WavCodecSpec extends AnyFunSuite {

  /** A WAV container with an arbitrary format tag and raw payload. */
  private def wav(fmt: Int, ch: Int, rate: Int, bits: Int,
      blockAlign: Int, data: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(44 + data.length + (data.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(fmt.toShort).putShort(ch.toShort)
    b.putInt(rate).putInt(rate * blockAlign).putShort(blockAlign.toShort)
    b.putShort(bits.toShort)
    b.put("data".getBytes).putInt(data.length).put(data)
    b.array()
  }

  // ---- independent G.711 encoders (ITU segmented search) --------------

  /** mu-law COMPRESS: +33 bias on the 14-bit magnitude, find the
    * segment (exponent), pick the mantissa, invert all bits. */
  private def muLawEncode(pcm: Short): Int = {
    val sign = if (pcm < 0) 0x80 else 0
    var mag = math.min(math.abs(pcm.toInt) >> 2, 8158) + 33 // 14-bit + bias
    var exp = 7
    var probe = 0x1000
    while (exp > 0 && (mag & probe) == 0) { exp -= 1; probe >>= 1 }
    val mant = (mag >> (exp + 1)) & 0x0F
    (~(sign | (exp << 4) | mant)) & 0xFF
  }

  /** A-law COMPRESS on the 13-bit magnitude, 0x55 toggle. */
  private def aLawEncode(pcm: Short): Int = {
    val sign = if (pcm >= 0) 0x80 else 0
    var mag = math.min(math.abs(pcm.toInt) >> 3, 4095)
    val exp =
      if (mag < 32) 0
      else { var e = 1; var t = mag >> 5; while (t > 1 && e < 7) { t >>= 1; e += 1 }; e }
    val mant = if (exp == 0) (mag >> 1) & 0x0F else (mag >> exp) & 0x0F
    ((sign | (exp << 4) | mant) ^ 0x55) & 0xFF
  }

  test("mu-law: all 256 bytes decode to the published companding curve") {
    // Reference spelled via the segment-base table (independent of the
    // library's closed formula): seg base = (33 << exp) - 33, scaled x4.
    for (byte <- 0 until 256) {
      val b = ~byte & 0xFF
      val exp = (b >> 4) & 7
      val mant = b & 0x0F
      val mag14 = ((33 << exp) - 33) + (mant << (exp + 1))
      val expected = (if ((b & 0x80) != 0) -(mag14 << 2) else mag14 << 2)
      val got = Multimodal.decodeWav(
        wav(7, 1, 8000, 8, 1, Array(byte.toByte))).get.samples(0).toInt
      assert(got === expected, s"byte $byte")
    }
    // Spot anchors from the public expansion table.
    def one(byte: Int): Int = Multimodal.decodeWav(
      wav(7, 1, 8000, 8, 1, Array(byte.toByte))).get.samples(0).toInt
    assert(one(0x80) === 32124 && one(0x00) === -32124) // extremes
    assert(one(0xFF) === 0 && one(0x7F) === 0) // both zeros
  }

  test("mu-law: encode -> decode round-trip error bounded by segment step") {
    for (s <- Seq[Short](0, 1, -1, 100, -100, 1000, -1000, 8000, -8000,
        20000, -20000, 32767, -32768)) {
      val dec = Multimodal.decodeWav(
        wav(7, 1, 8000, 8, 1, Array(muLawEncode(s).toByte))).get.samples(0)
      // Max quantization error = half the top segment's step (~1024).
      assert(math.abs(dec - s) <= 1024, s"pcm $s -> $dec")
    }
  }

  test("A-law: all 256 bytes decode to the published curve; round-trip") {
    for (byte <- 0 until 256) {
      val b = byte ^ 0x55
      val exp = (b >> 4) & 7
      val mant = b & 0x0F
      // Reference: 13-bit magnitude rebuilt per segment, scaled x8.
      val mag13 = if (exp == 0) (mant << 1) + 1
        else ((mant + 16) << exp) | (1 << (exp - 1))
      val expected = (if ((b & 0x80) != 0) mag13 << 3 else -(mag13 << 3))
      val got = Multimodal.decodeWav(
        wav(6, 1, 8000, 8, 1, Array(byte.toByte))).get.samples(0).toInt
      assert(got === expected, s"byte $byte")
    }
    for (s <- Seq[Short](0, 5, -5, 333, -333, 4000, -4000, 30000, -30000)) {
      val dec = Multimodal.decodeWav(
        wav(6, 1, 8000, 8, 1, Array(aLawEncode(s).toByte))).get.samples(0)
      assert(math.abs(dec - s) <= 1057, s"pcm $s -> $dec")
    }
  }

  test("PCM: 8-bit unsigned rescales around the midpoint; 16-bit passes through") {
    val d8 = Multimodal.decodeWav(
      wav(1, 1, 8000, 8, 1, Array[Byte](0, 64, 128.toByte, 192.toByte,
        255.toByte))).get.samples
    assert(d8.toSeq === Seq(-32768, -16384, 0, 16384, 32512).map(_.toShort))
    val pcm = Array[Short](0, 1000, -1000, 32767, -32768)
    val bytes = new Array[Byte](10)
    for (i <- pcm.indices) {
      bytes(i * 2) = (pcm(i) & 0xFF).toByte
      bytes(i * 2 + 1) = ((pcm(i) >> 8) & 0xFF).toByte
    }
    val d16 = Multimodal.decodeWav(wav(1, 1, 8000, 16, 2, bytes)).get
    assert(d16.samples.toSeq === pcm.toSeq && d16.sampleRate === 8000)
  }

  // ---- IMA ADPCM: independent reference codec -------------------------

  private val Steps = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val IdxAdj = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Reference ENCODER (the IMA recipe): quantize the delta against the
    * current step into sign+3 bits, tracking the same predictor the
    * decoder will rebuild. Returns (nibbles, firstSample, firstIndex). */
  private def imaEncode(pcm: Array[Short]): (Array[Int], Short, Int) = {
    var pred = pcm(0).toInt
    var idx = 0
    val nibs = pcm.drop(1).map { s =>
      val step = Steps(idx)
      var delta = s - pred
      var nib = if (delta < 0) { delta = -delta; 8 } else 0
      if (delta >= step) { nib |= 4; delta -= step }
      if (delta >= (step >> 1)) { nib |= 2; delta -= step >> 1 }
      if (delta >= (step >> 2)) { nib |= 1 }
      // rebuild predictor exactly as the decoder will
      val st = Steps(idx)
      var diff = st >> 3
      if ((nib & 1) != 0) diff += st >> 2
      if ((nib & 2) != 0) diff += st >> 1
      if ((nib & 4) != 0) diff += st
      pred = if ((nib & 8) != 0) pred - diff else pred + diff
      pred = math.max(-32768, math.min(32767, pred))
      idx = math.max(0, math.min(88, idx + IdxAdj(nib & 7)))
      nib
    }
    (nibs, pcm(0), 0)
  }

  /** Reference DECODER — a second, independent spelling of the public
    * algorithm, to pin the library decoder against. */
  private def imaDecode(nibs: Array[Int], first: Short,
      idx0: Int): Array[Short] = {
    var pred = first.toInt
    var idx = idx0
    val out = scala.collection.mutable.ArrayBuffer[Short](first)
    for (nib <- nibs) {
      val st = Steps(idx)
      var diff = st >> 3
      if ((nib & 1) != 0) diff += st >> 2
      if ((nib & 2) != 0) diff += st >> 1
      if ((nib & 4) != 0) diff += st
      pred = if ((nib & 8) != 0) pred - diff else pred + diff
      pred = math.max(-32768, math.min(32767, pred))
      idx = math.max(0, math.min(88, idx + IdxAdj(nib & 7)))
      out += pred.toShort
    }
    out.toArray
  }

  /** Pack per-block ADPCM data chunks (4-byte header + low-first nibbles). */
  private def imaBlocks(pcm: Array[Short], blockAlign: Int): Array[Byte] = {
    val samplesPerBlock = (blockAlign - 4) * 2 + 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var i = 0
    while (i < pcm.length) {
      val blk = pcm.slice(i, math.min(i + samplesPerBlock, pcm.length))
      val (nibs, first, idx0) = imaEncode(blk)
      out += (first & 0xFF).toByte += ((first >> 8) & 0xFF).toByte
      out += idx0.toByte += 0.toByte
      var j = 0
      while (j < blockAlign - 4) {
        val lo = if (j * 2 < nibs.length) nibs(j * 2) else 0
        val hi = if (j * 2 + 1 < nibs.length) nibs(j * 2 + 1) else 0
        out += ((hi << 4) | lo).toByte
        j += 1
      }
      i += samplesPerBlock
    }
    out.toArray
  }

  test("IMA ADPCM: library decode == independent reference, multi-block") {
    val n = 1021 // not a block multiple: final short block exercised
    val pcm = Array.tabulate(n)(i =>
      (math.sin(i * 0.07) * 17000 + math.sin(i * 0.011) * 9000).toShort)
    val blockAlign = 256 // 505 samples per block
    val data = imaBlocks(pcm, blockAlign)
    val got = Multimodal.decodeWav(
      wav(17, 1, 8000, 4, blockAlign, data)).get.samples
    // Expected: reference-decode each block independently.
    val spb = (blockAlign - 4) * 2 + 1
    val expected = pcm.grouped(spb).flatMap { blk =>
      val (nibs, first, idx0) = imaEncode(blk)
      // Every stored block is blockAlign bytes (the fixed-block WAV
      // layout), so ALL its nibble slots decode — a final partial
      // block's zero-padded tail included (a fact chunk would trim it;
      // the histogram consumer doesn't need one).
      val slots = (blockAlign - 4) * 2
      val padded = nibs ++ Array.fill(slots - nibs.length)(0)
      imaDecode(padded, first, idx0)
    }.toArray
    assert(got.length === expected.length)
    assert(got.sameElements(expected))
    // Fidelity: ADPCM tracks the waveform — transient slips bounded by
    // a few step sizes, the average far tighter.
    val errs = pcm.zip(got.take(pcm.length))
      .map { case (a, b) => math.abs(a - b).toLong }
    assert(errs.max <= 8192, s"max err ${errs.max}")
    assert(errs.sum / errs.length <= 400, s"mean err ${errs.sum / errs.length}")
  }

  test("stereo IMA ADPCM: alternating chunks decode to interleaved L/R") {
    val n = 33 // header sample + 32 nibble slots = one exact block
    val lpcm = Array.tabulate(n)(i => (math.sin(i * 0.2) * 12000).toShort)
    val rpcm = Array.tabulate(n)(i => (math.cos(i * 0.13) * 9000).toShort)
    val (ln, lf, _) = imaEncode(lpcm)
    val (rn, rf, _) = imaEncode(rpcm)
    def pack8(nibs: Array[Int]): Array[Byte] =
      (0 until 4).map(j =>
        ((nibs(j * 2) & 0xF) | ((nibs(j * 2 + 1) & 0xF) << 4)).toByte).toArray
    val block = scala.collection.mutable.ArrayBuffer.empty[Byte]
    block ++= Seq((lf & 0xFF).toByte, ((lf >> 8) & 0xFF).toByte, 0.toByte,
      0.toByte)
    block ++= Seq((rf & 0xFF).toByte, ((rf >> 8) & 0xFF).toByte, 0.toByte,
      0.toByte)
    for (p <- 0 until 4) {
      block ++= pack8(ln.slice(p * 8, p * 8 + 8))
      block ++= pack8(rn.slice(p * 8, p * 8 + 8))
    }
    val blockAlign = 8 + 4 * 8
    // Two identical blocks: the block loop re-seeds from each header.
    val data = (block ++ block).toArray
    val audio = Multimodal.decodeWav(wav(17, 2, 8000, 4, blockAlign, data)).get
    assert(audio.channels === 2)
    val expL = imaDecode(ln, lf, 0)
    val expR = imaDecode(rn, rf, 0)
    val oneBlock = expL.zip(expR).flatMap { case (l, r) => Seq(l, r) }.toSeq
    assert(audio.samples.toSeq === oneBlock ++ oneBlock)

    // Nonconforming blockAlign (data area not a multiple of 8): each
    // block carries 4 padding bytes that are NOT the next block's
    // headers. The walk must advance by blockAlign — re-parsing the
    // padding as headers would garble everything after block 1.
    val padded = (block ++ Seq[Byte](0x7F, 0x7F, 0x7F, 0x7F)
      ++ block ++ Seq[Byte](0x7F, 0x7F, 0x7F, 0x7F)).toArray
    val audioPad = Multimodal.decodeWav(
      wav(17, 2, 8000, 4, blockAlign + 4, padded)).get
    assert(audioPad.samples.toSeq === oneBlock ++ oneBlock)
  }

  test("float64 PCM: clamp-scaled like float32, NaN to silence") {
    val vals = Array(0.0, 0.5, -0.5, 1.0, -1.0, 2.5, -7.0, Double.NaN, 0.25)
    val b = java.nio.ByteBuffer.allocate(vals.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(b.putDouble)
    val audio = Multimodal.decodeWav(wav(3, 1, 8000, 64, 8, b.array())).get
    val want = vals.map { d =>
      val v = if (d.isNaN) 0.0 else math.max(-1.0, math.min(1.0, d))
      math.round(v * 32767.0).toShort
    }
    assert(audio.samples.toSeq === want.toSeq)
  }

  /** Independent MS-ADPCM reference decoder, written from the published
    * Microsoft spec (coefficient pairs /256, 16-entry delta adaptation
    * with floor 16, seeds emitted older-first). */
  private def msAdpcmRef(block: Array[Byte], nCh: Int): Seq[Short] = {
    val C1 = Array(256, 512, 0, 192, 240, 460, 392)
    val C2 = Array(0, -256, 0, 64, 0, -208, -232)
    val AD = Array(230, 230, 230, 230, 307, 409, 512, 614,
      768, 614, 512, 409, 307, 230, 230, 230)
    def s16(o: Int) = ((block(o) & 0xFF) | ((block(o + 1) & 0xFF) << 8)).toShort.toInt
    val pred = Array.tabulate(nCh)(i => block(i) & 0xFF)
    val delta = Array.tabulate(nCh)(i => s16(nCh + i * 2))
    val s1 = Array.tabulate(nCh)(i => s16(3 * nCh + i * 2))
    val s2 = Array.tabulate(nCh)(i => s16(5 * nCh + i * 2))
    val out = scala.collection.mutable.ArrayBuffer.empty[Short]
    (0 until nCh).foreach(i => out += s2(i).toShort)
    (0 until nCh).foreach(i => out += s1(i).toShort)
    var chn = 0
    for (p <- 7 * nCh until block.length; hi <- Seq(true, false)) {
      val code = if (hi) (block(p) >> 4) & 0xF else block(p) & 0xF
      val sn = if (code >= 8) code - 16 else code
      var v = ((s1(chn) * C1(pred(chn)) + s2(chn) * C2(pred(chn))) >> 8) +
        sn * delta(chn)
      if (v > 32767) v = 32767
      if (v < -32768) v = -32768
      s2(chn) = s1(chn); s1(chn) = v
      delta(chn) = math.max(16, (AD(code) * delta(chn)) >> 8)
      out += v.toShort
      chn = (chn + 1) % nCh
    }
    out.toSeq
  }

  test("MS-ADPCM: library decode == independent reference, mono + stereo") {
    val rnd = new scala.util.Random(57)
    def block(nCh: Int, dataBytes: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(7 * nCh + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until nCh).foreach(_ => b.put(rnd.nextInt(7).toByte)) // predictor
      (0 until nCh).foreach(_ => b.putShort((rnd.nextInt(400) + 16).toShort))
      (0 until 2 * nCh).foreach(_ => b.putShort(rnd.nextInt(65536).toShort))
      (0 until dataBytes).foreach(_ => b.put(rnd.nextInt(256).toByte))
      b.array()
    }
    // Mono, three full blocks.
    val m = Array.fill(3)(block(1, 25))
    val monoAlign = 7 + 25
    val audioM = Multimodal.decodeWav(
      wav(2, 1, 8000, 4, monoAlign, m.flatten)).get
    assert(audioM.channels === 1)
    assert(audioM.samples.toSeq === m.flatMap(msAdpcmRef(_, 1)).toSeq)
    // Stereo, two blocks, interleaved L/R per nibble.
    val s = Array.fill(2)(block(2, 40))
    val stereoAlign = 14 + 40
    val audioS = Multimodal.decodeWav(
      wav(2, 2, 8000, 4, stereoAlign, s.flatten)).get
    assert(audioS.channels === 2)
    assert(audioS.samples.toSeq === s.flatMap(msAdpcmRef(_, 2)).toSeq)
    // Invalid predictor index (> 6): drop, don't decode garbage.
    val bad = block(1, 25); bad(0) = 7
    assert(Multimodal.decodeWav(wav(2, 1, 8000, 4, monoAlign, bad)).isEmpty)
  }

  test("unknown formats refuse; supported ones flow through embed") {
    // A format tag nothing implements (0x5555) and a truncated fmt
    // chunk: honest None. (float64 and MS-ADPCM decode since r10 —
    // see their dedicated tests.)
    assert(Multimodal.decodeWav(
      wav(0x5555, 1, 8000, 16, 2, new Array[Byte](16))).isEmpty)
    assert(Multimodal.decodeWav(
      wav(1, 1, 8000, 24, 3, new Array[Byte](15))).isEmpty)
    // mu-law through the embed stage: histogram of the DECODED samples.
    import TestSpark._
    import spark.implicits._
    val pcm = Array.tabulate(500)(i => (math.sin(i * 0.1) * 20000).toShort)
    val bytes = wav(7, 1, 8000, 8, 1, pcm.map(s => muLawEncode(s).toByte))
    val emb = Multimodal.embed(
      Seq(Multimodal.MediaFile("t.wav", bytes.length, bytes)).toDS())
      .collect().head.embedding
    val dec = Multimodal.decodeWav(bytes).get.samples
    val expected = new Array[Double](8)
    dec.foreach(s => expected((s + 32768) >> 13) += 1.0)
    (0 until 8).foreach(i => expected(i) /= dec.length)
    assert(emb.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // The sine avoids the extreme bins — the real-decode signature.
    assert(emb(0) === 0.0 && emb(7) === 0.0)
  }

  test("hostile chunk sizes (negative / near Int.MaxValue) refuse, no hang") {
    // The RIFF walks must do their bounds math in Long: an Int check
    // wraps negative for sizes near Int.MaxValue, and a negative size
    // without a guard walks backwards forever.
    def crafted(sz: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(16).put("WAVE".getBytes)
      b.put("junk".getBytes).putInt(sz).putInt(0)
      b.array()
    }
    import TestSpark._
    import spark.implicits._
    for (sz <- Seq(-8, -1, 0x7FFFFFEC, Int.MaxValue)) {
      val c = crafted(sz)
      assert(Multimodal.decodeWav(c).isEmpty, s"sz=$sz")
      // meta path: must terminate and not throw
      val meta = Multimodal.decodeMeta(Seq(
        Multimodal.MediaFile("x.wav", c.length, c)).toDS()).collect().head
      assert(meta.format === "wav")
    }
    // A truncated FINAL data chunk must still decode the bytes present.
    val good = wav(1, 1, 8000, 16, 2,
      Array[Byte](1, 0, 2, 0, 3, 0, 4, 0))
    val trunc = good.take(good.length - 4) // data declares 8, carries 4
    val dec = Multimodal.decodeWav(trunc)
    assert(dec.isDefined && dec.get.samples.length === 2)
  }

  test("float32 PCM decodes clamp-scaled to int16") {
    val vals = Array(0f, 0.5f, -0.5f, 1f, -1f, 2f, -3f, Float.NaN)
    val data = new Array[Byte](vals.length * 4)
    val bb = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putFloat)
    val audio = Multimodal.decodeWav(wav(3, 1, 8000, 32, 4, data)).get
    // 0.5*32767 = 16383.5 rounds half-up to 16384; -16383.5 to -16383.
    assert(audio.samples.toSeq === Seq[Short](0, 16384, -16383, 32767,
      -32767, 32767, -32767, 0)) // clamp beyond ±1, NaN -> silence
  }
}
