package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Multimodal column pipeline: binaryFile scan → typed Dataset →
  * per-partition (stub) decode/embed → frame fan-out → similarity
  * handoff. The kernels are deterministic fakes (no codecs in this
  * environment); these tests pin the plumbing: schemas, batch shape,
  * determinism, and the join with the real vector kernels.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

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
}
