package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Q-DEDUP-CDC: the content-defined chunker's distinguishing property —
  * INSERTION ROBUSTNESS. Chunk boundaries are a function of token
  * content alone (md5(token) LIKE '0%'), so editing a document
  * perturbs only the chunk containing the edit while every downstream
  * boundary re-synchronizes; a fixed-size grid (q_dedup_chunks'
  * 10-word slices) shifts EVERY later chunk after an insertion and
  * loses all downstream reuse. This spec pins both halves of that
  * contrast — without it the operator is just a slower spelling of the
  * grid. The driver's DuckDB oracle hash-checks the aggregate query;
  * this pins the per-chunk behavior the aggregate can't see.
  */
class CdcChunkSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Deterministic lowercase word pool; tokenizer-transparent. */
  private def word(i: Int): String = s"w${i}x${(i * 7919) % 97}"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Per-doc ordered chunk texts via the SHARED production chunker. */
  private def chunksOf(docs: Map[Long, String]): Map[Long, Seq[String]] = {
    val df = docs.toSeq.toDF("doc_id", "text")
    graft.ops.TextSim.cdcChunks(df)
      .select("doc_id", "idx", "chunk").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getString(2)).toSeq
      }
  }

  test("insertion perturbs one chunk; downstream boundaries re-sync") {
    val base = (0 until 200).map(word)
    // A boundary-free insertion (no word's md5 starts with '0'), so
    // the containing chunk grows but does not split — the cleanest
    // statement of the property. Boundary-carrying insertions only
    // ADD chunks inside the edit region; downstream is unaffected
    // either way (next test covers the corpus-level consequence).
    val ins = (1000 until 2000).map(word)
      .filterNot(w => md5hex(w).startsWith("0")).take(8)
    assert(ins.size === 8)
    val edited = base.take(100) ++ ins ++ base.drop(100)

    val ch = chunksOf(Map(1L -> base.mkString(" "),
      2L -> edited.mkString(" ")))
    val (a, b) = (ch(1L), ch(2L))

    // Multiset symmetric difference: exactly the one containing chunk
    // on each side (its pre-insertion and post-insertion spellings).
    val onlyA = a.diff(b)
    val onlyB = b.diff(a)
    assert(onlyA.size === 1 && onlyB.size === 1,
      s"expected 1 perturbed chunk per side, got A=$onlyA B=$onlyB")
    // The perturbed chunk really is the edit site: B's version is A's
    // version with the inserted words spliced in.
    assert(onlyB.head.split(' ').count(ins.contains) === 8)
    // Common prefix + common suffix covers everything but the edit:
    // downstream chunks are IDENTICAL TEXTS, not just similar.
    val pre = a.zip(b).takeWhile { case (x, y) => x == y }.size
    val suf = a.reverse.zip(b.reverse)
      .takeWhile { case (x, y) => x == y }.size
    assert(pre + suf === a.size - 1 && pre + suf === b.size - 1)
  }

  test("fixed grid loses downstream reuse on the same edit; CDC keeps it") {
    val base = (0 until 200).map(word)
    val ins = (1000 until 2000).map(word)
      .filterNot(w => md5hex(w).startsWith("0")).take(8)
    val edited = base.take(100) ++ ins ++ base.drop(100)

    // CDC: shared chunks between original and edited ≈ all of them.
    val ch = chunksOf(Map(1L -> base.mkString(" "),
      2L -> edited.mkString(" ")))
    val cdcShared = ch(1L).intersect(ch(2L)).size
    assert(cdcShared === ch(1L).size - 1)

    // Fixed 10-word grid (q_dedup_chunks' chunking): everything after
    // the insertion shifts phase — shared chunks collapse to the
    // prefix before the edit.
    def grid(ws: Seq[String]): Seq[String] =
      ws.grouped(10).map(_.mkString(" ")).toSeq
    val gridShared = grid(base).intersect(grid(edited)).size
    assert(gridShared <= 10, s"grid unexpectedly re-synced: $gridShared")
    assert(cdcShared > gridShared,
      s"CDC ($cdcShared) must beat the grid ($gridShared) on insertions")
  }

  test("chunks partition the token stream exactly (no loss, no overlap)") {
    val docs = Map(
      1L -> (0 until 57).map(word).mkString(" "),
      2L -> "solo",
      3L -> (500 until 530).map(word).mkString(" "))
    val ch = chunksOf(docs)
    for ((id, text) <- docs) {
      val toks = text.split(' ').toSeq
      assert(ch(id).flatMap(_.split(' ')) === toks,
        s"doc $id: concatenated chunks != token stream")
      // Every non-initial chunk starts at a content-defined boundary.
      ch(id).drop(1).foreach(c =>
        assert(md5hex(c.split(' ').head).startsWith("0")))
    }
  }
}
