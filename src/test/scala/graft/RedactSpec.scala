package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit contracts of the chunk-dedup and PII-redaction operators. The
  * fixture corpus contains no PII (the oracle run pins cross-engine
  * pass-through parity); the actual redaction semantics are pinned
  * here on synthetic PII rows.
  */
class RedactSpec extends AnyFunSuite {
  import TestSpark._
  import graft.ops.TextSim

  private def redact(text: String): (String, Int) = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(
        regexp_replace(col("text"), TextSim.PiiRegex, "<pii>").as("clean"),
        size(regexp_extract_all(col("text"), lit(TextSim.PiiRegex), lit(0)))
          .as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1))).head
  }

  test("PII redaction scrubs emails, IPs, SSN- and card-shaped runs") {
    assert(redact("contact alice.b@example.com for details")
      === ("contact <pii> for details", 1))
    assert(redact("served from 10.0.255.1 port open")
      === ("served from <pii> port open", 1))
    assert(redact("ssn 123-45-6789 on file")
      === ("ssn <pii> on file", 1))
    assert(redact("card 4111111111111111 charged")
      === ("card <pii> charged", 1))
    // Multiple hits count individually; non-PII digits survive.
    assert(redact("a@b.io met b@c.io at 1.2.3.4")
      === ("<pii> met <pii> at <pii>", 3))
    assert(redact("version 2 of 10 files") === ("version 2 of 10 files", 0))
    // 12 digits: too short for the card shape; 13 matches.
    assert(redact("order 123456789012 ok") === ("order 123456789012 ok", 0))
    assert(redact("order 1234567890123 ok") === ("order <pii> ok", 1))
  }

  test("encoding-damage signatures: fffd / mojibake / control classes fire and stay disjoint") {
    import spark.implicits._
    def counts(text: String): (Int, Int, Int) =
      Seq(text).toDF("text").select(
        size(regexp_extract_all(col("text"), lit(TextSim.FffdRegex), lit(0))),
        size(regexp_extract_all(col("text"), lit(TextSim.MojiRegex), lit(0))),
        size(regexp_extract_all(col("text"), lit(TextSim.CtrlRegex), lit(0))))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).head
    // Each signature fires on its artifact and ONLY its artifact.
    assert(counts("lossy caf�s here") === ((1, 0, 0)))
    // 'cafÃ©' — é's UTF-8 bytes decoded as Latin-1 (C3 A9 -> Ã©).
    assert(counts("cafÃ© menu") === ((0, 1, 0)))
    // 'â€™' — curly quote mojibake: â is NOT U+00C3, only the Ã-pair
    // class is claimed (documented narrowness, zero false positives).
    assert(counts("donâ€™t") === ((0, 0, 0)))
    assert(counts("bell\u0007 and c1\u0085 and del\u007F") === ((0, 0, 3)))
    // Clean text — including the chars NEAR every boundary: tab, LF,
    // CR (excluded from the control class), plain é (U+00E9), Ã alone
    // before ASCII (not a continuation char).
    assert(counts("café\tok\nnew\rline Ã x") === ((0, 0, 0)))
    // A doc carrying all three classes counts each independently.
    assert(counts("\uFFFD\u00C3\u00A9\u0007") === ((1, 1, 1)))
  }

  test("q_text_redact is a verified pass-through on the clean fixture corpus") {
    val joined = q("q_text_redact")
      .join(Tables.documents(spark, sf), "doc_id")
      .select(col("n_pii"), (col("clean_md5") === md5(col("text"))).as("same"))
      .collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getInt(0) === 0 && r.getBoolean(1)),
      "fixture corpus unexpectedly contains PII-shaped text")
  }

  test("chunk dedup finds the exact-dup docs' chunks and only consistent counts") {
    val rows = q("q_dedup_chunks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // Every doc appears once; fractions are consistent.
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.foreach { case (id, n, dup, frac) =>
      assert(dup <= n, s"doc $id: $dup dups of $n chunks")
      assert(math.abs(frac - dup.toDouble / n) < 1e-6)
    }
    // Independent accounting identity: every occurrence beyond a chunk
    // text's first is a duplicate, so the summed per-doc dup counts
    // must equal (total occurrences - distinct chunk texts) — and the
    // fixture's near-dup docs make that non-zero.
    val chunked = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(posexplode(expr(
        "transform(sequence(0, CAST(ceil(size(ws) / 10.0) AS INT) - 1)," +
          " i -> array_join(slice(ws, i * 10 + 1, 10), ' '))"))
        .as(Seq("idx", "chunk")))
    val occ = chunked.count()
    val distinct = chunked.select("chunk").distinct().count()
    val totalDup = rows.map(_._3).sum
    assert(totalDup === occ - distinct,
      s"dup accounting broken: $totalDup != $occ - $distinct")
    assert(totalDup > 0, "no duplicate chunks found on the near-dup fixture")
  }
}
