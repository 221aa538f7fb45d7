package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable README: the Quickstart section's fenced code blocks are
  * pinned VERBATIM here and then actually run, so the front-door
  * documentation cannot drift from the library (the CliSpec discipline
  * applied to docs). If you edit README.md's Quickstart, this spec
  * tells you exactly which block to update — and if you change an API
  * a snippet uses, the run half fails before a user ever sees it.
  */
class QuickstartSpec extends AnyFunSuite {
  import TestSpark._

  private def quickstartBlocks: Seq[String] = {
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val section = readme.split("## Quickstart", 2)(1).split("\n## ", 2)(0)
    "(?s)```(?:scala|bash)\n(.*?)```".r
      .findAllMatchIn(section).map(_.group(1).trim).toSeq
  }

  test("README quickstart has exactly the six pinned blocks") {
    val blocks = quickstartBlocks
    assert(blocks.length === 6, s"expected 6 fenced blocks, got ${blocks.length}")
    assert(blocks(0) ===
      """import graft.{Tables, Registry}
        |val docs = Tables.documents(spark, sfDir)
        |val agg  = Registry.byName("q_agg_group").df(spark, sfDir)
        |agg.show(3)""".stripMargin)
    assert(blocks(1) ===
      """graft.Cli sql "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY n DESC, lang" $SF_DIR /tmp/graft_sql_out""")
    assert(blocks(2) ===
      """import graft.ops.Sketches
        |val queries = Sketches.defaultQueries(spark, sfDir)
        |val hits = Sketches.ivfSearch(spark, sfDir, queries,
        |  nprobe = c => math.max(1, (c * 3) / 10), k = 3)
        |hits.show(5)""".stripMargin)
    assert(blocks(3) ===
      """val verdicts = Sketches.ingestBatch(spark, sfDir,
        |  Sketches.defaultBatch(spark, sfDir), name = "quickstart")
        |verdicts.groupBy("is_dup").count().show()""".stripMargin)
    assert(blocks(4) ===
      """import graft.ops.Clustering
        |import org.apache.spark.sql.functions.col
        |val dedup = Clustering.semanticDedup(spark, sfDir, k = 8)
        |dedup.filter(col("n_nbrs") > 0).show(5)""".stripMargin)
    assert(blocks(5) ===
      """graft.Graft.registerAll(spark, sfDir)
        |spark.sql("SELECT source, count(*) AS n FROM documents GROUP BY source ORDER BY n DESC, source").show()
        |spark.sql("SELECT a.vec_id AS qa, b.vec_id AS qb, graft_dot(a.embedding, b.embedding) AS cos FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id ORDER BY cos DESC, qa LIMIT 3").show()""".stripMargin)
  }

  test("block 1 runs: table loader + registry query by name") {
    val sfDir = sf
    // -- verbatim from README (show() output suppressed to the log) --
    import graft.{Tables, Registry}
    val docs = Tables.documents(spark, sfDir)
    val agg  = Registry.byName("q_agg_group").df(spark, sfDir)
    agg.show(3)
    // -- sanity beyond the snippet --
    assert(docs.count() > 0)
    assert(agg.count() > 0)
  }

  test("block 2 runs: the CLI sql verb with the exact statement") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_quickstart_sql").toString + "/out"
    Cli.runSql(spark,
      "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY n DESC, lang",
      sf, out)
    val lines = spark.read.text(out).collect().map(_.getString(0))
    assert(lines.length === 5, s"expected 5 langs, got ${lines.toSeq}")
    assert(lines.forall(_.matches("[a-z]{2}\t\\d+")), lines.toSeq)
  }

  test("block 3 runs: ANN index build + search with (qid, qv) queries") {
    val sfDir = sf
    import graft.ops.Sketches
    val queries = Sketches.defaultQueries(spark, sfDir)
    val hits = Sketches.ivfSearch(spark, sfDir, queries,
      nprobe = c => math.max(1, (c * 3) / 10), k = 3)
    hits.show(5)
    val rows = hits.collect()
    assert(rows.nonEmpty)
    // contract: per-query ranks 1..k, neighbor is never the query itself
    assert(rows.forall(r => r.getInt(3) >= 1 && r.getInt(3) <= 3))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("block 4 runs: incremental dedup ingest into a named index") {
    val sfDir = sf
    import graft.ops.Sketches
    val verdicts = Sketches.ingestBatch(spark, sfDir,
      Sketches.defaultBatch(spark, sfDir), name = "quickstart")
    verdicts.groupBy("is_dup").count().show()
    val counts = verdicts.groupBy("is_dup").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    // the fixture batch is half verbatim dups, half novel reversals
    assert(counts.getOrElse(true, 0L) > 0, s"no dups caught: $counts")
    assert(counts.getOrElse(false, 0L) > 0, s"nothing admitted: $counts")
  }

  test("block 5 runs: public semantic dedup at an explicit k") {
    val sfDir = sf
    import graft.ops.Clustering
    import org.apache.spark.sql.functions.col
    val dedup = Clustering.semanticDedup(spark, sfDir, k = 8)
    dedup.filter(col("n_nbrs") > 0).show(5)
    // one row per vector; the fixture corpus carries genuine near-dups
    assert(dedup.count() === Tables.embeddings(spark, sfDir).count())
    assert(dedup.filter(col("n_nbrs") > 0).count() > 0)
  }

  test("block 6 runs: registerAll then pure spark.sql one-liners") {
    val sfDir = sf
    // -- verbatim from README --
    graft.Graft.registerAll(spark, sfDir)
    spark.sql("SELECT source, count(*) AS n FROM documents GROUP BY source ORDER BY n DESC, source").show()
    spark.sql("SELECT a.vec_id AS qa, b.vec_id AS qb, graft_dot(a.embedding, b.embedding) AS cos FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id ORDER BY cos DESC, qa LIMIT 3").show()
    // -- sanity beyond the snippet --
    val srcs = spark.sql(
      "SELECT source, count(*) AS n FROM documents GROUP BY source").collect()
    assert(srcs.length > 1 && srcs.forall(_.getLong(1) > 0))
    val top = spark.sql("SELECT a.vec_id AS qa, b.vec_id AS qb, " +
      "graft_dot(a.embedding, b.embedding) AS cos FROM embeddings a " +
      "JOIN embeddings b ON a.vec_id < b.vec_id " +
      "ORDER BY cos DESC, qa LIMIT 3").collect()
    assert(top.length === 3)
    // the fixture plants cos >= 0.4 near-dup pairs (the q_dedup_cosine
    // bar) — the SQL-surface top-3 must surface them
    assert(top.forall(_.getDouble(2) > 0.4), top.mkString(","))
    // every fixture table answers through its view, with the recipe
    // loaders applied (a raw events view would throw on the ns type)
    graft.Graft.TableNames.foreach { t =>
      assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) > 0,
        s"view $t is empty")
    }
    // and events timestamps came through the normalization recipe
    assert(spark.sql("SELECT count(*) FROM events WHERE ts IS NOT NULL")
      .head().getLong(0) > 0)
  }

  test("registerAll tolerates a partial dataset dir (the CLI contract)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_partial_ds").toString
    Tables.documents(spark, sf).write
      .parquet(Tables.path(dir, "documents"))
    val s2 = spark.newSession()
    graft.Graft.registerAll(s2, dir) // must not throw on 9 missing tables
    assert(s2.sql("SELECT count(*) FROM documents").head().getLong(0) > 0)
    val ex = intercept[Exception] {
      s2.sql("SELECT count(*) FROM lineitem").collect()
    }
    assert(ex.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"),
      s"unexpected failure shape: ${ex.getMessage.take(200)}")
  }
}
