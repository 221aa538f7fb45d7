package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Capability demos for the non-parquet sources and the partitioned
  * sink (CAP-SRC-TEXT/CSV/JSON/BINARY, CAP-SINK-PART): round-trips
  * through tmp directories, plus the partition-pruning plan assert that
  * the partitioned layout exists to enable.
  */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._
  import graft.sources.Ingest

  private def tmpDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  test("CAP-SRC-TEXT: line-oriented text with file lineage") {
    val dir = tmpDir("graft_text")
    Files.writeString(dir.resolve("a.txt"), "alpha\nbeta\n")
    Files.writeString(dir.resolve("b.txt"), "gamma\n")
    val df = Ingest.lines(spark, dir.toString + "/*.txt")
    val rows = df.collect()
    assert(rows.length === 3)
    assert(rows.map(_.getString(1)).toSet === Set("alpha", "beta", "gamma"))
    // Lineage: every record knows its source file (per-file map model).
    assert(rows.filter(_.getString(1) == "gamma")
      .forall(_.getString(0).endsWith("b.txt")))
  }

  test("CAP-SRC-CSV: delimited with header + schema inference") {
    val dir = tmpDir("graft_csv")
    Files.writeString(dir.resolve("t.csv"), "id,name,score\n1,ada,9.5\n2,bob,7.0\n")
    val df = Ingest.csv(spark, dir.toString + "/*.csv")
    assert(df.schema("id").dataType.typeName === "integer")
    assert(df.schema("score").dataType.typeName === "double")
    assert(df.filter(col("name") === "ada").select("score")
      .head().getDouble(0) === 9.5)
  }

  test("CAP-SRC-JSON: newline-delimited JSON with nested fields") {
    val dir = tmpDir("graft_json")
    Files.writeString(dir.resolve("t.json"),
      """{"id": 1, "tags": ["x", "y"], "meta": {"lang": "en"}}
        |{"id": 2, "tags": [], "meta": {"lang": "fr"}}
        |""".stripMargin)
    val df = Ingest.jsonLines(spark, dir.toString + "/*.json")
    assert(df.count() === 2)
    assert(df.select(col("meta.lang")).collect().map(_.getString(0)).toSet
      === Set("en", "fr"))
    assert(df.filter(col("id") === 1).select(size(col("tags")))
      .head().getInt(0) === 2)
  }

  test("CAP-SRC-JSON-QUARANTINE: bad lines route to _corrupt verbatim, good rows parse") {
    val dir = tmpDir("graft_jsonq")
    Files.writeString(dir.resolve("t.json"),
      """{"id": 1, "v": "ok"}
        |{"id": oops not json
        |{"id": 3, "v": "fine"}
        |{"id": "wrongtype", "v": "kept-null-id"}
        |""".stripMargin)
    val df = Ingest.jsonLinesQuarantine(spark, dir.toString + "/*.json",
      "id BIGINT, v STRING").cache()
    // Clean rows parse with NULL _corrupt; the syntactically-broken
    // line lands verbatim in quarantine; the type-mismatched row keeps
    // its parsable fields (PERMISSIVE null-fill) and is ALSO flagged.
    val clean = df.filter(col("_corrupt").isNull)
    assert(clean.count() === 2)
    assert(clean.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    val quarantined = df.filter(col("_corrupt").isNotNull)
      .select("_corrupt").collect().map(_.getString(0))
    assert(quarantined.length === 2)
    assert(quarantined.exists(_.contains("oops not json")))
    assert(quarantined.exists(_.contains("wrongtype")))
    // Nothing dropped: every input line is in exactly one of the sets.
    assert(df.count() === 4)
    df.unpersist()
  }

  test("CAP-SRC-CSV-QUARANTINE: wrong-typed rows flag, parsed fields survive") {
    val dir = tmpDir("graft_csvq")
    Files.writeString(dir.resolve("t.csv"),
      """id,lang,n
        |1,en,10
        |2,fr,notanumber
        |3,en,30
        |4,de,1e
        |""".stripMargin)
    val df = Ingest.csvQuarantine(spark, dir.toString + "/*.csv",
      "id BIGINT, lang STRING, n BIGINT")
    val clean = df.filter(col("_corrupt").isNull)
    assert(clean.count() === 2)
    assert(clean.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    // Corrupt rows carry the raw line verbatim AND keep the fields
    // that did parse — the quarantine stream stays groupable by lang.
    val bad = df.filter(col("_corrupt").isNotNull)
    assert(bad.count() === 2)
    assert(bad.select("lang").collect().map(_.getString(0)).toSet ===
      Set("fr", "de"))
    assert(bad.filter(col("n").isNull).count() === 2)
    val raw = bad.select("_corrupt").collect().map(_.getString(0))
    assert(raw.exists(_.contains("notanumber")) && raw.exists(_.contains("1e")))
    assert(df.count() === 4)
    df.unpersist()
  }

  test("CAP-SRC-TEXT: compression-transparent input (gzip)") {
    // FileMap pillar P8: zcat-in-the-pipeline; Spark's text source
    // decompresses by extension with no reader changes.
    val dir = tmpDir("graft_gz")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("a.txt.gz")))
    gz.write("packed\nlines\n".getBytes("UTF-8")); gz.close()
    val df = Ingest.lines(spark, dir.toString + "/*.txt.gz")
    assert(df.collect().map(_.getString(1)).toSet === Set("packed", "lines"))
  }

  test("CAP-SRC-BINARY: whole-file records carry exact bytes") {
    val dir = tmpDir("graft_bin")
    val payload = Array[Byte](1, 2, 3, 4, 5)
    Files.write(dir.resolve("x.bin"), payload)
    val df = Ingest.binaryFiles(spark, dir.toString + "/*.bin")
    val r = df.select("length", "content").head()
    assert(r.getLong(0) === payload.length.toLong)
    assert(r.getAs[Array[Byte]](1).toSeq === payload.toSeq)
  }

  test("CAP-SINK-CSV/JSON: non-parquet sinks round-trip") {
    val dir = tmpDir("graft_sinks")
    val df = Tables.nation(spark, sf)
    df.write.mode("overwrite").option("header", "true")
      .csv(dir.toString + "/csv")
    df.write.mode("overwrite").json(dir.toString + "/json")
    val backCsv = Ingest.csv(spark, dir.toString + "/csv")
    val backJson = Ingest.jsonLines(spark, dir.toString + "/json")
    assert(backCsv.count() === 25L && backJson.count() === 25L)
    assert(backCsv.select("n_name").collect().map(_.getString(0)).toSet
      === df.select("n_name").collect().map(_.getString(0)).toSet)
  }

  test("CAP-SRC-ORC: the second columnar format round-trips with pushdown") {
    val dir = tmpDir("graft_orc")
    val src = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    Ingest.writeOrc(src, dir.toString)
    val back = Ingest.orc(spark, dir.toString)
    assert(back.count() === src.count())
    assert(back.schema.fieldNames.toSet === src.schema.fieldNames.toSet)
    // Same content through an aggregation both ways.
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(agg(back) === agg(src))
    // Predicate pushdown reaches the ORC scan like the parquet one.
    val p = back.filter(col("l_quantity") > 25.0)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("l_quantity"),
      s"no pushdown into ORC scan:\n$p")
  }

  test("parquet schema evolution: mergeSchema unions file schemas") {
    val dir = tmpDir("graft_evolve").toString + "/t"
    spark.range(3).selectExpr("id", "id * 2 AS a")
      .write.mode("append").parquet(dir)
    spark.range(3, 6).selectExpr("id", "id * 10 AS b")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("a", "b", "id"))
    assert(merged.count() === 6L)
    // Files lacking a column read it as null, not as an error.
    assert(merged.filter(col("a").isNull).count() === 3L)
  }

  test("explicit bucket-count control: repartition(n, col) shapes the plan") {
    val df = Tables.lineitem(spark, sf).repartition(7, col("l_orderkey"))
    assert(df.rdd.getNumPartitions === 7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(l_orderkey"), plan)
    // All rows of one key land in one partition (the co-location
    // guarantee downstream joins/aggs rely on).
    val spread = df.select(col("l_orderkey"))
      .withColumn("p", spark_partition_id())
      .groupBy("l_orderkey").agg(countDistinct(col("p")).as("np"))
      .filter(col("np") > 1).count()
    assert(spread === 0L)
  }

  test("CAP-SINK-PART: partitioned parquet layout enables partition pruning") {
    val dir = tmpDir("graft_part").toString + "/docs"
    val docs = Tables.documents(spark, sf)
    Ingest.writePartitioned(docs, dir, "lang")
    // The layout mirrors the partition column (FileMap's output tree).
    val sub = new java.io.File(dir).listFiles().map(_.getName)
    assert(sub.exists(_.startsWith("lang=")), sub.mkString(","))
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    // Static partition pruning: the lang filter must land in
    // PartitionFilters, not a post-scan Filter over all partitions.
    val plan = back.filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter not pruned:\n$plan")
    assert(back.filter(col("lang") === "en").count()
      === docs.filter(col("lang") === "en").count())
  }
}
