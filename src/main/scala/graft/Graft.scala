package graft

import org.apache.spark.sql.SparkSession

/** The one-call ad-hoc SQL surface (r14 verdict #3): FileMap's ethos
  * is ad-hoc one-liners, and until this the engine's public faces were
  * the Scala registry and the fm-style CLI. `registerAll` exposes a
  * data directory's ten tables as temp views (through [[Tables]], so
  * the events-timestamp and embeddings-double recipes apply — a raw
  * view over the parquet would throw on events and silently degrade
  * similarity math on embeddings) plus the graft_* SQL functions, so
  * any session can immediately run
  *
  * {{{
  * graft.Graft.registerAll(spark, "/data/sf0.1")
  * spark.sql("SELECT lang, count(*) FROM documents GROUP BY lang")
  * spark.sql("SELECT graft_dot(a.embedding, b.embedding) ...")
  * }}}
  *
  * Views are session-scoped temp views: no catalog writes, no
  * metastore, re-callable with a different dir to repoint (the
  * create-or-replace semantics). Function registration is late-bound
  * through the same descriptions the `.withExtensions` hook injects,
  * so sessions built without the extension get identical SQL names.
  */
object Graft {

  /** Every fixture table (TESTDATA.md) — the ONE copy of this list
    * (Cli.runSql shares it, r15 review #4). */
  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Missing tables are skipped, matching the CLI's long-standing
    * tolerance: a partial dataset dir still serves the tables it has
    * (querying an unregistered view fails with Spark's own
    * TABLE_OR_VIEW_NOT_FOUND, which names the problem). */
  def registerAll(s: SparkSession, dir: String): Unit = {
    TableNames.foreach { t =>
      if (java.nio.file.Files.exists(
          java.nio.file.Paths.get(Tables.path(dir, t))))
        Tables(s, dir, t).createOrReplaceTempView(t)
    }
    org.apache.spark.sql.graftnative.GraftExtensions.registerOn(s)
  }
}
