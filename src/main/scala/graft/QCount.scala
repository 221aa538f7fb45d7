package graft

/** Scratch per-query cost-shape probe (dev tool, not a driver
  * surface): for every registry query (or an explicit list), runs the
  * query ONCE after the same stage warmup as Bench and records the
  * DETERMINISTIC execution shape — Spark jobs, stages, tasks — plus
  * wall seconds, and writes the post-run `explain("formatted")` plan
  * to a file. On the r21 host, wall time swings 2-6x run-to-run
  * (hypervisor weather) while the job/stage/task counts are exact, so
  * shape deltas are the reliable before/after evidence for
  * optimization work; wall is recorded as a sanity envelope only.
  *
  * Usage: runMain graft.QCount <outDir> [suffix] [q_a,q_b,...]
  * Writes <outDir>/qcounts_<suffix>.tsv and <outDir>/<query>_<suffix>.txt
  * (plans). Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS /
  * SPARK_GRAFT_CONF / SPARK_GRAFT_STAGE_THREADS.
  */
object QCount {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/qcount")
    val suffix = if (args.length > 1) args(1) else "before"
    val onlySet = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
    else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Local.session(defaultCpus = "32", fair = true)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks.toLong); ()
        }
      })

    // Same warmup + stage build as Bench so lazily-built artifacts are
    // never charged to the query that happens to touch them first.
    try {
      ops.Relational.flagship(spark, sfDir).count()
      Tables.events(spark, sfDir).count()
    } catch { case _: Throwable => () }
    Seq[() => Unit](
      () => ops.Clustering.warmKmeansStages(spark, sfDir),
      () => ops.Sketches.warmIvfStage(spark, sfDir),
      () => ops.Sketches.warmPqStage(spark, sfDir),
      () => ops.Sketches.warmMinhashStage(spark, sfDir),
      () => ops.TextSim.warmStages(spark, sfDir),
      () => ops.Sketches.warmSimhashStage(spark, sfDir),
      () => ops.Sketches.warmMinhashCappedStage(spark, sfDir),
      () => ops.Sketches.warmDedupLshStage(spark, sfDir),
      () => ops.Sketches.warmLshSigStage(spark, sfDir),
      () => ops.TextSim.warmBigramStage(spark, sfDir),
      () => ops.TextSim.warmDocGramStage(spark, sfDir),
      () => ops.TextSim.warmMaskStage(spark, sfDir),
      () => ops.Graph.warmGraphStages(spark, sfDir),
      () => ops.TextSim.warmTextStatStages(spark, sfDir),
      () => ops.Learn.warmLearnStages(spark, sfDir)
    ).foreach(f => try f() catch { case e: Throwable =>
      System.err.println(s"qcount: warm failed: ${e.getMessage}") })

    val names = SparkEntry.queries.keySet.toSeq.sorted
      .filter(n => onlySet.forall(_.contains(n)))
    val out = new StringBuilder("query\tjobs\tstages\ttasks\twall_s\n")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      spark.sparkContext.setJobDescription(n)
      val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case e: Throwable =>
        System.err.println(s"qcount: $n failed: ${e.getMessage}"); false }
      val w = (System.nanoTime() - t0) / 1e9
      val (j1, s1, k1) = (jobs.get, stages.get, tasks.get)
      out.append(f"$n\t${j1 - j0}\t${s1 - s0}\t${k1 - k0}\t$w%.3f" +
        (if (ok) "" else "\tERROR") + "\n")
      // The executed plan AFTER the run (AQE final plan where shown).
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      } catch { case e: Throwable =>
        System.err.println(s"qcount: $n explain failed: ${e.getMessage}") }
    }
    spark.sparkContext.setJobDescription(null)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, s"qcounts_$suffix.tsv"), out.toString)
    println(s"QCOUNT wrote $outDir/qcounts_$suffix.tsv (${names.length} queries)")
    spark.stop()
  }
}
