package graft

/** Scratch stage-build profiling probe (dev tool, not a driver
  * surface): times each stage-cache chain SERIALLY in one JVM — the
  * concurrent FAIR pre-pass in Bench equalizes every chain's wall time
  * under contention, so per-chain attribution needs an isolated run.
  * `runMain graft.StageWarmProbe [serial|concurrent]` (default serial).
  * Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_CONF.
  */
object StageWarmProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("serial")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Local.session(defaultCpus = "32", fair = true)
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
    def counts(): (Long, Long, Long) = (jobs.get, stages.get, tasks.get)
    // same warmup as Bench
    try {
      ops.Relational.flagship(spark, sfDir).count()
      Tables.events(spark, sfDir).count()
    } catch { case _: Throwable => () }
    val chains: Seq[(String, () => Unit)] = Seq(
      "text_postings" -> (() => ops.TextSim.warmStages(spark, sfDir)),
      "docgrams" -> (() => ops.TextSim.warmDocGramStage(spark, sfDir)),
      "bigrams" -> (() => ops.TextSim.warmBigramStage(spark, sfDir)),
      "mask" -> (() => ops.TextSim.warmMaskStage(spark, sfDir)),
      "ivf" -> (() => ops.Sketches.warmIvfStage(spark, sfDir)),
      "pq" -> (() => ops.Sketches.warmPqStage(spark, sfDir)),
      "lsh_sigs" -> (() => ops.Sketches.warmLshSigStage(spark, sfDir)),
      "dedup_lsh_sigs" -> (() => ops.Sketches.warmDedupLshStage(spark, sfDir)),
      "simhash_sigs" -> (() => ops.Sketches.warmSimhashStage(spark, sfDir)),
      "minhash_sigs" -> (() => ops.Sketches.warmMinhashStage(spark, sfDir)),
      // r21's warm additions, probed too since r22 (the Lloyd M-step
      // fuse evidence lives in the kmeans/ivf/pq chain counts):
      "minhash_capped" -> (() => ops.Sketches.warmMinhashCappedStage(spark, sfDir)),
      "graph" -> (() => ops.Graph.warmGraphStages(spark, sfDir)),
      "text_stats" -> (() => ops.TextSim.warmTextStatStages(spark, sfDir)),
      "learn" -> (() => ops.Learn.warmLearnStages(spark, sfDir)),
      "kmeans" -> (() => ops.Clustering.warmKmeansStages(spark, sfDir)))
    val t0 = System.nanoTime()
    if (mode == "concurrent" || mode.startsWith("pool")) {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.DurationInt
      val width =
        if (mode == "concurrent") chains.size
        else mode.stripPrefix("pool").toInt
      val pool = java.util.concurrent.Executors.newFixedThreadPool(width)
      // shutdown on the finally path: a failed/timed-out Await must not
      // leave non-daemon pool threads keeping the JVM alive (r21 advice).
      try {
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        Await.result(Future.sequence(chains.map { case (name, body) =>
          Future {
            val t = System.nanoTime()
            body()
            println(f"STAGE $name ${(System.nanoTime() - t) / 1e9}%.3f s")
          }
        }), 60.minutes)
      } finally pool.shutdown()
    } else {
      chains.foreach { case (name, body) =>
        val (j0, s0, k0) = counts()
        val t = System.nanoTime()
        body()
        val (j1, s1, k1) = counts()
        println(f"STAGE $name ${(System.nanoTime() - t) / 1e9}%.3f s " +
          s"jobs=${j1 - j0} stages=${s1 - s0} tasks=${k1 - k0}")
      }
    }
    val (jt, st, kt) = counts()
    println(f"STAGE_TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s mode=$mode " +
      s"jobs=$jt stages=$st tasks=$kt")
    spark.stop()
  }
}
