package graft

/** Scratch within-JVM config A/B probe (dev tool, not a driver
  * surface): times registry queries under two RUNTIME SQL-conf
  * settings, interleaving A and B repetitions so the r21 host's 2-6x
  * performance swings hit both arms equally — the only reliable way to
  * compare configs on this hardware (cross-JVM A/B was measured
  * noise-dominated).
  *
  * Usage: runMain graft.ConfAB "<confA>" "<confB>" <reps> q_a,q_b,...
  * where each conf is "k=v;k2=v2" ("" = session defaults).
  */
object ConfAB {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: ConfAB confA confB reps queries")
    val confA = args(0); val confB = args(1)
    val reps = args(2).toInt
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Local.session(defaultCpus = "32", fair = true)
    def parse(c: String): Seq[(String, String)] =
      c.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val (a, b) = (parse(confA), parse(confB))
    // warm stages like Bench so first-touch builds don't pollute arm A
    try {
      ops.Relational.flagship(spark, sfDir).count()
      Tables.events(spark, sfDir).count()
      ops.Clustering.warmKmeansStages(spark, sfDir)
      ops.Sketches.warmIvfStage(spark, sfDir)
      ops.Sketches.warmPqStage(spark, sfDir)
      ops.Sketches.warmMinhashStage(spark, sfDir)
      ops.TextSim.warmStages(spark, sfDir)
      ops.Sketches.warmSimhashStage(spark, sfDir)
      ops.Sketches.warmMinhashCappedStage(spark, sfDir)
      ops.Sketches.warmDedupLshStage(spark, sfDir)
      ops.Sketches.warmLshSigStage(spark, sfDir)
      ops.TextSim.warmBigramStage(spark, sfDir)
      ops.TextSim.warmDocGramStage(spark, sfDir)
      ops.TextSim.warmMaskStage(spark, sfDir)
      ops.Graph.warmGraphStages(spark, sfDir)
      ops.TextSim.warmTextStatStages(spark, sfDir)
      ops.Learn.warmLearnStages(spark, sfDir)
    } catch { case e: Throwable =>
      System.err.println(s"confab: warm failed: ${e.getMessage}") }
    def withConf(kvs: Seq[(String, String)])(body: => Unit): Unit = {
      val saved = kvs.map { case (k, _) =>
        (k, try Some(spark.conf.get(k)) catch { case _: Throwable => None }) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // one untimed warm run per arm
      withConf(a)(fn(spark, sfDir).count())
      withConf(b)(fn(spark, sfDir).count())
      val ta = collection.mutable.ArrayBuffer[Double]()
      val tb = collection.mutable.ArrayBuffer[Double]()
      (1 to reps).foreach { _ =>
        withConf(a) {
          val t0 = System.nanoTime(); fn(spark, sfDir).count()
          ta += (System.nanoTime() - t0) / 1e9
        }
        withConf(b) {
          val t0 = System.nanoTime(); fn(spark, sfDir).count()
          tb += (System.nanoTime() - t0) / 1e9
        }
      }
      def st(xs: Seq[Double]) =
        f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
      println(s"CONFAB $n A[${st(ta.toSeq)}] B[${st(tb.toSeq)}]")
    }
    spark.stop()
  }
}
