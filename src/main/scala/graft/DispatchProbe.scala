package graft

/** Scratch scheduler-overhead probe (dev tool, not a driver surface):
  * times trivially-small jobs at several partition counts to separate
  * per-task dispatch cost from real work — the r21 host burns ~10x
  * more SYSTEM than user CPU during multi-task phases (futex/park
  * syscalls are expensive under this hypervisor), so the probe
  * quantifies what one extra task/stage costs before any query tuning.
  * Honors SPARK_GRAFT_CPUS and SPARK_GRAFT_CONF like every main.
  */
object DispatchProbe {
  def main(args: Array[String]): Unit = {
    val spark = Local.session(defaultCpus = "32")
    val sc = spark.sparkContext
    def best(n: Int)(body: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
    // warmup
    sc.parallelize(1 to 32, 32).count()
    spark.range(1000).selectExpr("sum(id)").collect()
    for (p <- Seq(1, 4, 8, 16, 32, 64)) {
      val t = best(5)(sc.parallelize(1 to p, p).count())
      println(f"PROBE rdd_noop p=$p%-3d $t%.4f s")
    }
    for (p <- Seq(1, 8, 32)) {
      val t = best(5) {
        spark.range(100000).repartition(p).groupBy().count().collect()
      }
      println(f"PROBE shuffle p=$p%-3d $t%.4f s")
    }
    // one full SQL round-trip with AQE (tiny agg over parquet)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t = best(5) {
      Tables.documents(spark, sfDir).groupBy("lang").count().collect()
    }
    println(f"PROBE sql_groupby $t%.4f s")
    spark.stop()
  }
}
