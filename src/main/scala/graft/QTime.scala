package graft

import org.apache.spark.sql.SparkSession

/** Scratch single-query timing probe (dev tool, not a driver surface):
  * `runMain graft.QTime q_agg_wmedian ...` times each named registry
  * query on SPARK_GRAFT_SF_DIR (default sf0.1) with one untimed warm
  * run, Bench's session config.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Local.session(defaultCpus = "32")
    for (n <- args) {
      Registry.byName(n).df(spark, sfDir).collect()
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime
        Registry.byName(n).df(spark, sfDir).collect()
        (System.nanoTime - t0) / 1e9
      }.min
      println(f"TIMING $n $best%.3f s")
    }
    spark.stop()
  }
}
