package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: per-artifact timing of the Bench warm pass
  * (`sbt "Test/runMain graft.StageBuildTime /root/testdata/sf0.1"`) —
  * shows where stage_build goes.
  */
object StageBuildTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graftnative.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.documents(spark, dir).count() // warmup
    Tables.embeddings(spark, dir).count()
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    t("postings") {
      graft.ops.TextSim.gramPostings(spark, dir, graft.ops.TextSim.DfCap).count()
    }
    t("paircounts+edges") { graft.ops.TextSim.warmStages(spark, dir) }
    t("charset attrs") { graft.ops.TextSim.warmMaskStage(spark, dir) }
    t("ivf cb+assign") { graft.ops.Sketches.warmIvfStage(spark, dir) }
    t("pq cb+codes") { graft.ops.Sketches.warmPqStage(spark, dir) }
    t("lsh sig table") { graft.ops.Sketches.warmLshSigStage(spark, dir) }
    t("simhash sigs") { graft.ops.Sketches.warmSimhashStage(spark, dir) }
    t("minhash bands") { graft.ops.Sketches.warmMinhashStage(spark, dir) }
    t("all warm re-run") {
      graft.ops.TextSim.warmStages(spark, dir)
      graft.ops.Sketches.warmStages(spark, dir)
      graft.ops.Sketches.warmSigStage(spark, dir)
    }
    spark.stop()
  }
}
