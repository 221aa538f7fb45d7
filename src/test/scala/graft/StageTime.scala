package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: time the dedup-family stage builds at a given sf
  * dir (`sbt "Test/runMain graft.StageTime /root/testdata/sf0.1"`).
  * Shows where a cold q_curate spends its time.
  */
object StageTime {
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
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    // warmup
    Tables.documents(spark, dir).count()
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    t("docs scan+split") {
      docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), size(col("ws")).as("n")).agg(sum("n")).count()
    }
    t("old HOF gram explode") {
      docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(graft.ops.TextSim.wordGrams3("ws")).as("g"))
        .count()
    }
    t("native gram explode") {
      docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          explode(graft.functions.VectorFunctions.wordGramHashes(col("ws"))).as("g"))
        .count()
    }
    t("native + distinct") {
      docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          explode(graft.functions.VectorFunctions.wordGramHashes(col("ws"))).as("gram"))
        .distinct().count()
    }
    t("gramIndex build+count") {
      graft.ops.TextSim.gramIndex(spark, dir, graft.ops.TextSim.DfCap).count()
    }
    t("gramIndex re-read") {
      graft.ops.TextSim.gramIndex(spark, dir, graft.ops.TextSim.DfCap).count()
    }
    t("clusterLabels (edges build)") {
      graft.ops.TextSim.clusterLabels(spark, dir).count()
    }
    t("clusterLabels warm") {
      graft.ops.TextSim.clusterLabels(spark, dir).count()
    }
    t("q_curate warm") {
      Registry.byName("q_curate").df(spark, dir).count()
    }
    spark.stop()
  }
}
