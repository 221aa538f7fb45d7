package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graftnative.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.embeddings(spark, dir).count()
    graft.ops.Sketches.warmSigStage(spark, dir)
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    t("candidates only") {
      graft.ops.Sketches.lshCandidates(spark, dir).count()
    }
    t("candidates again") {
      graft.ops.Sketches.lshCandidates(spark, dir).count()
    }
    t("full q_sim_ann_lsh") {
      Registry.byName("q_sim_ann_lsh").df(spark, dir).count()
    }
    t("full again") {
      Registry.byName("q_sim_ann_lsh").df(spark, dir).count()
    }
    spark.stop()
  }
}
