package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CsProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graftnative.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    docs.count()
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    t("baseline count") { docs.count() }
    t("cs via split/distinct/sort") {
      docs.select(col("doc_id"),
        array_join(array_sort(array_distinct(split(col("text"), ""))), "").as("cs"))
        .agg(sum(length(col("cs")))).collect()
    }
    t("27 contains masks (old)") {
      val mask = (Seq(' ') ++ ('a' to 'z')).zipWithIndex
        .map { case (c, b) => when(col("text").contains(c.toString), lit(1L << b)).otherwise(0L) }
        .reduce(_ bitwiseOR _)
      docs.select(col("doc_id"), mask.as("cm")).agg(sum("cm")).collect()
    }
    t("full charMaskDocs (new)") {
      graft.ops.TextSim.charMaskDocs(spark, dir).agg(sum("cm"), sum(length(col("cs")))).collect()
    }
    t("q_dedup_jaccard full") {
      Registry.byName("q_dedup_jaccard").df(spark, dir).count()
    }
    spark.stop()
  }
}
