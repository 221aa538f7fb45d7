package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for the whole suite (SURVEY §5.2 layers
  * 2–4 run on sf0.001). Config mirrors the Verify/Bench harness.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_warehouse")
    wh.toFile.deleteOnExit()
    val s = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graftnative.GraftExtensions)
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.warehouse.dir", wh.toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Smallest fixture tier — correctness tests, not benchmarks. */
  val sf: String = "/root/testdata/sf0.001"

  /** Run a registered contract query against the test fixtures. */
  def q(name: String): DataFrame = Registry.byName(name).df(spark, sf)
}
