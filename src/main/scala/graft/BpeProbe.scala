package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch trainer-wall probe (dev tool; numbers land in SCALE.md). */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Local.session(defaultCpus = "8")
    val root = java.nio.file.Files.createTempDirectory("graft_bpe_probe")
    val ov = ScaleGen.generate(spark, d, root.toString + "/x1", 1,
      openVocab = 4096)
    val wf = Tables.documents(spark, ov)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(65536)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    println(s"WORDS ${wf.size}")
    def wall(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime
      val r = f
      println(f"WALL $label ${(System.nanoTime - t0) / 1e9}%.2f s " +
        s"(merges=${r.asInstanceOf[Vector[_]].length})")
    }
    // warm JIT
    graft.ops.Bpe.train(wf, 64)
    graft.ops.Bpe.trainNaive(wf, 64)
    wall("naive_512")(graft.ops.Bpe.trainNaive(wf, 512))
    wall("inc_512")(graft.ops.Bpe.train(wf, 512))
    wall("inc_4096")(graft.ops.Bpe.train(wf, 4096))
    wall("inc_8192")(graft.ops.Bpe.train(wf, 8192))
    Local.rmTree(root.toFile)
    spark.stop()
  }
}
