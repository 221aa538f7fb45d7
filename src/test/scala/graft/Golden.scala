package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Golden-output regression layer (SURVEY §5.2 item 4): every registry
  * query's sf0.001 result pinned as (row count, canonical md5). This is
  * the only automated check covering the no-oracle sketch queries'
  * exact outputs, and it catches accidental semantic drift in oracle
  * queries without needing DuckDB.
  *
  * Canonical form mirrors the driver's compare: columns sorted by name,
  * rows in the query's own (total) ORDER BY, values via toString with
  * nulls as "NULL".
  */
object Golden {
  val path = "src/test/resources/goldens_sf0.001.tsv"

  def canonical(df: DataFrame): (Int, String) = {
    val cols = df.columns.sorted
    val rows = df.select(cols.map(col): _*).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val line = (0 until r.length).map { i =>
        val v = r.get(i)
        if (v == null) "NULL" else v.toString
      }.mkString("\u0001") + "\n"
      md.update(line.getBytes(StandardCharsets.UTF_8))
    }
    (rows.length, md.digest().map("%02x".format(_)).mkString)
  }

  def load(): Map[String, (Int, String)] =
    new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map { l =>
        val Array(name, n, h) = l.split('\t')
        name -> (n.toInt, h)
      }.toMap
}

/** Regenerate the golden file after an INTENTIONAL semantics change:
  * `sbt "Test/runMain graft.GoldenGen"` — then review the diff.
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val lines = Registry.all.sortBy(_.name).map { q =>
      val (n, h) = Golden.canonical(q.df(TestSpark.spark, TestSpark.sf))
      s"${q.name}\t$n\t$h"
    }
    Files.createDirectories(Paths.get(Golden.path).getParent)
    Files.write(Paths.get(Golden.path),
      (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${lines.size} goldens to ${Golden.path}")
    TestSpark.spark.stop()
  }
}
