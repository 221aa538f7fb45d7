package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The literal FileMap execution model — "an operator is a shell
  * pipeline" — as a Spark operator (CAP-PIPE-SHELL). `RDD.pipe` forks
  * the command once per partition and streams the partition's records
  * through its stdin/stdout, exactly FileMap's per-file fork+pipe but
  * with Spark's scheduling, retry, and locality underneath.
  *
  * This is the one place the engine deliberately drops to the RDD API:
  * an external process is imperative per-partition logic by definition
  * — there is nothing for Catalyst to optimize across the exec
  * boundary. Everything upstream/downstream of the pipe stays a
  * DataFrame, so pushdown and pruning still shape what reaches stdin.
  *
  * Scale notes: one process per PARTITION (not per row, not per file),
  * so process spawn cost amortizes over the partition; repartition
  * first to bound per-process input; the pipe is line-oriented and
  * unordered across partitions, like every shuffle-free map.
  */
object ShellPipe {

  /** Pipe a single-string-column DataFrame through a shell command,
    * one line per row; returns one row per output line. */
  def pipe(df: DataFrame, command: String): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(df.schema.fields.length == 1 &&
      df.schema.fields.head.dataType.typeName == "string",
      "ShellPipe.pipe expects exactly one string column")
    val piped = df.rdd.map(_.getString(0))
      .pipe(Seq("/bin/sh", "-c", command))
    spark.createDataset(piped)
  }
}
