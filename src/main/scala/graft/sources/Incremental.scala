package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental re-run over a GROWN input tree — FileMap's P6 identity
  * (re-run the pipeline, recompute only what's new) re-expressed on
  * partition-tree mechanics:
  *
  *  - the input is a Hive-partitioned tree (`part=value/` dirs);
  *  - the output is a partitioned sink whose directory names record
  *    which input partitions have been processed — the memo IS the
  *    output tree, no side-channel state;
  *  - a re-run lists both trees (metadata-only: directory names, no
  *    data files opened), diffs them, and processes ONLY the new
  *    partitions — the filter on the partition column becomes a
  *    Catalyst PartitionFilter, so already-processed data is never
  *    even scanned (IncrementalSpec asserts the plan).
  *
  * At 100 TB this is the shape that makes daily re-runs O(new data):
  * ingest lands `date=.../source=...` partitions, the derivation
  * appends matching output partitions, and the diff is a listing of
  * two directory levels. Mid-write crash tolerance is the one thing
  * this demo does not add — production would write via a transactional
  * table layer or stage-and-rename; the pruning-driven delta mechanics
  * are identical.
  */
object Incremental {

  /** Partition values (`col=value` directory names) present under
    * `dir` — a filesystem listing, no data read. */
  def partitionValues(spark: SparkSession, dir: String,
      partCol: String): Set[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(partCol + "="))
      .map(_.stripPrefix(partCol + "="))
      .toSet
  }

  /** Bring `outDir` up to date with `inDir`: apply `derive` to the
    * input partitions that have no output partition yet and append
    * them. `derive` must be partition-wise (its result for a partition
    * depends only on that partition's rows) and must preserve
    * `partCol` in its output. Returns the partition values processed
    * this run — empty when the output is already current.
    */
  def syncPartitioned(spark: SparkSession, inDir: String, outDir: String,
      partCol: String)(derive: DataFrame => DataFrame): Set[String] = {
    val todo = partitionValues(spark, inDir, partCol) --
      partitionValues(spark, outDir, partCol)
    if (todo.nonEmpty) {
      val fresh = spark.read.parquet(inDir)
        .filter(col(partCol).isin(todo.toSeq.sorted: _*))
      derive(fresh)
        .write.mode("append").partitionBy(partCol).parquet(outDir)
    }
    todo
  }

  /** Content fingerprint of one input partition: a hash over its file
    * names, lengths, and modification times — the staleness signal,
    * computed from the LISTING alone (no data read; FileMap's memo key
    * is the same (file, stage) identity). */
  def partitionFingerprint(spark: SparkSession, dir: String,
      partCol: String, value: String): Long = {
    val p = new Path(s"$dir/$partCol=$value")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L
    else fs.listStatus(p)
      .map(st => s"${st.getPath.getName}|${st.getLen}|${st.getModificationTime}")
      .sorted
      .foldLeft(17L)((h, s) => h * 31L + s.hashCode)
  }

  private def fingerprintFile(outDir: String) =
    java.nio.file.Paths.get(outDir, "_graft_fingerprints.tsv")

  private def loadFingerprints(outDir: String): Map[String, Long] = {
    val f = fingerprintFile(outDir)
    if (!java.nio.file.Files.exists(f)) Map.empty
    else new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      .linesIterator.filter(_.nonEmpty).map { l =>
        val Array(v, fp) = l.split('\t'); v -> fp.toLong
      }.toMap
  }

  private def saveFingerprints(outDir: String,
      merged: Map[String, Long]): Unit = {
    java.nio.file.Files.write(fingerprintFile(outDir),
      merged.toSeq.sorted.map { case (v, fp) => s"$v\t$fp" }
        .mkString("\n").getBytes("UTF-8"))
    ()
  }

  /** The P6 staleness diff: (recorded memo, current input fingerprints,
    * partitions that are new or changed). */
  private def stalePartitions(spark: SparkSession, inDir: String,
      outDir: String, partCol: String)
      : (Map[String, Long], Map[String, Long], Set[String]) = {
    val seen = loadFingerprints(outDir)
    val current = partitionValues(spark, inDir, partCol)
      .map(v => v -> partitionFingerprint(spark, inDir, partCol, v)).toMap
    val todo = current.collect {
      case (v, fp) if !seen.get(v).contains(fp) => v
    }.toSet
    (seen, current, todo)
  }

  /** Output partitions that no longer have an input partition — the
    * RETRACTION set: an upstream takedown (source partition deleted)
    * must disappear from the derived tree too, the same legal
    * requirement that motivated the index tombstones. Union of the
    * memo keys and the materialized output dirs, so trees first built
    * by [[syncPartitioned]] (no sidecar) retract as well. */
  private def removedPartitions(spark: SparkSession, outDir: String,
      partCol: String, seen: Map[String, Long],
      current: Map[String, Long]): Set[String] =
    (seen.keySet ++ partitionValues(spark, outDir, partCol)) --
      current.keySet

  private def dropOutputPartition(spark: SparkSession, outDir: String,
      partCol: String, value: String): Unit = {
    val p = new Path(s"$outDir/$partCol=$value")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    ()
  }

  /** Full FileMap-P6 semantics: re-run processes partitions that are
    * NEW **or whose input files changed** since the recorded
    * fingerprint, and RETRACTS output partitions whose input partition
    * was removed upstream (directory dropped + memo entry dropped —
    * unchanged partitions are never touched, byte for byte). Changed
    * partitions are rewritten in place via dynamic partition overwrite
    * (only the touched `partCol=v` dirs are replaced); fingerprints
    * persist as a sidecar in the output tree, so the memo travels with
    * the data. Returns the partition values processed this run —
    * rewritten and retracted alike.
    */
  def syncChanged(spark: SparkSession, inDir: String, outDir: String,
      partCol: String)(derive: DataFrame => DataFrame): Set[String] = {
    val (seen, current, todo) = stalePartitions(spark, inDir, outDir, partCol)
    val removed = removedPartitions(spark, outDir, partCol, seen, current)
    removed.foreach(dropOutputPartition(spark, outDir, partCol, _))
    if (todo.nonEmpty) {
      val fresh = spark.read.parquet(inDir)
        .filter(col(partCol).isin(todo.toSeq.sorted: _*))
      derive(fresh)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol).parquet(outDir)
    }
    if (todo.nonEmpty || removed.nonEmpty)
      saveFingerprints(outDir,
        (seen -- removed) ++ todo.map(v => v -> current(v)))
    todo ++ removed
  }

  /** Format-agnostic P6 memo for pipelines that must process each
    * partition as its own unit (the CLI shell path: one process chain
    * per partition, text in / text out — [[graft.Cli.runStagesMemoized]]).
    * Same staleness diff and sidecar as [[syncChanged]]; `process`
    * receives each stale partition VALUE and must overwrite that
    * partition's output itself. Retraction mirrors [[syncChanged]]:
    * removed input partitions drop their memo entry and are handed to
    * `retract` (the caller owns the output layout, so it owns the
    * delete; the default no-op preserves prior behavior). Fingerprints
    * are recorded only after every stale partition processed, so a
    * failed run retries all of them. Returns the processed partition
    * values — processed and retracted alike. */
  def syncChangedEach(spark: SparkSession, inDir: String, outDir: String,
      partCol: String, retract: String => Unit = _ => ())(
      process: String => Unit): Set[String] = {
    val (seen, current, todo) = stalePartitions(spark, inDir, outDir, partCol)
    val removed = seen.keySet -- current.keySet
    removed.toSeq.sorted.foreach(retract)
    if (todo.nonEmpty || removed.nonEmpty) {
      todo.toSeq.sorted.foreach(process)
      saveFingerprints(outDir,
        (seen -- removed) ++ todo.map(v => v -> current(v)))
    }
    todo ++ removed
  }
}
