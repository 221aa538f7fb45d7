package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-backed stage memo (FileMap's P6 stage cache): derived
  * frames shared by several queries are written to parquet ONCE per
  * (session, data dir, stage) and every later query reads the
  * materialization instead of re-deriving the pipeline. An in-memory
  * persist() was measured a net loss (eager pinning defeats per-query
  * pruning); a columnar materialization keeps pruning AND removes the
  * rebuild — at 100 TB this is a partitioned table the pipeline
  * maintains, here a session temp dir. Keyed by session identity so
  * fixture edits between sessions cannot serve stale stages;
  * computeIfAbsent makes concurrent first access build exactly once
  * (ConcurrencySpec races it). Temp dirs are swept recursively on JVM
  * exit.
  */
object StageCache {

  /** One materialization slot per (session, dir, stage). The BUILD
    * runs inside the slot's own lock, NEVER inside the map's
    * computeIfAbsent: stage builds nest (the edge list derives the
    * pair counts derives the gram index), and nested computeIfAbsent
    * on one ConcurrentHashMap is documented undefined behavior — it
    * throws IllegalStateException("Recursive update") whenever the
    * keys land in colliding bins, which made cluster/curate fail
    * intermittently depending on the session's identity hash. The map
    * operation now only creates the (empty) slot; a failed build
    * leaves the slot empty, so the next caller retries. */
  private final class Slot {
    @volatile private var path: String = _
    def get(build: => String): String = {
      if (path == null) synchronized { if (path == null) path = build }
      path
    }
    /** Replace the materialization: `next` maps the CURRENT path to a
      * freshly-written one; the swap is atomic for readers (volatile
      * write — a reader sees wholly the old or wholly the new dir,
      * never a half-written one). Runs under the slot lock, so a
      * concurrent first-touch build cannot interleave. */
    def swap(next: String => String): Unit = synchronized {
      require(path != null, "swap before first build")
      path = next(path)
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Slot]()

  /** A fresh temp data path for `stage`, swept on JVM exit. */
  private def freshPath(stage: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$stage")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      Local.rmTree(dir.toFile)))
    dir.resolve("data").toString
  }

  private def pathFor(s: SparkSession, d: String, stage: String)(
      build: => DataFrame): String = {
    val key = s"${Integer.toHexString(System.identityHashCode(s))}|$d|$stage"
    val slot = cache.computeIfAbsent(key, _ => new Slot)
    slot.get {
      val p = freshPath(stage)
      build.write.mode("overwrite").parquet(p)
      p
    }
  }

  def memoized(s: SparkSession, d: String, stage: String)(
      build: => DataFrame): DataFrame =
    s.read.parquet(pathFor(s, d, stage)(build))

  /** Append rows to a stage's materialization — the maintained-index
    * UPSERT path: ensures the stage is built (building it if this is
    * the first touch), then writes `extra` as additional parquet files
    * under the same directory. O(extra) work, never a rebuild; the
    * local analogue of a dynamic-partition append to the maintained
    * table at 100 TB. Readers created BEFORE the append keep their
    * file-listing snapshot; a fresh memoized() read sees the appended
    * rows.
    */
  def appendTo(s: SparkSession, d: String, stage: String)(
      build: => DataFrame)(extra: DataFrame): Unit =
    extra.write.mode("append").parquet(pathFor(s, d, stage)(build))

  /** REWRITE a stage's materialization — the maintained-index
    * lifecycle verb appendTo lacks: `transform` maps the stage's
    * current content to its replacement (apply tombstones, coalesce a
    * year of appended fragments, roll sketch rows up), the result is
    * written to a FRESH directory, and the slot swaps to it
    * atomically. Readers holding the old frame keep their snapshot —
    * parquet files are immutable and the old dir lives until JVM
    * exit — while every later read sees only the rewrite: the local
    * analogue of a compaction job committing a new table version.
    * Mutation verbs (append/rewrite) on one stage are single-writer
    * by contract, like every maintenance verb here: an appendTo racing
    * a rewrite can land its rows in the abandoned directory. */
  def rewrite(s: SparkSession, d: String, stage: String)(
      build: => DataFrame)(transform: DataFrame => DataFrame): Unit = {
    pathFor(s, d, stage)(build) // ensure built before swapping
    val key = s"${Integer.toHexString(System.identityHashCode(s))}|$d|$stage"
    cache.get(key).swap { cur =>
      val p = freshPath(stage)
      transform(s.read.parquet(cur)).write.mode("overwrite").parquet(p)
      p
    }
  }

  /** Drop every stage of (session, dir) whose name starts with
    * `stagePrefix` — the retrain-and-swap verbs' invalidation hook
    * (the [[graft.SessionMemo.dropByPrefix]] discipline at the stage
    * tier): the slot disappears, so the NEXT memoized() read rebuilds
    * from the live corpus, while readers already holding a DataFrame
    * keep their consistent old materialization (its temp dir lives
    * until JVM exit). Not for general use — ordinary code relies on
    * the per-session-immutability contract. */
  def invalidatePrefix(s: SparkSession, d: String,
      stagePrefix: String): Unit = {
    val p = s"${Integer.toHexString(System.identityHashCode(s))}|$d|$stagePrefix"
    cache.keySet.removeIf(_.startsWith(p))
  }

  /** Number of parquet data files currently materialized for `stage` —
    * the compaction spec's observable (inputFiles of a fresh read). */
  def fileCount(s: SparkSession, d: String, stage: String)(
      build: => DataFrame): Int =
    s.read.parquet(pathFor(s, d, stage)(build)).inputFiles.length

  /** On-disk bytes of a stage's materialization (building it if this
    * is the first touch) — the cheap size oracle for pin-vs-read
    * decisions (Graph's anchor pin guard): the parquet footprint is
    * already on local disk, so this is a directory walk, not a job. */
  def bytesOf(s: SparkSession, d: String, stage: String)(
      build: => DataFrame): Long = {
    val p = java.nio.file.Paths.get(pathFor(s, d, stage)(build))
    val dir = if (java.nio.file.Files.isDirectory(p)) p else p.getParent
    var total = 0L
    val walk = java.nio.file.Files.walk(dir)
    try walk.forEach { f =>
      if (java.nio.file.Files.isRegularFile(f))
        total += java.nio.file.Files.size(f)
    } finally walk.close()
    total
  }
}
