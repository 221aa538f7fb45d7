package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global
import org.scalatest.funsuite.AnyFunSuite

/** Queries must be safe to run concurrently in ONE SparkSession (the
  * advisor flagged shared temp-view names and session-conf mutation as
  * races). Runs a mixed batch — including both spark.sql queries that
  * create temp views, the events loader that sets the nanos conf, and
  * a UDF-registering query — three times in parallel and asserts every
  * run matches the serial result.
  */
class ConcurrencySpec extends AnyFunSuite {
  import TestSpark._

  // q_dedup_cluster + q_curate both race to build the session stage
  // cache (gram index + edge list) on first touch — computeIfAbsent
  // must make exactly one build win and everyone read it. The jaccard/
  // LSH/SimHash/IVF/PQ queries race the OTHER stage-cached artifacts
  // (charmask, lshsigs, simhash, ivfcb/ivfassign, pqcb/pqcodes — the
  // PQ pair is chained: codes build through the codebook) the same way.
  private val names = Seq("q_agg_gsets", "q_win_frame_range", "q_ev_tumble",
    "q_udf_scalar", "q_agg_group", "q_text_tokens",
    "q_dedup_cluster", "q_curate",
    "q_dedup_jaccard", "q_sim_ann_lsh", "q_dedup_simhash",
    "q_sim_ann_ivf", "q_sim_ann_pq")

  test("a mixed query batch is stable under concurrent execution") {
    // Concurrent phase FIRST: the stage cache is cold, so the
    // cluster/curate futures race its first build.
    val runs = Future.traverse(1 to 3) { _ =>
      Future.traverse(names) { n =>
        Future(n -> q(n).collect().toSeq.map(_.toSeq))
      }
    }
    val concurrent = Await.result(runs, 10.minutes)
    val serial: Map[String, Seq[Seq[Any]]] =
      names.map(n => n -> q(n).collect().toSeq.map(_.toSeq)).toMap
    concurrent.foreach { run =>
      run.foreach { case (n, rows) =>
        assert(rows === serial(n), s"concurrent run diverged for $n")
      }
    }
  }

  test("SessionMemo: concurrent first access builds exactly once; sessions isolated") {
    // The r15 memo layer under the same race the StageCache test runs:
    // 16 threads hit one (session, key) cold — the Slot's
    // double-checked lock must admit exactly one build, everyone reads
    // its value; a second session with the same key gets its OWN build
    // (weak-keyed isolation), and distinct keys never share a slot.
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(): java.lang.Integer = {
      Thread.sleep(50) // widen the race window
      Integer.valueOf(builds.incrementAndGet())
    }
    val got = Await.result(Future.traverse(1 to 16) { _ =>
      Future(SessionMemo.memo(spark, "concspec|k1")(build()))
    }, 2.minutes)
    assert(builds.get() === 1, s"build ran ${builds.get()} times")
    assert(got.forall(_ == got.head))
    val s2 = spark.newSession()
    assert(SessionMemo.memo(s2, "concspec|k1")(build()).intValue === 2,
      "a distinct session must not read another session's slot")
    assert(SessionMemo.memo(spark, "concspec|k2")(build()).intValue === 3,
      "a distinct key must not share a slot")
    // and re-reads serve the memo, never the build
    assert(SessionMemo.memo(spark, "concspec|k1")(build()).intValue === 1)
    assert(builds.get() === 3)
  }
}
