package graft.ops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY §2.5). Each query shuffles once on its
  * partition key and sorts within partitions — the same plan shape at
  * any scale; no per-row self-joins. Frames are always over a TOTAL
  * order (tie-break on event_id) so ntile/rank are deterministic
  * cross-engine.
  */
object Windows {

  private def q(name: String, oracle: String)(
      df: (SparkSession, String) => DataFrame) = QuerySpec.sql(name, oracle)(df)

  private def byUserTsRows = Window.partitionBy("user_id")
    .orderBy(col("ts"), col("event_id"))

  val specs: Seq[QuerySpec] = Seq(

    q("q_win_rank",
      """SELECT user_id, event_id,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS nt
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        |ORDER BY user_id, rn""") { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("nt"))
        .orderBy("user_id", "rn")
    },

    q("q_win_laglead",
      """SELECT user_id, event_id,
        |  lag(value, 1, CAST(-1.0 AS DOUBLE)) OVER w AS prev_value,
        |  lead(value, 1, CAST(-1.0 AS DOUBLE)) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""") { (s, d) =>
      val w = byUserTsRows
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          lag(col("value"), 1, -1.0).over(w).as("prev_value"),
          lead(col("value"), 1, -1.0).over(w).as("next_value"))
        .orderBy("user_id", "event_id")
    },

    q("q_win_frame_rows",
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_sum,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS sliding_avg
        |FROM events
        |ORDER BY user_id, event_id""") { (s, d) =>
      val w = byUserTsRows
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          round(sum("value").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 6)
            .as("running_sum"),
          round(avg("value").over(w.rowsBetween(-3, Window.currentRow)), 6)
            .as("sliding_avg"))
        .orderBy("user_id", "event_id")
    },

    // Time-range frame: SQL form in both engines (the DSL rangeBetween
    // only takes longs; the parser accepts calendar intervals).
    q("q_win_frame_range",
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  count(*) OVER w AS cnt_1h,
        |  round(sum(value) OVER w, 6) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""") { (s, d) =>
      QuerySpec.withTempView(s, "graft_events_range", Tables.events(s, d)) {
        v => s.sql(s"""
          SELECT user_id, event_id, unix_micros(ts) AS ts_us,
            count(*) OVER w AS cnt_1h,
            round(sum(value) OVER w, 6) AS sum_1h
          FROM $v
          WINDOW w AS (PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          ORDER BY user_id, event_id""")
      }
    },

    // Top-k per group: row_number + filter — partial TopK per partition,
    // never a global sort of the fact table.
    q("q_win_topk_grp",
      """SELECT user_id, event_id, value, rn FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rn
        |  FROM events) t
        |WHERE rn <= 3
        |ORDER BY user_id, rn""") { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("user_id", "rn")
    },

    // Distribution ranks: percent_rank/cume_dist are rank arithmetic
    // over the same single per-key sort as q_win_rank — one shuffle on
    // user_id, no second pass for the partition size (the window
    // operator knows it). The total order (value DESC, event_id) makes
    // both fractions deterministic cross-engine; round(6) per §2.13.
    q("q_win_dist",
      """SELECT user_id, event_id,
        |  round(percent_rank() OVER w, 6) AS prk,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        |ORDER BY user_id, event_id""") { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          round(percent_rank().over(w), 6).as("prk"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy("user_id", "event_id")
    },

    // Quartile bucketing + positional picks: ntile REQUIRES the bare
    // ordered window (ranking functions reject explicit frames), while
    // first_value/nth_value need the UNBOUNDED frame to read the whole
    // partition — hence two window specs over the SAME single sort:
    // one shuffle on c_mktsegment, both spellings. The (acctbal,
    // custkey) order is total, so quartile edges are deterministic
    // cross-engine.
    q("q_win_ntile",
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  ntile(4) OVER w AS quartile,
        |  round(first_value(c_acctbal) OVER wf, 2) AS seg_min,
        |  round(nth_value(c_acctbal, 2) OVER wf, 2) AS seg_2nd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal, c_custkey),
        |  wf AS (PARTITION BY c_mktsegment
        |         ORDER BY c_acctbal, c_custkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING
        |           AND UNBOUNDED FOLLOWING)
        |ORDER BY c_mktsegment, c_custkey""") { (s, d) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          round(first_value(col("c_acctbal")).over(wf), 2).as("seg_min"),
          round(nth_value(col("c_acctbal"), 2).over(wf), 2).as("seg_2nd"))
        .orderBy("c_mktsegment", "c_custkey")
    },

    // Per-group top-k WITHOUT the window sort: the bounded-heap
    // native aggregate (graftnative.TopKByScore) carries at most k
    // entries per group at every stage — partial buffers, shuffle
    // payload, merge — where the row_number spelling (q_win_topk_grp,
    // same oracle text) sorts each group's FULL partition first. At
    // 100 TB a hot key pays O(k) here vs a single-reducer sort there.
    // Identical output: rank order (value DESC, event_id) is spelled
    // identically in the heap's comparator and the oracle's window.
    q("q_topk_grp_agg",
      """SELECT user_id, event_id, value, rn FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rn
        |  FROM events) t
        |WHERE rn <= 3
        |ORDER BY user_id, rn""") { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(graft.functions.VectorFunctions.topKByScore(
          col("value"), col("event_id"), 3).as("top"))
        .select(col("user_id"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("user_id"), col("t.id").as("event_id"),
          col("t.score").as("value"), (col("i") + 1).cast("int").as("rn"))
        .orderBy("user_id", "rn")
    },

    // Rolling MEDIAN — a robust-statistics moving aggregate the
    // avg/sum frames can't fake: exact interpolating percentile over
    // an 11-row trailing frame (Spark `percentile` ≡ DuckDB
    // `quantile_cont`, the same pairing q_agg_pctl pins per-group).
    // Same single per-user sort as every other frame query; the frame
    // bound caps per-row state at 11 values regardless of history
    // length. (ts, event_id) is a total order (event_id unique), so
    // frame contents are deterministic cross-engine.
    q("q_win_median",
      """SELECT user_id, event_id,
        |  round(quantile_cont(value, 0.5) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), 6) AS med11
        |FROM events
        |ORDER BY user_id, event_id""") { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-10, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          round(expr("percentile(value, 0.5)").over(w), 6).as("med11"))
        .orderBy("user_id", "event_id")
    }
  )
}
