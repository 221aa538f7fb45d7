package graft.ops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Every join flavor (SURVEY §2.3). Scale notes:
  *  - equi joins shuffle on their keys (sort-merge / shuffled-hash picked
  *    by Catalyst + AQE);
  *  - dimension joins broadcast the small side explicitly so the fact
  *    table never shuffles (q_join_bcast);
  *  - theta/range joins keep the broadcast side provably tiny so the
  *    nested-loop join stays bounded at any scale factor;
  *  - the as-of join is the 100 TB-safe window formulation (one shuffle
  *    by key, no self-join explosion).
  */
object Joins {

  private def q(name: String, oracle: String)(
      df: (SparkSession, String) => DataFrame) = QuerySpec.sql(name, oracle)(df)

  val specs: Seq[QuerySpec] = Seq(

    q("q_join_inner",
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""") { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("c_mktsegment")
    },

    q("q_join_bcast",
      """SELECT r_name, n_name, count(*) AS n_items,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""") { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy("r_name", "n_name")
    },

    q("q_join_left",
      """SELECT n_name, count(s_suppkey) AS n_sup,
        |  round(sum(coalesce(s_acctbal, 0)), 2) AS sum_bal
        |FROM nation LEFT JOIN (
        |  SELECT * FROM supplier WHERE s_acctbal > 5000
        |) s ON n_nationkey = s_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""") { (s, d) =>
      Tables.nation(s, d)
        .join(Tables.supplier(s, d).filter(col("s_acctbal") > 5000),
          col("n_nationkey") === col("s_nationkey"), "left")
        .groupBy("n_name")
        .agg(count(col("s_suppkey")).as("n_sup"),
          round(sum(coalesce(col("s_acctbal"), lit(0.0))), 2).as("sum_bal"))
        .orderBy("n_name")
    },

    q("q_join_right",
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""") { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },

    q("q_join_full",
      """SELECT coalesce(a.o_custkey, b.c_custkey) AS custkey,
        |  a.n_orders, b.c_acctbal
        |FROM (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        |      FROM orders GROUP BY o_custkey) a
        |FULL JOIN (SELECT c_custkey, c_acctbal FROM customer
        |           WHERE c_acctbal > 0) b
        |ON a.o_custkey = b.c_custkey
        |ORDER BY custkey""") { (s, d) =>
      val a = Tables.orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .select("c_custkey", "c_acctbal")
      a.join(b, a("o_custkey") === b("c_custkey"), "full")
        .select(coalesce(a("o_custkey"), b("c_custkey")).as("custkey"),
          col("n_orders"), col("c_acctbal"))
        .orderBy("custkey")
    },

    q("q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    q("q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    q("q_join_cross",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""") { (s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    },

    // Non-equi range join: the probe side is pre-filtered to a handful of
    // rows, so the nested-loop join broadcasts a tiny build side and stays
    // O(|lineitem|) at every scale factor.
    q("q_join_theta",
      """SELECT o_orderkey, count(*) AS n_shipped
        |FROM (SELECT * FROM orders WHERE o_orderkey < 100) o
        |JOIN lineitem
        |  ON l_shipdate BETWEEN o_orderdate
        |     AND o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey
        |ORDER BY o_orderkey""") { (s, d) =>
      // Precompute the interval endpoint on the tiny build side, so the
      // 15M-pair nested-loop predicate is two timestamp compares and no
      // per-pair interval arithmetic.
      val o = Tables.orders(s, d).filter(col("o_orderkey") < 100)
        .withColumn("o_end", col("o_orderdate") + expr("INTERVAL 30 DAY"))
      Tables.lineitem(s, d)
        .join(broadcast(o),
          col("l_shipdate").between(col("o_orderdate"), col("o_end")))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_shipped"))
        .orderBy("o_orderkey")
    },

    // As-of join, window formulation (SURVEY Q-JOIN-ASOF): latest click at
    // or before each purchase, per user. A running max over a
    // (ts, event_id)-ordered frame is deterministic and identical in both
    // engines, and needs only one shuffle by user_id — the 100 TB-safe
    // shape (no self-join, no per-row subquery).
    q("q_join_asof",
      """SELECT user_id, event_id, ts_us, last_click_us FROM (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |    max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        |    ) AS last_click_us
        |  FROM events) t
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("last_click_us",
          max(when(col("event_type") === "click", unix_micros(col("ts"))))
            .over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("last_click_us"))
        .orderBy("user_id", "event_id")
    },

    // Large-LARGE range join — the shape q_join_theta cannot take when the
    // interval side is too big to broadcast. Day-bucket both sides: each
    // interval explodes to the (bounded: ≤4) day buckets its endpoints
    // span, each point carries its one bucket, and the pairing becomes an
    // EQUI join on the bucket followed by the exact range filter. A
    // point's bucket is covered by a qualifying interval exactly once, so
    // no dedup stage is needed. The bucket range runs day(start) through
    // day(END) — computed from the endpoint, NOT day(start) + 2, so a
    // timestamp with a time-of-day component (whose 3-day interval spans
    // four calendar days) still meets every point it qualifies against;
    // the fixture is midnight-aligned, where the 4th bucket just pairs
    // nothing. At 100 TB both sides shuffle-partition on the bucket and
    // the per-bucket fan-out stays |intervals covering that day| — never a
    // nested loop over the cross product (PlanShapeSpec pins the plan to
    // an equi join, no BroadcastNestedLoop/CartesianProduct).
    q("q_join_range",
      """SELECT o_orderkey, count(*) AS n_shipped
        |FROM orders JOIN lineitem
        |  ON l_shipdate >= o_orderdate
        | AND l_shipdate < o_orderdate + INTERVAL 3 DAY
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderkey
        |ORDER BY o_orderkey""") { (s, d) =>
      val day0 = lit("1995-01-01").cast("date")
      // Eager aggregation below the join: the count per order only
      // needs HOW MANY lineitems shipped on each covered day, so the
      // fact side collapses to (day, cnt) BEFORE the multiplying join —
      // ~2.5k day rows instead of 600k points, and the within-bucket
      // point x interval product (tens of millions of pairs at sf0.1,
      // unbounded at 100 TB) never materializes. The dates are integral
      // days, so the half-open [o_orderdate, +3d) interval is exactly
      // offsets {0,1,2}: exploding intervals to their covered days
      // makes the pairing a pure EQUI join on the day with no residual
      // range filter. (For range joins whose per-pair payload does not
      // collapse by key, the general shape is this same explode with a
      // coarser bucket + residual filter — see the plan pin.)
      val dayCounts = Tables.lineitem(s, d)
        .groupBy(datediff(col("l_shipdate").cast("date"), day0).as("b"))
        .agg(count(lit(1)).as("cnt"))
      val iv = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"), day0).as("o_day"))
        .withColumn("b", explode(sequence(col("o_day"), col("o_day") + 2)))
      iv.join(dayCounts, "b")
        .groupBy("o_orderkey")
        .agg(sum(col("cnt")).cast("long").as("n_shipped"))
        .orderBy("o_orderkey")
    },

    // Self cross-pair with id inequality — the basis of all pairwise
    // similarity ops (§2.9). Columns are pruned to (id, label) BEFORE the
    // cross join so the quadratic stage carries 12 bytes/row, not vectors.
    q("q_join_selfpair",
      """SELECT a.label AS label_a, b.label AS label_b, count(*) AS n
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |GROUP BY a.label, b.label
        |ORDER BY label_a, label_b""") { (s, d) =>
      val e = Tables.embeddings(s, d).select("vec_id", "label")
      val a = e.toDF("ida", "label_a")
      val b = e.toDF("idb", "label_b")
      a.crossJoin(b).filter(col("ida") < col("idb"))
        .groupBy("label_a", "label_b")
        .agg(count(lit(1)).as("n"))
        .orderBy("label_a", "label_b")
    },

    // Latest-row-per-key lookup join (the SCD-2 "current fact" shape):
    // each customer joined to their MOST RECENT order. The fact side
    // collapses to one row per key BEFORE the join — row_number over the
    // (o_orderdate, o_orderkey) total order, keep rn = 1 — so the join
    // input is |customers|-sized regardless of fact volume, and the
    // reduction and the join share the same custkey-compatible
    // partitioning. Customers with no orders keep a row (LEFT join,
    // zero/NULL-coalesced) so the output reconciles with |customer|.
    // o_orderdate is emitted as epoch-µs (cast handles both the NTZ and
    // adjusted physical parquet encodings — same dispatch contract as
    // Tables.events).
    q("q_join_latest",
      """WITH r AS (SELECT o_custkey, o_orderkey,
        |    epoch_us(o_orderdate) AS od_us, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |SELECT c.c_custkey, c.c_name,
        |  coalesce(r.o_orderkey, -1) AS o_orderkey,
        |  coalesce(r.od_us, -1) AS od_us,
        |  round(coalesce(r.o_totalprice, 0), 2) AS price
        |FROM customer c LEFT JOIN r ON r.o_custkey = c.c_custkey
        |  AND r.rn = 1
        |ORDER BY c.c_custkey""") { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("od_us").desc, col("o_orderkey").desc)
      val latest = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          expr("unix_micros(cast(o_orderdate as timestamp))").as("od_us"),
          col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      Tables.customer(s, d)
        .join(latest, col("o_custkey") === col("c_custkey"), "left")
        .select(col("c_custkey"), col("c_name"),
          coalesce(col("o_orderkey"), lit(-1L)).as("o_orderkey"),
          coalesce(col("od_us"), lit(-1L)).as("od_us"),
          round(coalesce(col("o_totalprice"), lit(0d)), 2).as("price"))
        .orderBy("c_custkey")
    }
  )
}
