package graft.ops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: scans, projection/filter, aggregation (SURVEY §2.1,
  * §2.2, §2.4). Declarative DataFrame plans throughout so Catalyst gets
  * predicate pushdown, column pruning and partial aggregation for free —
  * at 100 TB every query here is a single scan + single shuffle (or no
  * shuffle at all for the pushdown-only ones).
  */
object Relational {

  /** Flagship: TPC-H-Q1-shaped pricing summary (Q-AGG-GROUP, rehearsed
    * SURVEY §8.3-QA). One scan, map-side partial HashAggregate, 6-group
    * final — the canonical 100 TB-safe aggregation shape.
    */
  def flagship(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val flagshipOracle: String = """
    |SELECT l_returnflag, l_linestatus,
    |  round(sum(l_quantity), 2) AS sum_qty,
    |  round(sum(l_extendedprice), 2) AS sum_base_price,
    |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
    |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
    |  round(avg(l_quantity), 6) AS avg_qty,
    |  round(avg(l_extendedprice), 2) AS avg_price,
    |  round(avg(l_discount), 6) AS avg_disc,
    |  count(*) AS count_order
    |FROM lineitem
    |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    |GROUP BY l_returnflag, l_linestatus
    |ORDER BY l_returnflag, l_linestatus
    """

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec.sql("q_agg_group", flagshipOracle)(flagship)
  )
}
