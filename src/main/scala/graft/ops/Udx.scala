package graft.ops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** User-defined function surface (SURVEY §2.11): scalar UDF, typed UDAF,
  * and a generator (UDTF). FileMap's ethos is "any shell command is an
  * operator"; the Spark translation is "any Scala function is an
  * operator" — registered once, then usable from both the DSL and SQL.
  *
  * Each query's semantics are deliberately chosen to be expressible in
  * plain DuckDB SQL so the differential oracle still applies to custom
  * code. Scale note: a JVM scalar UDF runs inside whole-stage codegen as
  * a black-box call — fine for per-row logic; the typed Aggregator gets
  * partial (map-side) aggregation exactly like a built-in, so the UDAF
  * shuffles only one (sum, count) pair per group per partition.
  */
object Udx {

  /** Geometric mean as a typed Aggregator: buffer = (sum of logs, n).
    * Merge-associative, so Spark plans it as partial+final aggregation.
    */
  private class GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(r: (Double, Long)): Double =
      if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
    def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder = Encoders.scalaDouble
  }

  val specs: Seq[QuerySpec] = Seq(

    // Scalar UDF (Q-UDF-SCALAR): distinct char-3-gram count, registered
    // and then invoked through SQL text to exercise the full
    // register-then-parse path.
    QuerySpec.sql("q_udf_scalar",
      """SELECT doc_id,
        |  CAST(len(list_distinct([substr(text, CAST(i AS INT), 3)
        |    for i in range(1, greatest(length(text) - 2, 0) + 1)])) AS INT)
        |    AS n_grams3
        |FROM documents
        |ORDER BY doc_id""") { (s, d) =>
      s.udf.register("graft_ngram3_count", (t: String) =>
        if (t == null || t.length < 3) 0 else t.sliding(3).toSet.size)
      Tables.documents(s, d)
        .selectExpr("doc_id", "graft_ngram3_count(text) AS n_grams3")
        .orderBy("doc_id")
    },

    // Typed UDAF (Q-UDAF-AGG): geometric mean of l_quantity per
    // returnflag; oracle is the exp(avg(ln)) identity.
    QuerySpec.sql("q_udaf_agg",
      """SELECT l_returnflag,
        |  round(exp(avg(ln(l_quantity))), 6) AS geo_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, d) =>
      val geoMean = udaf(new GeoMean)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(geoMean(col("l_quantity")), 6).as("geo_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // Generator / UDTF (Q-UDTF-GEN): one document row fans out to one
    // row per char-3-gram with its position — a UDF building the array,
    // posexplode doing the generation (Spark's lateral-view path).
    QuerySpec.sql("q_udtf_gen",
      """WITH g AS (SELECT doc_id,
        |  unnest([{'pos': CAST(i - 1 AS INT),
        |           'gram': substr(text, CAST(i AS INT), 3)}
        |    for i in range(1, greatest(length(text) - 2, 0) + 1)]) AS u
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id, u.pos AS pos, u.gram AS gram
        |FROM g
        |ORDER BY doc_id, pos""") { (s, d) =>
      val grams = udf((t: String) =>
        if (t == null || t.length < 3) Seq.empty[String]
        else (0 to t.length - 3).map(i => t.substring(i, i + 3)))
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), posexplode(grams(col("text"))).as(Seq("pos", "gram")))
        .orderBy("doc_id", "pos")
    }
  )
}
