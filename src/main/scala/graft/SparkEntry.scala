package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in the [[Registry]]; these maps are derived views.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Derived from
    * [[Registry.byName]] so its duplicate-name `require` runs on the
    * production path (a colliding name fails fast instead of silently
    * dropping a query from the driver contract). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.byName.map { case (n, q) => n -> q.df }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.byName.flatMap { case (n, q) => q.oracle.map(n -> _) }
}
