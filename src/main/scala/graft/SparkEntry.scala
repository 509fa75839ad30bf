package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Analytics, Analytics2, Analytics3, Analytics4, Analytics5, Analytics6, Analytics7, OpsQueries, Resolution}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` unions the identity-resolution pipeline stages (fixture
  * input, rows-only check — ScalaTest enforces the F1 gate) and the
  * DuckDB-oracled analytics operators over the testdata tables.
  */
object SparkEntry {
  /** Flagship: full B→S→C resolution on the t1 fixture; rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Resolution.staged(spark, "t1").clusters

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ Analytics2.queries ++ Analytics3.queries ++
      Analytics4.queries ++ Analytics5.queries ++ Analytics6.queries ++
      Analytics7.queries ++ OpsQueries.queries ++ Resolution.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the fixture-based resolution
    * queries (not expressible over the driver tables). */
  def oracleSql: Map[String, String] =
    Analytics.oracleSql ++ Analytics2.oracleSql ++ Analytics3.oracleSql ++
      Analytics4.oracleSql ++ Analytics5.oracleSql ++ Analytics6.oracleSql ++
      Analytics7.oracleSql ++ OpsQueries.oracleSql
}
