package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet tables — the co-located-join primitive for the
  * 100 TB layout (SURVEY §2.1/§7: "pre-shuffle once at write time, then
  * every equi-join/aggregate on the bucket key is exchange-free").
  *
  * The pipeline's repeated joins against doc-keyed tables (text/media
  * representations, id dictionary, cluster assignments) all hash on the
  * same key; storing them bucketed by that key lets Catalyst drop the
  * per-query ShuffleExchange entirely (verified by plan inspection in
  * BucketedSpec). Iceberg's analog is a bucket partition transform; the
  * sandbox has no Iceberg runtime, so this uses the session catalog's
  * parquet bucketing, which carries the same plan-level guarantee.
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted parquet table registered in the
    * session catalog. Overwrites an existing table of the same name. */
  def write(df: DataFrame, table: String, buckets: Int, key: String, moreKeys: String*): Unit =
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True if the executed plan of `df` contains any shuffle exchange —
    * the thing bucketing is supposed to eliminate. Under AQE the root is
    * an AdaptiveSparkPlanExec LEAF wrapping the real plan, so a plain
    * traversal would never see the inner exchanges; unwrap it (and any
    * nested adaptive subtrees) before looking. */
  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scan(p: SparkPlan): Boolean = p.exists {
      case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case _ => false
    }
    scan(df.queryExecution.executedPlan)
  }
}
