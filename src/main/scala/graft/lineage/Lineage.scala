package graft.lineage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition lineage + scalar metrics for every pipeline stage
  * (north rule: "checkpoint every stage ... with per-partition lineage
  * + metrics tables so any stage resumes idempotently").
  *
  * Lineage row = (stage, run_id, partition_id, output_rows,
  * content_hash) where content_hash is an order-insensitive xxhash64
  * fold of all columns — cheap (one extra narrow aggregation over data
  * already materialized for the checkpoint write) and enough to prove
  * two runs produced identical partition content.
  *
  * The reference's closest analog is its audit/metrics logging
  * (reference: src/privacy/audit_logging.py:111-126 content hashing;
  * src/core/drift_detection.py metrics rows).
  */
object Lineage {

  /** Compute lineage rows for a stage output (already checkpointed). */
  def lineageRows(df: DataFrame, stage: String, runId: String): DataFrame = {
    val allCols = df.columns.map(col).toIndexedSeq
    df.groupBy(spark_partition_id().as("partition_id"))
      .agg(
        count(lit(1)).as("output_rows"),
        // bit_xor: order-insensitive content fold, no ANSI sum overflow
        coalesce(bit_xor(xxhash64(allCols: _*)), lit(0L)).as("content_hash")
      )
      .select(
        lit(stage).as("stage"),
        lit(runId).as("run_id"),
        col("partition_id"),
        col("output_rows"),
        col("content_hash")
      )
  }

  def writeLineage(df: DataFrame, stage: String, runId: String, dir: String): Unit =
    lineageRows(df, stage, runId).coalesce(1).write.mode("append").parquet(s"$dir/lineage")

  /** Write already-collected lineage rows (the caller computed them to
    * read the per-stage row count out of the same pass — one aggregate
    * job serves both lineage and the stage metrics, instead of a
    * separate full count() per stage). */
  def writeCollectedLineage(
      spark: SparkSession,
      rows: Array[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType,
      dir: String
  ): Unit =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .coalesce(1).write.mode("append").parquet(s"$dir/lineage")

  def writeMetrics(
      spark: SparkSession,
      stage: String,
      runId: String,
      metrics: Seq[(String, Double)],
      dir: String
  ): Unit = {
    import spark.implicits._
    metrics
      .map { case (n, v) => (stage, runId, n, v) }
      .toDF("stage", "run_id", "name", "value")
      .coalesce(1)
      .write
      .mode("append")
      .parquet(s"$dir/metrics")
  }
}
