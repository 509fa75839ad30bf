package graft.util

import org.apache.spark.sql.DataFrame

object Parallelism {
  /** Ensure a DataFrame has at least the session's default parallelism
    * before a CPU-heavy narrow stage.
    *
    * Rationale: a small checkpoint/table (e.g. 200 MB in many tiny
    * files) gets packed by the file scan into one or two 128 MB input
    * splits, so everything fused onto the scan — normalization,
    * shingling, hashing — runs on 1-2 cores no matter how many the
    * session has (measured 5-10× on stage B). On a production table
    * with thousands of splits the condition is false and no shuffle is
    * added. */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
