package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probability-quality metrics and the Brier-gated rollback rule —
  * the reference's feedback/calibration layer
  * (reference: src/validation/confidence_calibration.py:74-130 Brier +
  * ECE + reliability bins; src/core/drift_detection_enhanced.py:23-116
  * Brier-gated model rollback; src/core/feedback_loop.py:121-611).
  *
  * All distributed pieces are single hash aggregates over (p, y) rows;
  * the rollback gate itself is a pure driver-side decision (model
  * registry storage is Iceberg snapshots / time-travel in production).
  */
object Calibration {

  def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(negate(x)))

  /** Brier score mean((p − y)²): one row (brier, n). */
  def brier(df: DataFrame, p: Column, y: Column): DataFrame =
    df.agg(
      avg(pow(p - y.cast("double"), 2)).as("brier"),
      count(lit(1)).as("n")
    )

  /** Reliability bins: (bin, n, avg_p, frac_pos, gap). */
  def reliabilityBins(df: DataFrame, p: Column, y: Column, bins: Int = 10): DataFrame =
    df.select(
      least(floor(p * bins).cast("int"), lit(bins - 1)).as("bin"),
      p.as("p"), y.cast("double").as("y")
    )
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        avg("p").as("avg_p"),
        avg("y").as("frac_pos")
      )
      .withColumn("gap", abs(col("avg_p") - col("frac_pos")))

  /** Expected calibration error Σ (n_b / N)·|avg_p − frac_pos|. */
  def ece(df: DataFrame, p: Column, y: Column, bins: Int = 10): DataFrame = {
    val b = reliabilityBins(df, p, y, bins)
    b.agg((sum(col("n") * col("gap")) / sum(col("n"))).as("ece"), sum("n").as("n"))
  }

  /** Brier-gated rollback (drift_detection_enhanced.py:23-116): a new
    * model snapshot is REJECTED (roll back to the previous snapshot)
    * when its Brier score worsens by more than `tolerance`. */
  def shouldRollback(previousBrier: Double, newBrier: Double, tolerance: Double = 0.15): Boolean =
    newBrier > previousBrier + tolerance
}
