package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model snapshot / Brier-gated rollback registry — the reference
  * captures pre-drift model state and rolls back when the Brier score
  * worsens past a tolerance
  * (reference: src/core/drift_detection_enhanced.py:23-116). In
  * production the snapshot STORAGE is Iceberg table versions
  * (`VERSION AS OF`); here a parquet metadata table records one row per
  * snapshot — (snapshot_id, stage, brier, payload_path, created_seq) —
  * and rollback is a metadata-only pointer flip, exactly like Iceberg's
  * snapshot log.
  */
object ModelRegistry {

  final case class Snapshot(snapshot_id: String, stage: String, brier: Double, payload_path: String, created_seq: Long)

  private def tablePath(dir: String) = s"$dir/model_snapshots"

  /** Append a snapshot row. `seq` must be monotonic per stage (the
    * caller's run counter — NOT wall time, so replays are stable). */
  def record(spark: SparkSession, dir: String, snap: Snapshot): Unit = {
    import spark.implicits._
    Seq(snap).toDF().write.mode("append").parquet(tablePath(dir))
  }

  def snapshots(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(tablePath(dir))

  /** The ACTIVE snapshot under the Brier gate: the newest snapshot
    * whose Brier does not worsen on the best-so-far by more than
    * `tolerance`; candidates that fail the gate are skipped (rolled
    * back) in favor of the most recent passing one. */
  def active(spark: SparkSession, dir: String, stage: String, tolerance: Double = 0.15): Option[Snapshot] = {
    val rows = snapshots(spark, dir)
      .where(col("stage") === stage)
      .orderBy("created_seq")
      .collect()
      .map(r => Snapshot(r.getAs[String]("snapshot_id"), r.getAs[String]("stage"),
        r.getAs[Double]("brier"), r.getAs[String]("payload_path"), r.getAs[Long]("created_seq")))
    rows.foldLeft(Option.empty[Snapshot]) { (cur, cand) =>
      cur match {
        case None => Some(cand)
        case Some(best) =>
          if (graft.functions.Calibration.shouldRollback(best.brier, cand.brier, tolerance)) cur
          else Some(cand)
      }
    }
  }
}
