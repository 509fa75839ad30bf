package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral feature-matrix build for per-account clustering — the
  * reference's weighted feature pipeline
  * (reference: src/core/household_inference.py:211-259 weighted
  * features — time×1.5, device×1.2, genre×1.0 — and the fixed-vocab
  * vectorized variant src/api/optimized_api_server.py:316-391).
  *
  * Output is one dense array<double> per user: cyclical peak-hour
  * encoding (weight 1.5), log1p activity scale (weight 1.2), and the
  * event-type share distribution (weight 1.0) over the fixed vocabulary
  * — fixed column order, so the vector is codegen-built with no map
  * lookups (the reference freezes its vocab the same way,
  * optimized_api_server.py:325-330). Z-scoring happens per-GROUP inside
  * the local K-means fit (the reference normalizes within its
  * per-account model, household_inference.py:321-326) — a global
  * z-score would leak cross-account statistics.
  */
object Features {

  val typeVocab: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  val wTime = 1.5
  val wScale = 1.2
  val wShare = 1.0

  /** Per-user dense feature vector: (user_id, features array<double>). */
  def userFeatures(events: DataFrame): DataFrame = {
    val tau = lit(2 * math.Pi) / 24
    val peak = ColdStart.userPersona(events).select(col("user_id"), col("peak_hour"))
    val counts = events
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n"),
        typeVocab.map(t => sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")): _*
      )
    counts
      .join(peak, "user_id")
      .select(
        col("user_id"),
        array(
          Seq(
            (sin(col("peak_hour") * tau) * wTime).as("f_sin"),
            (cos(col("peak_hour") * tau) * wTime).as("f_cos"),
            (log1p(col("n")) * wScale).as("f_scale")
          ) ++ typeVocab.map(t => (col(s"n_$t").cast("double") / col("n") * wShare).as(s"f_$t")): _*
        ).as("features")
      )
  }
}
