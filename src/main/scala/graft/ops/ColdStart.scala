package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Cold-start gating + persona rules — the reference's low-data path
  * (reference: src/core/cold_start.py:122-325): accounts are routed by
  * observation count to progressively richer strategies, and a rule
  * cascade maps behavioral aggregates to persona labels
  * (cold_start.py:304-325, household_inference.py:618-646).
  *
  * Pure `when` cascades over grouped aggregates — fully codegen'd, two
  * hash aggregates + two windows, no driver state.
  */
object ColdStart {

  /** Strategy tiers from the reference's session-count gates
    * (cold_start.py:148-176). */
  def strategy(nEvents: Column): Column =
    when(nEvents < 3, "account_level")
      .when(nEvents < 7, "bayesian_prior")
      .when(nEvents < 10, "heuristic")
      .otherwise("full_model")

  /** Persona from dominant activity + peak hour (cold_start.py:304-325
    * style rule cascade). */
  def persona(domType: Column, peakHour: Column): Column =
    when(domType === "purchase", "buyer")
      .when(peakHour.between(0, 5), "night_owl")
      .when(peakHour.between(6, 11), "morning")
      .when(peakHour.between(12, 17), "afternoon")
      .otherwise("evening")

  /** Per-user behavioral modes: (user_id, dom_type, peak_hour, persona).
    * Shared by cold-start routing and the profile builders. */
  def userPersona(events: DataFrame): DataFrame = {
    val domW = Window.partitionBy("user_id").orderBy(col("cnt").desc, col("event_type"))
    val dom = events.groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(domW)).where(col("rk") === 1)
      .select(col("user_id"), col("event_type").as("dom_type"))
    val peakW = Window.partitionBy("user_id").orderBy(col("cnt").desc, col("h"))
    val peak = events.select(col("user_id"), hour(col("ts").cast("timestamp")).as("h"))
      .groupBy("user_id", "h").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(peakW)).where(col("rk") === 1)
      .select(col("user_id"), col("h").as("peak_hour"))
    dom.join(peak, "user_id")
      .withColumn("persona", persona(col("dom_type"), col("peak_hour")))
  }

  /** Per-user cold-start routing over an event stream:
    * (user_id, n_events, strategy, persona). */
  def route(events: DataFrame): DataFrame = {
    val n = events.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    n.join(userPersona(events), "user_id")
      .select(
        col("user_id"),
        col("n_events"),
        strategy(col("n_events")).as("strategy"),
        col("persona")
      )
  }
}
