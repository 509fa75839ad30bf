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

  /** One GROUPING SETS pass producing BOTH per-(user, event_type) and
    * per-(user, hour) counts — a single scan + shuffle where the naive
    * form reads the events table three times (dominant type, peak hour,
    * event count). At 100 TB the input scan dominates; everything
    * downstream of this aggregate is tiny. */
  private def modeCounts(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_type"), hour(col("ts").cast("timestamp")).as("h"))
      .groupingSets(
        Seq(Seq(col("user_id"), col("event_type")), Seq(col("user_id"), col("h"))),
        col("user_id"), col("event_type"), col("h")
      )
      // grouping_id disambiguates the sets even if the data itself held
      // null event_type/hour values: bit set = column aggregated away
      .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"))

  /** Per-user behavioral modes: (user_id, n_events, dom_type, peak_hour,
    * persona). Shared by cold-start routing and the profile builders. */
  def userPersona(events: DataFrame): DataFrame = {
    // materialized once: three branches read it (dominant type, peak
    // hour, event count) and would otherwise re-run the scan+aggregate
    val gs = modeCounts(events).localCheckpoint(true)
    val byType = gs.where(col("gid") === 1) // (user_id, event_type): h aggregated
    val byHour = gs.where(col("gid") === 2) // (user_id, h): event_type aggregated
    val domW = Window.partitionBy("user_id").orderBy(col("cnt").desc, col("event_type"))
    val dom = byType
      .withColumn("rk", row_number().over(domW)).where(col("rk") === 1)
      .select(col("user_id"), col("event_type").as("dom_type"))
    val peakW = Window.partitionBy("user_id").orderBy(col("cnt").desc, col("h"))
    val peak = byHour
      .withColumn("rk", row_number().over(peakW)).where(col("rk") === 1)
      .select(col("user_id"), col("h").as("peak_hour"))
    val n = byType.groupBy("user_id").agg(sum("cnt").cast("long").as("n_events"))
    n.join(dom, "user_id").join(peak, "user_id")
      .withColumn("persona", persona(col("dom_type"), col("peak_hour")))
  }

  /** Per-user cold-start routing over an event stream:
    * (user_id, n_events, strategy, persona). */
  def route(events: DataFrame): DataFrame =
    userPersona(events)
      .select(
        col("user_id"),
        col("n_events"),
        strategy(col("n_events")).as("strategy"),
        col("persona")
      )
}
