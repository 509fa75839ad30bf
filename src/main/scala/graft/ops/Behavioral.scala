package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Behavioral-segment engine — the computable core of the reference's
  * psychographic segmentation (reference:
  * src/core/behavioral_profiling.py:157-360): template segments over
  * per-user behavior signals, segment attribution shares
  * (share × per-channel efficacy), rank and budget allocation across a
  * segment's top channels. The reference's templates key on device and
  * persona; the driver events table carries neither, so the templates
  * here key on the signals it does have — intent score (weighted
  * event-type mix, exact integer arithmetic so the cross-engine oracle
  * reproduces it bit-for-bit), modal hour band, engagement tier, and
  * spend band. The reference's channel-efficacy constants and the
  * share × efficacy → top-k → budget-normalize pipeline are kept
  * verbatim (`_calculate_segment_attribution` /
  * `_calculate_budget_allocation`).
  */
object Behavioral {

  /** (segment_id, channel, efficacy, roi) template rows —
    * behavioral_profiling.py:173-217's constants reshaped to the
    * available signals. */
  val templates: Seq[(String, String, Double, Double)] = Seq(
    ("high_intent_evening", "email", 0.8, 1.5),
    ("high_intent_evening", "search", 0.7, 1.5),
    ("high_intent_evening", "display", 0.4, 1.5),
    ("low_intent_night", "social", 0.6, 1.2),
    ("low_intent_night", "display", 0.3, 1.2),
    ("low_intent_night", "video", 0.5, 1.2),
    ("family_co_viewing", "tv", 0.9, 1.8),
    ("family_co_viewing", "display", 0.2, 1.8),
    ("family_co_viewing", "social", 0.1, 1.8),
    ("price_sensitive", "email", 0.7, 1.3),
    ("price_sensitive", "search", 0.6, 1.3),
    ("price_sensitive", "display", 0.3, 1.3)
  )

  /** Per-user behavior signals. intent is exact rational arithmetic
    * ((10·purchases + 6·signups + 3·clicks) / (10·n)) — integer sums
    * are order-independent, so both engines compute identical doubles. */
  def userSignals(events: DataFrame): DataFrame = {
    val byBand = events
      .withColumn(
        "band",
        when(hour(col("ts").cast("timestamp")).between(6, 11), "a_morning")
          .when(hour(col("ts").cast("timestamp")).between(12, 17), "b_afternoon")
          .when(hour(col("ts").cast("timestamp")).between(18, 23), "c_evening")
          .otherwise("d_night")
      )
      .groupBy("user_id", "band")
      .agg(count(lit(1)).as("bn"))
    val modal = byBand
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id").orderBy(col("bn").desc, col("band"))))
      .where(col("rk") === 1)
      .select(col("user_id"), col("band").as("modal_band"))
    val sig = events.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("np"),
      sum(when(col("event_type") === "signup", 1).otherwise(0)).as("ns"),
      sum(when(col("event_type") === "click", 1).otherwise(0)).as("nc"),
      sum(col("value")).as("sum_value")
    )
    sig
      .join(modal, "user_id")
      .select(
        col("user_id"), col("n"), col("modal_band"),
        ((col("np") * 10 + col("ns") * 6 + col("nc") * 3).cast("double") /
          (col("n") * 10)).as("intent"),
        (col("sum_value") / col("n")).as("avg_value")
      )
  }

  private def flags(s: DataFrame): DataFrame =
    s.select(
      (col("intent") >= 0.25 && col("modal_band") === "c_evening").as("f_high_intent_evening"),
      (col("intent") <= 0.15 && col("modal_band") === "d_night").as("f_low_intent_night"),
      (col("n") >= 20).as("f_family_co_viewing"),
      (col("avg_value") < 50.0).as("f_price_sensitive")
    )

  /** Segment attribution report: one row per (segment, channel) with
    * the segment's user share, share × efficacy attribution, channel
    * rank inside the segment, and the reference's budget allocation
    * over the segment's top channels. */
  def segmentAttribution(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val f = flags(userSignals(events))
    val counts = f.agg(
      count(lit(1)).as("total"),
      sum(when(col("f_high_intent_evening"), 1).otherwise(0)).as("n_high_intent_evening"),
      sum(when(col("f_low_intent_night"), 1).otherwise(0)).as("n_low_intent_night"),
      sum(when(col("f_family_co_viewing"), 1).otherwise(0)).as("n_family_co_viewing"),
      sum(when(col("f_price_sensitive"), 1).otherwise(0)).as("n_price_sensitive")
    )
    val tpl = templates.toDF("segment_id", "channel", "efficacy", "roi_multiplier")
    val segN: Column = element_at(
      map(
        lit("high_intent_evening"), col("n_high_intent_evening"),
        lit("low_intent_night"), col("n_low_intent_night"),
        lit("family_co_viewing"), col("n_family_co_viewing"),
        lit("price_sensitive"), col("n_price_sensitive")
      ),
      col("segment_id")
    )
    val rows = tpl.crossJoin(counts)
      .withColumn("n_users", segN)
      .withColumn("share", col("n_users").cast("double") / col("total"))
      .withColumn("attribution", col("share") * col("efficacy"))
    val w = Window.partitionBy("segment_id")
    rows
      .withColumn("rnk", row_number().over(
        w.orderBy(col("attribution").desc, col("channel"))))
      .withColumn("budget", when(col("attribution") > 0,
        col("attribution") / sum(col("attribution")).over(w)).otherwise(lit(0.0)))
      .select(
        col("segment_id"), col("channel"), col("n_users"),
        round(col("share"), 6).as("share6"),
        round(col("attribution"), 6).as("attribution6"),
        col("rnk").cast("long").as("rnk"),
        round(col("budget"), 6).as("budget6"),
        col("roi_multiplier")
      )
  }
}
