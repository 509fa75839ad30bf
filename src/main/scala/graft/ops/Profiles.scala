package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Person / household profile builders — the reference's cluster
  * OUTPUTS (reference: src/core/household_inference.py:506-706,
  * src/models/household_profile.py:181-245): per-person behavioral
  * aggregates with engagement shares and "Person A/B/C" member-ranking
  * labels, rolled up to household profiles with a type-inference
  * cascade.
  *
  * Person = user, household = account (here the synthetic account key
  * `user_id % 50`, giving the reference's 2-5-member households).
  * Engagement sums go through DECIMAL accumulation so shares are
  * deterministic across engines and summation orders.
  */
object Profiles {

  private def decSum(c: Column) = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Gap-based per-user session stats + decimal-summed engagement. */
  def sessionStats(events: DataFrame, gapUs: Long = 1800000000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("gap_us",
        unix_micros(col("ts").cast("timestamp")) -
          lag(unix_micros(col("ts").cast("timestamp")), 1).over(w))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        (sum(when(col("gap_us") > gapUs, 1).otherwise(0)) + 1).cast("long").as("n_sessions"),
        decSum(col("value")).as("engagement")
      )
  }

  /** Person profiles with household engagement share + member label
    * (household_inference.py:537-543 ranking → chr labels). */
  def personProfiles(events: DataFrame, accountOf: Column => Column = u => pmod(u, lit(50))): DataFrame = {
    val p = sessionStats(events)
      .join(ColdStart.userPersona(events).select("user_id", "persona"), "user_id")
      .withColumn("account_id", accountOf(col("user_id")))
    val shareW = Window.partitionBy("account_id")
    val rankW = Window.partitionBy("account_id").orderBy(col("n_events").desc, col("user_id"))
    p.withColumn("rk", row_number().over(rankW))
      .select(
        col("account_id"), col("user_id"), col("n_events"), col("n_sessions"), col("persona"),
        // the share denominator re-enters the decimal domain before the
        // window sum: each engagement is a 2-dp decimal round-tripped
        // through double (lossless at this magnitude), so summing the
        // DECIMALS is exact and order-free where a double window sum
        // would drift at the ulp with partition order — then ONE IEEE
        // division of two deterministic doubles, as everywhere else
        round(col("engagement") /
          sum(col("engagement").cast(DecimalType(18, 2))).over(shareW).cast("double"), 6)
          .as("engagement_share"),
        concat(lit("Person "), expr("char(64 + rk)")).as("member_label")
      )
  }

  /** Household rollup: size, type cascade, dominant member persona
    * (household_inference.py:648-706). */
  def householdProfiles(events: DataFrame, accountOf: Column => Column = u => pmod(u, lit(50))): DataFrame = {
    val p = ColdStart.userPersona(events).select("user_id", "n_events", "persona")
      .withColumn("account_id", accountOf(col("user_id")))
    val domW = Window.partitionBy("account_id").orderBy(col("cnt").desc, col("persona"))
    val dp = p.groupBy("account_id", "persona").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(domW)).where(col("rk") === 1)
      .select(col("account_id"), col("persona").as("dominant_persona"))
    p.groupBy("account_id")
      .agg(
        count(lit(1)).as("n_members"),
        sum("n_events").as("total_events")
      )
      .withColumn("household_type",
        when(col("n_members") === 1, "single")
          .when(col("n_members") === 2, "couple")
          .otherwise("family"))
      .join(dp, "account_id")
  }
}
