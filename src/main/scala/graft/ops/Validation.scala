package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Input-validation stage with reject-reason accounting — the
  * reference's first line of defense against dirty input
  * (reference: src/validation/input_validator.py:43-141: required
  * fields, enum domains, timestamp sanity 2020-2030, non-negative
  * values).
  *
  * One `when` cascade (first failing rule names the reason) — a single
  * codegen'd projection, no UDFs; the reject-reason histogram is one
  * hash aggregate. At 100 TB this runs inline with the ingest scan.
  */
object Validation {

  /** Ordered rules: (reason, predicate-that-FAILS-the-row). */
  def reasonColumn(rules: Seq[(String, Column)]): Column =
    rules.foldRight(lit("ok")) { case ((reason, bad), rest) => when(bad, lit(reason)).otherwise(rest) }

  /** Standard rule set for the events table (mirrors
    * input_validator.py's required/domain/range checks). */
  def eventRules(validTypes: Seq[String] = Seq("click", "view", "purchase", "signup", "error")): Seq[(String, Column)] = Seq(
    "missing_user" -> col("user_id").isNull,
    "bad_event_type" -> (col("event_type").isNull || !col("event_type").isin(validTypes: _*)),
    "bad_value" -> (col("value").isNull || col("value") < 0),
    "ts_out_of_range" -> (col("ts").isNull || year(col("ts")) < 2020 || year(col("ts")) >= 2030)
  )

  /** Annotate rows with their reject reason ('ok' = clean). */
  def annotate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.withColumn("reject_reason", reasonColumn(rules))

  /** Clean subset. */
  def clean(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    annotate(df, rules).where(col("reject_reason") === "ok").drop("reject_reason")

  /** Reject-reason metrics: (reason, n) including the 'ok' row. */
  def rejectMetrics(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    annotate(df, rules).groupBy(col("reject_reason").as("reason")).agg(count(lit(1)).as("n"))
}
