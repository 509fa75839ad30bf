package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** General analytics operators over the driver testdata tables, each
  * with a DuckDB-equivalent oracle SQL (column names aliased
  * identically on both sides — the driver sorts columns by name and
  * hashes values).
  *
  * Numeric-determinism policy: outputs are either exact (counts,
  * integer-valued double sums < 2^53, min/max) or go through
  * DECIMAL(18,2) accumulation cast back to double, so Spark and DuckDB
  * agree bit-for-bit regardless of summation order. No raw double
  * sums, no stddev/percentile in oracle-checked outputs.
  *
  * These realize the reference's aggregation/window/join semantics
  * (SURVEY.md §2.4-2.7) on relational data: sessionization mirrors
  * the reference's gap-based session grouping
  * (reference: src/models/streaming_event.py:284-368), top-k per group
  * mirrors its link pruning (src/core/cross_device_linker.py:385-412),
  * the temporal range join mirrors its temporal correlation
  * (src/core/cross_device_linker.py:240-291).
  */
object Analytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Decimal-accumulated money sum, cast back to double: deterministic
    * across engines and summation orders. */
  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation (TPC-H Q1 style; SURVEY.md §2.5) ----
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          count(lit(1)).as("count_order"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty")
        )
    }),

    // ---- window top-k per group (§2.6) ----
    "q2_topk_orders" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rk").cast("bigint").as("rk"))
    }),

    // ---- gap-based sessionization (§2.3; streaming_event.py:284-368) ----
    "q3_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts").cast("timestamp")), 1).over(w))
        .withColumn(
          "brk",
          when(unix_micros(col("ts").cast("timestamp")) - col("prev_us") > lit(1800000000L), 1).otherwise(0)
        )
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          (sum("brk") + 1).as("n_sessions")
        )
    }),

    // ---- broadcast join + agg (§2.4) ----
    "q4_segment_revenue" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("total_price")
        )
    }),

    // ---- fingerprint dedup (training-data op): exact-hash grouping on a
    //      40-char prefix fingerprint (plain GROUP BY text finds nothing
    //      in this corpus) ----
    "q5_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(substring(col("text"), 1, 40).as("fp"))
        .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .select("canonical_id", "n_copies")
    }),

    // ---- token/char stats per language (text analysis op) ----
    "q6_token_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn(
          "tokens",
          length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1
        )
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("tokens").as("sum_tokens"),
          sum("n_chars").as("sum_chars")
        )
    }),

    // ---- relational set op (§2.8) ----
    "q7_purchasers_with_errors" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.filter(col("event_type") === "purchase").select("user_id").distinct()
        .intersect(ev.filter(col("event_type") === "error").select("user_id").distinct())
    }),

    // ---- temporal range join (§2.4; cross_device_linker.py:240-291) ----
    "q8_click_to_purchase" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("pt"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("ct"))
      p.join(c, Seq("user_id"))
        .filter(col("pt") - col("ct") >= 0 && col("pt") - col("ct") <= lit(1800000000L))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_attributed"))
    }),

    // ---- multi-way broadcast join rollup (§2.4) ----
    "q9_nation_rollup" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          moneySum(col("c_acctbal")).as("total_acctbal")
        )
    }),

    // ---- per-type event extremes (exact min/max; §2.5) ----
    "q10_event_extremes" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          min("value").as("min_value"),
          max("value").as("max_value"),
          min("ts").as("first_ts"),
          max("ts").as("last_ts")
        )
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         count(*) AS count_order,
         sum(l_quantity) / count(*) AS avg_qty
         FROM lineitem WHERE l_shipdate <= '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q2_topk_orders" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) WHERE rk <= 3""",
    "q3_sessionize" ->
      """WITH g AS (
           SELECT user_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events)
         SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN us - prev_us > 1800000000 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_sessions
         FROM g GROUP BY user_id""",
    "q4_segment_revenue" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q5_dedup_exact" ->
      """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
         FROM documents GROUP BY substr(text, 1, 40) HAVING count(*) > 1""",
    "q6_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS sum_tokens,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY lang""",
    "q7_purchasers_with_errors" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
         INTERSECT
         SELECT DISTINCT user_id FROM events WHERE event_type = 'error'""",
    "q8_click_to_purchase" ->
      """SELECT p.user_id AS user_id, count(*) AS n_attributed
         FROM (SELECT user_id, epoch_us(ts) AS pt FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT user_id, epoch_us(ts) AS ct FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id
         WHERE p.pt - c.ct >= 0 AND p.pt - c.ct <= 1800000000
         GROUP BY p.user_id""",
    "q9_nation_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q10_event_extremes" ->
      """SELECT event_type, count(*) AS n,
         min(value) AS min_value, max(value) AS max_value,
         min(ts) AS first_ts, max(ts) AS last_ts
         FROM events GROUP BY event_type"""
  )
}
