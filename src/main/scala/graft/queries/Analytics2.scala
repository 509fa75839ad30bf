package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Similarity, TextAnalysis}

/** Second batch of DuckDB-oracled operators: similarity search,
  * text-quality aggregation, regex tokenization, distribution/top-k
  * aggregates, mode, and drift components (SURVEY.md §2.5-2.6, §2.10
  * drift detector).
  *
  * Float policy (same as Analytics): no cross-row float accumulation
  * in outputs except the deterministic index-ordered cosine fold —
  * DuckDB recomputes it with double math where ulp-level divergence
  * cannot flip any reported value (thresholds sit far from data
  * points; outputs round to 6 decimals).
  */
object Analytics2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- brute-force cosine similarity pairs over embeddings ----
    "q11_ann_pairs" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings")
        .where(col("vec_id") < 1000)
        .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
      val la = vecs.select(col("id").as("id_a"), col("label").as("label_a"))
      val lb = vecs.select(col("id").as("id_b"), col("label").as("label_b"))
      Similarity.cosinePairs(vecs.select("id", "vec"), 0.30)
        .join(la, "id_a").join(lb, "id_b")
        .select(
          col("id_a"), col("id_b"),
          round(col("cos"), 6).as("cos6"),
          (col("label_a") === col("label_b")).as("same_label")
        )
    }),

    // ---- corpus quality profile per (lang, source): int-sum components ----
    "q12_quality_profile" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("n_tokens", TextAnalysis.tokenCountWhitespace(col("text")))
        .withColumn("n_alpha", length(regexp_replace(col("text"), "[^A-Za-z]", "")))
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").as("sum_tokens"),
          sum("n_alpha").as("sum_alpha"),
          sum(length(col("text"))).as("sum_len")
        )
    }),

    // ---- BPE-ish regex token counting ----
    "q13_regex_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("n_sub", TextAnalysis.tokenCountRegex(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_sub").as("sum_subtokens"))
    }),

    // ---- hour-of-day histogram + top-3 hours per event type ----
    "q14_hourly_topk" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .withColumn("hour", hour(col("ts").cast("timestamp")))
        .groupBy("event_type", "hour")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy(col("n").desc, col("hour"))
      hourly
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("event_type"), col("hour").cast("bigint").as("hour"), col("n"), col("rk").cast("bigint").as("rk"))
    }),

    // ---- mode (most common event type) per user, deterministic tie-break ----
    "q15_user_mode" -> ((s, dir) => {
      val cnt = t(s, dir, "events").groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id").orderBy(col("n").desc, col("event_type"))
      cnt.withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("n").as("mode_n"))
    }),

    // ---- composition-drift components: first vs second half of the
    //      stream (reference drift detector, drift_detection.py:352-368);
    //      per-row arithmetic only, no float accumulation ----
    "q16_drift_components" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      // floor() on both engines: Spark's cast("long") truncates while
      // DuckDB's CAST AS BIGINT rounds — explicit floor keeps the
      // half-split boundary identical for odd time ranges
      val mid = ev.agg(min(unix_micros(col("ts").cast("timestamp"))) +
        floor((max(unix_micros(col("ts").cast("timestamp"))) - min(unix_micros(col("ts").cast("timestamp")))) / 2).cast("long")).head().getLong(0)
      val base = ev.where(unix_micros(col("ts").cast("timestamp")) < mid)
        .groupBy("event_type").agg(count(lit(1)).as("base_n"))
      val cur = ev.where(unix_micros(col("ts").cast("timestamp")) >= mid)
        .groupBy("event_type").agg(count(lit(1)).as("cur_n"))
      base.join(cur, Seq("event_type"), "full")
        .select(
          col("event_type"),
          coalesce(col("base_n"), lit(0L)).as("base_n"),
          coalesce(col("cur_n"), lit(0L)).as("cur_n"),
          round(
            pow(coalesce(col("cur_n"), lit(0L)) - coalesce(col("base_n"), lit(0L)), 2) /
              greatest(coalesce(col("base_n"), lit(0L)), lit(1L)),
            6
          ).as("chi2_term")
        )
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q11_ann_pairs" ->
      """WITH e AS (
           SELECT vec_id AS id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings WHERE vec_id < 1000),
         p AS (
           SELECT a.id AS id_a, b.id AS id_b,
             list_sum(list_zip(a.v, b.v).list_transform(z -> z[1] * z[2])) /
               (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
                sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos,
             (a.label = b.label) AS same_label
           FROM e a JOIN e b ON a.id < b.id)
         SELECT id_a, id_b, round(cos, 6) AS cos6, same_label
         FROM p WHERE cos >= 0.30""",
    "q12_quality_profile" ->
      """SELECT lang, source, count(*) AS n_docs,
           CAST(sum(len(list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), w -> len(w) > 0))) AS BIGINT) AS sum_tokens,
           CAST(sum(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))) AS BIGINT) AS sum_alpha,
           CAST(sum(length(text)) AS BIGINT) AS sum_len
         FROM documents GROUP BY lang, source""",
    "q13_regex_tokens" ->
      """SELECT source, count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS sum_subtokens
         FROM documents GROUP BY source""",
    "q14_hourly_topk" ->
      """SELECT event_type, hour, n, rk FROM (
           SELECT event_type, hour, n,
             row_number() OVER (PARTITION BY event_type ORDER BY n DESC, hour) AS rk
           FROM (
             SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour, count(*) AS n
             FROM events GROUP BY 1, 2))
         WHERE rk <= 3""",
    "q15_user_mode" ->
      """SELECT user_id, event_type AS mode_type, n AS mode_n FROM (
           SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
           FROM (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2))
         WHERE rk = 1""",
    "q16_drift_components" ->
      """WITH b AS (SELECT min(epoch_us(ts)) + CAST(floor((max(epoch_us(ts)) - min(epoch_us(ts))) / 2) AS BIGINT) AS mid FROM events),
         base AS (SELECT event_type, count(*) AS base_n FROM events, b WHERE epoch_us(ts) < mid GROUP BY event_type),
         cur AS (SELECT event_type, count(*) AS cur_n FROM events, b WHERE epoch_us(ts) >= mid GROUP BY event_type)
         SELECT coalesce(base.event_type, cur.event_type) AS event_type,
           coalesce(base_n, 0) AS base_n, coalesce(cur_n, 0) AS cur_n,
           round(pow(coalesce(cur_n, 0) - coalesce(base_n, 0), 2) / greatest(coalesce(base_n, 0), 1), 6) AS chi2_term
         FROM base FULL JOIN cur ON base.event_type = cur.event_type"""
  )
}
