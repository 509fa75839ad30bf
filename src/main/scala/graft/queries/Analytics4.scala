package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Profiles

/** Fourth batch: person/household profile builders (SURVEY.md §2.10
  * rows 57-59, §2.6 member ranking, §2.5 engagement shares) as
  * DuckDB-oracled queries over the events table, plus the per-group
  * K-means and calibration readouts as rows-only queries (their
  * correctness oracles are analytic, in KMeansSpec/CalibrationSpec).
  */
object Analytics4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- person profiles: sessions, engagement share, persona, label ----
    "q25_person_profiles" -> ((s, dir) => Profiles.personProfiles(t(s, dir, "events"))),

    // ---- household rollup: size, type cascade, dominant persona ----
    "q26_household_profiles" -> ((s, dir) => Profiles.householdProfiles(t(s, dir, "events"))),

    // ---- per-group silhouette-selected K-means over embeddings
    //      (group = label; rows-only — Lloyd isn't SQL; KMeansSpec
    //      carries planted-blob oracles) ----
    "op_kmeans_groups" -> ((s, dir) => {
      import s.implicits._
      val pts = t(s, dir, "embeddings")
        .select(
          col("label").cast("string").as("group_id"),
          col("vec_id").cast("string").as("item_id"),
          transform(col("embedding"), _.cast("double")).as("features")
        )
        .as[graft.cluster.KMeans.GroupedPoint]
      graft.cluster.KMeans.clusterGroups(pts).toDF()
        .groupBy("group_id", "k")
        .agg(
          count(lit(1)).as("n_points"),
          countDistinct("cluster").as("n_clusters_used"),
          round(max("silhouette"), 6).as("silhouette")
        )
    }),

    // ---- calibration of the resolution scores vs ground truth:
    //      Brier + ECE of sigmoid(score - threshold) (rows-only;
    //      CalibrationSpec has hand-computed oracles) ----
    "pir_calibration" -> ((s, dir) => {
      val st = Resolution.staged(s, Resolution.scaleFor(dir))
      val thr = graft.scoring.Scoring.Weights().threshold
      val truth = st.labels.select(col("doc_id").as("doc_a"), col("entity_id").as("ent_a"))
      val truthB = st.labels.select(col("doc_id").as("doc_b"), col("entity_id").as("ent_b"))
      val scored = st.scored
        .join(truth, "doc_a").join(truthB, "doc_b")
        .withColumn("p", graft.functions.Calibration.sigmoid(col("score") - lit(thr)))
        .withColumn("y", (col("ent_a") === col("ent_b")).cast("double"))
      val b = graft.functions.Calibration.brier(scored, col("p"), col("y"))
        .select(round(col("brier"), 6).as("brier"), col("n"))
      val e = graft.functions.Calibration.ece(scored, col("p"), col("y"))
        .select(round(col("ece"), 6).as("ece"))
      b.crossJoin(e).select("brier", "ece", "n")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q25_person_profiles" ->
      """WITH sess AS (
         SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_sessions,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS engagement
         FROM (
           SELECT user_id, value,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
           FROM events) GROUP BY user_id),
       dom AS (SELECT user_id, event_type AS dom_type FROM (
         SELECT user_id, event_type, row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rk
         FROM events GROUP BY user_id, event_type) WHERE rk = 1),
       peak AS (SELECT user_id, h AS peak_hour FROM (
         SELECT user_id, extract(hour FROM ts) AS h, row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, h) AS rk
         FROM events GROUP BY user_id, h) WHERE rk = 1),
       p AS (
         SELECT s.user_id, s.user_id % 50 AS account_id, n_events, n_sessions, engagement,
           CASE WHEN dom_type = 'purchase' THEN 'buyer'
                WHEN peak_hour BETWEEN 0 AND 5 THEN 'night_owl'
                WHEN peak_hour BETWEEN 6 AND 11 THEN 'morning'
                WHEN peak_hour BETWEEN 12 AND 17 THEN 'afternoon'
                ELSE 'evening' END AS persona
         FROM sess s JOIN dom USING (user_id) JOIN peak USING (user_id))
       SELECT account_id, user_id, n_events, n_sessions, persona,
         round(engagement / sum(engagement) OVER (PARTITION BY account_id), 6) AS engagement_share,
         'Person ' || chr(CAST(64 + row_number() OVER (PARTITION BY account_id ORDER BY n_events DESC, user_id) AS INTEGER)) AS member_label
       FROM p""",
    "q26_household_profiles" ->
      """WITH sess AS (
         SELECT user_id, user_id % 50 AS account_id, count(*) AS n_events FROM events GROUP BY user_id),
       dom AS (SELECT user_id, event_type AS dom_type FROM (
         SELECT user_id, event_type, row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rk
         FROM events GROUP BY user_id, event_type) WHERE rk = 1),
       peak AS (SELECT user_id, h AS peak_hour FROM (
         SELECT user_id, extract(hour FROM ts) AS h, row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, h) AS rk
         FROM events GROUP BY user_id, h) WHERE rk = 1),
       p AS (SELECT s.*, CASE WHEN dom_type = 'purchase' THEN 'buyer'
                WHEN peak_hour BETWEEN 0 AND 5 THEN 'night_owl'
                WHEN peak_hour BETWEEN 6 AND 11 THEN 'morning'
                WHEN peak_hour BETWEEN 12 AND 17 THEN 'afternoon'
                ELSE 'evening' END AS persona
         FROM sess s JOIN dom USING (user_id) JOIN peak USING (user_id)),
       dp AS (SELECT account_id, persona AS dominant_persona FROM (
         SELECT account_id, persona, row_number() OVER (PARTITION BY account_id ORDER BY count(*) DESC, persona) AS rk
         FROM p GROUP BY account_id, persona) WHERE rk = 1)
       SELECT p.account_id, count(*) AS n_members, CAST(sum(n_events) AS BIGINT) AS total_events,
         CASE WHEN count(*) = 1 THEN 'single' WHEN count(*) = 2 THEN 'couple' ELSE 'family' END AS household_type,
         min(dominant_persona) AS dominant_persona
       FROM p JOIN dp ON p.account_id = dp.account_id
       GROUP BY p.account_id"""
  )
}
