package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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

    // ---- feature encoding: log1p scaling, cyclical sin/cos hour
    //      encoding, euclidean distance (§2.9 rows 39/40/44) ----
    "q27_feature_encode" -> ((s, dir) => {
      // peak hour + event count from the shared single-scan
      // grouping-sets pass (ColdStart.userPersona)
      val up = graft.ops.ColdStart.userPersona(t(s, dir, "events"))
        .select(col("user_id"), col("n_events"), col("peak_hour").as("h"))
      val tau = lit(2 * math.Pi) / 24
      up
        .withColumn("sin_h", sin(col("h") * tau))
        .withColumn("cos_h", cos(col("h") * tau))
        .select(
          col("user_id"),
          col("n_events"),
          round(log1p(col("n_events")), 6).as("log_events"),
          // + 0.0 normalizes IEEE −0.0 (cos(3π/2) rounds to a signed
          // zero whose sign depends on op order) so value hashes agree
          (round(col("sin_h"), 6) + lit(0.0)).as("sin_hour"),
          (round(col("cos_h"), 6) + lit(0.0)).as("cos_hour"),
          // euclidean distance of the hour encoding from midnight (0, 1)
          round(sqrt(pow(col("sin_h"), 2) + pow(col("cos_h") - 1, 2)), 6).as("midnight_dist")
        )
    }),

    // ---- cross-engine SimHash near-dup pairs: md5 word hashes,
    //      60-bit sketch, banded candidates, hamming <= 3 (the DuckDB
    //      oracle recomputes the identical sketch brute-force) ----
    // maxBucket is UNCAPPED here: the DuckDB oracle is brute-force over
    // all pairs, so the banded side must not drop oversized buckets or
    // the claimed set equality breaks on homogeneous corpora. Production
    // use keeps the default cap (Dedup.simhashMd5Pairs).
    "q28_simhash_md5" -> ((s, dir) =>
      graft.ops.Dedup.simhashMd5Pairs(
        t(s, dir, "documents").select(col("doc_id").as("id"), col("text")),
        maxBucket = Int.MaxValue)),

    // ---- centroid drift (the 5th reference drift check,
    //      drift_detection.py:230-260): L2 shift of per-label mean
    //      embedding between the two vec_id-parity halves ----
    "q29_centroid_drift" -> ((s, dir) => {
      val ex = t(s, dir, "embeddings").select(
        col("label"),
        pmod(col("vec_id"), lit(2)).as("half"),
        posexplode(col("embedding")).as(Seq("pos", "x"))
      )
      val m = ex.groupBy("label", "pos").agg(
        avg(when(col("half") === 0, col("x"))).as("m0"),
        avg(when(col("half") === 1, col("x"))).as("m1")
      )
      val shift = sqrt(sum(pow(col("m0") - col("m1"), 2)))
      m.groupBy("label").agg(
        round(shift, 4).as("centroid_shift"),
        when(shift >= 2.0, "high").when(shift >= 1.0, "medium")
          .when(shift >= 0.5, "low").otherwise("none").as("severity")
      )
    }),

    // ---- per-group K-means over embeddings, DETERMINISTIC distributed
    //      Lloyd (fixed k, lowest-id init, order-fixed fp folds — the
    //      q35 recipe applied to the op path so DuckDB reproduces the
    //      assignments; silhouette-selected clusterGroups stays the
    //      production API, oracled analytically in KMeansSpec). The
    //      output is all-integer: counts + an assignment checksum
    //      Σ (item_id+1)·(cluster+1) — BOTH factors offset so id 0 and
    //      cluster 0 still contribute (the testdata's min ids ARE 0) —
    //      so any fp divergence that flipped a single assignment would
    //      break the cross-engine match ----
    "op_kmeans_groups" -> ((s, dir) => {
      val pts = t(s, dir, "embeddings")
        .select(
          col("label").as("group_id"),
          col("vec_id").as("item_id"),
          transform(col("embedding"), _.cast("double")).as("features")
        )
      graft.cluster.KMeans.lloydDeterministic(pts, k = 4, iters = 2)
        .groupBy("group_id")
        .agg(
          count(lit(1)).as("n_points"),
          countDistinct("cluster").as("n_clusters_used"),
          sum((col("item_id") + lit(1L)) * (col("cluster") + lit(1L))).as("assign_checksum")
        )
    }),

    // ---- the reference's core per-account clustering: weighted
    //      behavior features → per-household z-score → K-means
    //      (household_inference.py:71-127), DETERMINISTIC end to end so
    //      DuckDB recomputes features, normalization AND Lloyd exactly.
    //      Features are rounded to 6 digits on BOTH engines before the
    //      arithmetic: sin/cos/log1p differ across engines at ulp, and
    //      q27's green oracle proves this value set rounds identically;
    //      everything after the rounding is +,−,×,÷,√ with order-fixed
    //      folds (zScoreDeterministic / lloydDeterministic) ----
    "op_kmeans_households" -> ((s, dir) => {
      val feats = graft.ops.Features.userFeatures(t(s, dir, "events"))
        .select(
          pmod(col("user_id"), lit(50)).as("group_id"),
          col("user_id").as("item_id"),
          // + 0.0 normalizes IEEE −0.0 from the rounded cos encoding
          transform(col("features"), x => round(x, 6) + lit(0.0)).as("features")
        )
      val z = graft.cluster.KMeans.zScoreDeterministic(feats)
      graft.cluster.KMeans.lloydDeterministic(z, k = 3, iters = 2)
        .groupBy("group_id")
        .agg(
          count(lit(1)).as("n_members"),
          countDistinct("cluster").as("n_clusters_used"),
          sum((col("item_id") + lit(1L)) * (col("cluster") + lit(1L))).as("assign_checksum")
        )
    }),

    // ---- feedback-loop A/B harness (feedback_loop.py:121-611):
    //      deterministic md5 bucket assignment (cross-engine), per-day
    //      conversion-rate trend per bucket ----
    "q30_ab_trend" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("bucket",
          pmod(conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10).cast("long"), lit(2)))
        .withColumn("day", to_date(col("ts").cast("timestamp")))
      ev.groupBy("bucket", "day")
        .agg(
          countDistinct("user_id").as("n_users"),
          countDistinct(when(col("event_type") === "purchase", col("user_id"))).as("n_conv")
        )
        .select(
          col("bucket"),
          // string day: DATE columns reach pandas as different dtypes
          // from the two engines' parquet/df paths
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_users"), col("n_conv"),
          round(col("n_conv").cast("double") / col("n_users"), 6).as("conv_rate")
        )
    }),

    // ---- GMM per-group clustering (the reference's accuracy-headline
    //      model, gaussian_mixture.py; BIC-selected k). Rows-only —
    //      GmmSpec carries the analytic oracles ----
    "op_gmm_groups" -> ((s, dir) => {
      import s.implicits._
      val pts = graft.ops.Features.userFeatures(t(s, dir, "events"))
        .select(
          pmod(col("user_id"), lit(50)).cast("string").as("group_id"),
          col("user_id").cast("string").as("item_id"),
          col("features")
        )
        .as[graft.cluster.KMeans.GroupedPoint]
      graft.cluster.Gmm.clusterGroups(pts).toDF()
        .groupBy("group_id")
        .agg(
          count(lit(1)).as("n_members"),
          max("k").as("k"),
          round(min("responsibility"), 6).as("min_resp")
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

  // q28 oracle: the identical 60-bit md5 simhash sketch, recomputed in
  // DuckDB and paired brute-force (the Spark side bands; band
  // completeness for hamming <= 3 makes the sets equal)
  private val simhashOracle: String = {
    val bits = 60
    val sTerms = (0 until bits)
      .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i")
      .mkString(",\n         ")
    val sketch = (0 until bits)
      .map(i => s"(CASE WHEN s$i >= 0 THEN (1::BIGINT << $i) ELSE 0::BIGINT END)")
      .mkString(" | ")
    s"""WITH w AS (
       SELECT doc_id, unnest(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')), ' '), x -> len(x) > 0)) AS word
       FROM documents),
     h AS (SELECT doc_id, CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS h FROM w),
     s AS (SELECT doc_id,
         $sTerms
       FROM h GROUP BY doc_id),
     sk AS (SELECT doc_id, $sketch AS sketch FROM s)
     SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sketch, b.sketch)) AS BIGINT) AS hamming
     FROM sk a JOIN sk b ON a.doc_id < b.doc_id
     WHERE bit_count(xor(a.sketch, b.sketch)) <= 3"""
  }

  /** op_kmeans_groups oracle: deterministic Lloyd (LloydSql chain) over
    * raw embeddings, per-group integer summary. */
  private val kmeansGroupsOracle: String =
    s"""WITH pts AS (
       SELECT label AS group_id, vec_id AS item_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       FROM embeddings),
     ${LloydSql.chain(k = 4, iters = 2, dim = 64)}
     SELECT group_id, count(*) AS n_points, count(DISTINCT cluster) AS n_clusters_used,
       CAST(sum((item_id + 1) * (cluster + 1)) AS BIGINT) AS assign_checksum
     FROM a2 GROUP BY group_id"""

  /** op_kmeans_households oracle: the full reference chain — weighted
    * feature build (round-6 on both engines; q27 proves the rounding
    * agrees), order-fixed per-group z-score, deterministic Lloyd. */
  private val kmeansHouseholdsOracle: String =
    s"""WITH f0 AS (
       SELECT user_id, count(*) AS n,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase,
         sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_signup,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view
       FROM events GROUP BY user_id),
     peak AS (SELECT user_id, h FROM (
       SELECT user_id, extract(hour FROM ts) AS h,
         row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, h) AS rk
       FROM events GROUP BY user_id, h) WHERE rk = 1),
     feat AS (
       SELECT user_id % 50 AS group_id, user_id AS item_id,
         [round(sin(h * (2 * pi() / 24)) * 1.5, 6) + 0.0,
          round(cos(h * (2 * pi() / 24)) * 1.5, 6) + 0.0,
          round(ln(1 + n) * 1.2, 6) + 0.0,
          round(CAST(n_click AS DOUBLE) / n, 6) + 0.0,
          round(CAST(n_error AS DOUBLE) / n, 6) + 0.0,
          round(CAST(n_purchase AS DOUBLE) / n, 6) + 0.0,
          round(CAST(n_signup AS DOUBLE) / n, 6) + 0.0,
          round(CAST(n_view AS DOUBLE) / n, 6) + 0.0] AS f
       FROM f0 JOIN peak USING (user_id)),
     fx AS (SELECT group_id, item_id, g.pos AS pos, f[CAST(g.pos + 1 AS INTEGER)] AS x
            FROM feat, (SELECT unnest(range(8)) AS pos) g),
     mu AS (SELECT group_id, pos, list_reduce(list(x ORDER BY item_id), (a, b) -> a + b) / count(*) AS mu
            FROM fx GROUP BY 1, 2),
     fxm AS (SELECT fx.group_id, fx.item_id, fx.pos, fx.x, mu.mu FROM fx JOIN mu USING (group_id, pos)),
     sd AS (SELECT group_id, pos,
              sqrt(list_reduce(list((x - mu) * (x - mu) ORDER BY item_id), (a, b) -> a + b) / count(*)) AS sd
            FROM fxm GROUP BY 1, 2),
     pts AS (SELECT group_id, item_id,
               list(CASE WHEN sd > 0 THEN (x - mu) / sd ELSE 0.0 END ORDER BY pos) AS v
             FROM fxm JOIN sd USING (group_id, pos) GROUP BY 1, 2),
     ${LloydSql.chain(k = 3, iters = 2, dim = 8)}
     SELECT group_id, count(*) AS n_members, count(DISTINCT cluster) AS n_clusters_used,
       CAST(sum((item_id + 1) * (cluster + 1)) AS BIGINT) AS assign_checksum
     FROM a2 GROUP BY group_id"""

  val oracleSql: Map[String, String] = Map(
    "op_kmeans_groups" -> kmeansGroupsOracle,
    "op_kmeans_households" -> kmeansHouseholdsOracle,
    "q27_feature_encode" ->
      """WITH n AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
       peak AS (SELECT user_id, h FROM (
         SELECT user_id, extract(hour FROM ts) AS h, row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, h) AS rk
         FROM events GROUP BY user_id, h) WHERE rk = 1)
       SELECT n.user_id, n_events,
         round(ln(1 + n_events), 6) AS log_events,
         round(sin(h * (2 * pi() / 24)), 6) + 0.0 AS sin_hour,
         round(cos(h * (2 * pi() / 24)), 6) + 0.0 AS cos_hour,
         round(sqrt(pow(sin(h * (2 * pi() / 24)), 2) + pow(cos(h * (2 * pi() / 24)) - 1, 2)), 6) AS midnight_dist
       FROM n JOIN peak ON n.user_id = peak.user_id""",
    "q28_simhash_md5" -> simhashOracle,
    "q30_ab_trend" ->
      """WITH e AS (
         SELECT user_id, event_type,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 AS bucket,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
         FROM events)
       SELECT bucket, day, count(DISTINCT user_id) AS n_users,
         count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS n_conv,
         round(CAST(count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS DOUBLE) / count(DISTINCT user_id), 6) AS conv_rate
       FROM e GROUP BY bucket, day""",
    "q29_centroid_drift" ->
      """WITH ex AS (
         SELECT label, vec_id % 2 AS half, embedding[g.p + 1] AS x, g.p AS pos
         FROM embeddings, (SELECT unnest(range(64)) AS p) g),
       m AS (
         SELECT label, pos,
           avg(CASE WHEN half = 0 THEN x END) AS m0,
           avg(CASE WHEN half = 1 THEN x END) AS m1
         FROM ex GROUP BY label, pos)
       SELECT label, round(sqrt(sum(pow(m0 - m1, 2))), 4) AS centroid_shift,
         CASE WHEN sqrt(sum(pow(m0 - m1, 2))) >= 2.0 THEN 'high'
              WHEN sqrt(sum(pow(m0 - m1, 2))) >= 1.0 THEN 'medium'
              WHEN sqrt(sum(pow(m0 - m1, 2))) >= 0.5 THEN 'low' ELSE 'none' END AS severity
       FROM m GROUP BY label""",
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
         round(engagement / CAST(sum(CAST(engagement AS DECIMAL(18,2))) OVER (PARTITION BY account_id) AS DOUBLE), 6) AS engagement_share,
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
