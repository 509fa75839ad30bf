package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sixth batch — round-5: the integrated attribution breakdown, closing
  * the last uncovered reference file
  * (src/attribution/integrated_pipeline.py:129-320).
  *
  * q40: per-persona channel credit — the reference pipeline's step 3
  * (`_compute_persona_attributions`: converting members' conversion
  * value aggregated by persona type) joined with its path extraction
  * (`_extract_attribution_paths`: ordered pre-conversion channel
  * sequences per person) so each persona's conversion value is also
  * broken down by the channels that touched it, removal-effect style
  * (a channel is credited with the full value of every converting user
  * whose pre-conversion path contains it — q17/q18's path semantics).
  * The reference's per-device breakdown (step 4) keys on a session
  * device_type the driver events table doesn't carry; the persona axis
  * is the one with a faithful input here.
  *
  * Conversion values are summed as DECIMAL(18,2) (exact, order-free —
  * the q25 engagement pattern) so the cross-engine hashes can't drift
  * on float association; shares divide two exact decimals as doubles.
  *
  * q41: IVF-flat ANN top-k over the embeddings table
  * ([[graft.ops.Ivf]]): deterministic-Lloyd coarse quantizer (the q35
  * twin, via LloydSql.chain) → nprobe nearest cells per query → cosine
  * top-k within probed cells. The oracle replays quantizer training,
  * cell assignment, probing, and cosine ranking with the identical
  * order-fixed folds, so ranks match bit-exactly cross-engine.
  */
object Analytics6 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_persona_attribution" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val personas = graft.ops.Profiles.personProfiles(ev).select(col("user_id"), col("persona"))
      // converting users + their ordered pre-conversion channel paths
      // (the q17 path machinery: conversion terminates the path)
      val paths = graft.attribution.Attribution.userPaths(ev).where(col("converted"))
      val convVal = ev.where(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(sum(col("value").cast("decimal(18,2)")).as("conv_value"))
      val users = paths.join(convVal, "user_id").join(personas, "user_id")
      val totals = users.groupBy("persona")
        .agg(sum("conv_value").as("persona_value"), count(lit(1)).as("persona_users"))
      val credit = users
        .select(col("persona"), col("conv_value"), explode(array_distinct(col("path"))).as("channel"))
        .groupBy("persona", "channel")
        .agg(count(lit(1)).as("n_conv_users"), sum("conv_value").as("credited"))
      credit.join(totals, "persona")
        .select(
          col("persona"), col("channel"), col("n_conv_users"), col("persona_users"),
          col("credited").cast("double").as("credited_value"),
          when(col("persona_value") > 0,
            round(col("credited").cast("double") / col("persona_value").cast("double"), 6))
            .otherwise(lit(0.0)).as("value_share6")
        )
    }),
    "q41_ivf_topk" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.ops.Ivf.topK(vecs, nlist = 8, nprobe = 3, k = 5, iters = 2)
        .select(
          col("id_a"), col("id_b"),
          col("rank").cast("long").as("rank"),
          round(col("cos"), 6).as("cos6")
        )
    }),
    // exact n-gram Jaccard near-dup pairs over the documents corpus —
    // the inverted-index exact member of the dedup family (MinHash q32
    // and SimHash q28 are its sketched approximations). Grams are plain
    // strings and the score one exact int division, so the oracle
    // replays the operator verbatim.
    "q43_ngram_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("string").as("id"), col("text"))
      graft.ops.Dedup.ngramJaccardPairs(docs, n = 5, dfCap = 50, threshold = 0.35)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q40_persona_attribution" ->
      """WITH rn AS (
           SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         cv AS (SELECT user_id, min(rn) AS conv_rn FROM rn WHERE event_type = 'purchase' GROUP BY user_id),
         chan AS (
           SELECT DISTINCT r.user_id, r.event_type AS channel
           FROM rn r JOIN cv USING (user_id)
           WHERE r.rn < cv.conv_rn),
         val AS (
           SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS conv_value
           FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         dom AS (SELECT user_id, event_type AS dom_type FROM (
           SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rk
           FROM events GROUP BY user_id, event_type) WHERE rk = 1),
         peak AS (SELECT user_id, h AS peak_hour FROM (
           SELECT user_id, extract(hour FROM ts) AS h,
             row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, h) AS rk
           FROM events GROUP BY user_id, h) WHERE rk = 1),
         persona AS (
           SELECT d.user_id,
             CASE WHEN dom_type = 'purchase' THEN 'buyer'
                  WHEN peak_hour BETWEEN 0 AND 5 THEN 'night_owl'
                  WHEN peak_hour BETWEEN 6 AND 11 THEN 'morning'
                  WHEN peak_hour BETWEEN 12 AND 17 THEN 'afternoon'
                  ELSE 'evening' END AS persona
           FROM dom d JOIN peak USING (user_id)),
         users AS (
           SELECT c.user_id, p.persona, v.conv_value
           FROM cv c JOIN val v USING (user_id) JOIN persona p USING (user_id)),
         totals AS (
           SELECT persona, sum(conv_value) AS persona_value, count(*) AS persona_users
           FROM users GROUP BY persona),
         credit AS (
           SELECT u.persona, ch.channel, count(*) AS n_conv_users, sum(u.conv_value) AS credited
           FROM users u JOIN chan ch USING (user_id)
           GROUP BY 1, 2)
         SELECT c.persona, c.channel, c.n_conv_users, t.persona_users,
           CAST(c.credited AS DOUBLE) AS credited_value,
           CASE WHEN t.persona_value > 0
             THEN round(CAST(c.credited AS DOUBLE) / CAST(t.persona_value AS DOUBLE), 6)
             ELSE 0.0 END AS value_share6
         FROM credit c JOIN totals t USING (persona)""",
    "q41_ivf_topk" -> {
      val chain = LloydSql.chain(k = 8, iters = 2, dim = 64)
      s"""WITH pts AS (
           SELECT CAST(0 AS BIGINT) AS group_id, vec_id AS item_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         $chain,
         members AS (
           SELECT a.item_id AS id_b, a.cluster AS cell, p.v AS v_b
           FROM a2 a JOIN pts p USING (group_id, item_id)),
         probes AS (
           SELECT item_id AS id_a, v AS v_a, cell FROM (
             SELECT p.item_id, p.v, c.cluster AS cell,
               row_number() OVER (PARTITION BY p.item_id ORDER BY
                 list_reduce(list_transform(list_zip(p.v, c.cent), z -> (z[1] - z[2]) * (z[1] - z[2])), (a, b) -> a + b),
                 c.cluster) AS crk
             FROM pts p JOIN c1 c USING (group_id))
           WHERE crk <= 3),
         scored AS (
           SELECT id_a, id_b,
             CASE WHEN na > 0 AND nb > 0 THEN dot / (sqrt(na) * sqrt(nb)) ELSE 0.0 END AS cos
           FROM (
             SELECT q.id_a, m.id_b,
               list_reduce(list_transform(list_zip(q.v_a, m.v_b), z -> z[1] * z[2]), (a, b) -> a + b) AS dot,
               list_reduce(list_transform(q.v_a, x -> x * x), (a, b) -> a + b) AS na,
               list_reduce(list_transform(m.v_b, x -> x * x), (a, b) -> a + b) AS nb
             FROM probes q JOIN members m USING (cell)
             WHERE q.id_a <> m.id_b))
         SELECT id_a, id_b, rank, round(cos, 6) AS cos6 FROM (
           SELECT id_a, id_b, cos,
             row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rank
           FROM scored)
         WHERE rank <= 5"""
    },
    "q43_ngram_jaccard" ->
      """WITH d AS (
           SELECT CAST(doc_id AS VARCHAR) AS id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')) AS s
           FROM documents),
         g0 AS (
           SELECT id, substring(s, CAST(i AS INT), 5) AS gram
           FROM (SELECT id, s, unnest(range(1, len(s) - 3)) AS i FROM d WHERE len(s) >= 5)
           UNION ALL
           SELECT id, s AS gram FROM d WHERE len(s) > 0 AND len(s) < 5),
         g AS (SELECT DISTINCT id, gram FROM g0),
         rare AS (SELECT gram FROM (SELECT gram, count(*) AS df FROM g GROUP BY gram) WHERE df <= 50),
         kept AS (SELECT g.id, g.gram FROM g JOIN rare USING (gram)),
         cnt AS (SELECT id, count(*) AS ng FROM kept GROUP BY id),
         inter AS (
           SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
           FROM kept a JOIN kept b USING (gram)
           WHERE a.id < b.id
           GROUP BY 1, 2)
         SELECT i.id_a, i.id_b, i.inter, ca.ng AS na, cb.ng AS nb,
           CAST(i.inter AS DOUBLE) / CAST(ca.ng + cb.ng - i.inter AS DOUBLE) AS jaccard
         FROM inter i
         JOIN cnt ca ON i.id_a = ca.id
         JOIN cnt cb ON i.id_b = cb.id
         WHERE CAST(i.inter AS DOUBLE) / CAST(ca.ng + cb.ng - i.inter AS DOUBLE) >= 0.35"""
  )
}
