package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
      // userPersona directly: personProfiles wraps it in a second full
      // events scan (sessionStats lag window) plus three household
      // window columns, all of which this query would discard
      val personas = graft.ops.ColdStart.userPersona(ev).select(col("user_id"), col("persona"))
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
    }),
    // q44: the PRODUCTION exact-Shapley engine (Shapley.exactScaledDF —
    // distributed coalition counts + the 2^n zeta/weight sweep) in
    // scaled INTEGER arithmetic: phi_num = phi · n! · total_conv is an
    // exact Long, so the cross-engine hash can't drift on fp fold
    // order. DuckDB replays the identical subset algebra from scratch.
    "q44_shapley_exact" -> ((s, dir) =>
      graft.attribution.Shapley.exactScaledDF(t(s, dir, "events"))),
    // q48: the PRODUCTION deterministic Monte Carlo Shapley
    // (Shapley.monteCarloDetDF) — permutation sampling where sample
    // k's order is the lexicographic sort of md5(k|channel), so DuckDB
    // replays the identical permutations; mc_num is an exact Long
    // (sum of vraw marginals along each permutation), no fp fold
    // order anywhere.
    "q48_shapley_mc" -> ((s, dir) =>
      graft.attribution.Shapley.monteCarloDetDF(t(s, dir, "events"), samples = 256)),
    // q46: the Markov chain's row-stochastic normalize as a distributed
    // query — the driver-local absorption algebra's input matrix,
    // cross-engine verified. n and out_total are exact Longs; p is one
    // IEEE division, so the hash is bit-stable.
    "q46_transition_probs" -> ((s, dir) =>
      graft.attribution.Attribution.transitionProbabilities(t(s, dir, "events"))),
    // q47: the cluster-agreement operator (Rand + Adjusted Rand) on two
    // real partitions of documents — lang vs first normalized token.
    // Exact integer pair-counting (doubled counts, no intermediate
    // division); each index is one IEEE division of exact Longs. The
    // oracle mirrors BOTH arms of agreement()'s longSafeMax=55000
    // branch (exact Longs below, order-fixed double arithmetic above),
    // so the cross-engine contract holds on any corpus size, not just
    // under the Long-safe bound.
    "q47_cluster_agreement" -> ((s, dir) => {
      val assign = t(s, dir, "documents").select(
        col("doc_id").as("id"),
        col("lang").as("ca"),
        element_at(split(graft.text.TextOps.normText(col("text")), " "), 1).as("cb"))
      graft.cluster.ClusterAgreement.agreement(assign)
    }),
    // q45: per-event-type temporal rhythm + value moments, all
    // engine-exact: modal hour (count-desc, hour-asc tie-break),
    // circular 24h distance to the global modal hour
    // (Stats.circularHourDistance — the drift detector's metric), and
    // mean/variance from exact integer-cent power sums (the Welford
    // row's batch math) — each emitted double is ONE correctly-rounded
    // IEEE division of exact Longs, so both engines land bit-identical.
    // Long bounds: with vc ≤ 56,021 cents, both n·Σvc² and (Σvc)² stay
    // under 2^63 worst-case (every row at vc_max) to n ≈ 54k rows/type,
    // and at the observed sf0.1 value distribution (E[vc²] ≈ 5e7) to
    // n ≈ 400k (sf0.1 has ~20k). Past the bound the ANSI sum/multiply
    // throws loudly — never a silent wrap.
    "q45_temporal_moments" -> ((s, dir) => {
      val cents = t(s, dir, "events").select(
        col("event_type"),
        hour(col("ts")).cast("long").as("h"),
        round(col("value") * 100).cast("long").as("vc"))
      val byHour = cents.groupBy("event_type", "h").agg(count(lit(1)).as("hn"))
      val modal = byHour
        .withColumn("rk", row_number().over(
          Window.partitionBy("event_type").orderBy(col("hn").desc, col("h"))))
        .where(col("rk") === 1)
        .select(col("event_type"), col("h").as("modal_hour"))
      val globalModal = cents.groupBy("h").agg(count(lit(1)).as("hn"))
        .orderBy(col("hn").desc, col("h")).limit(1)
        .select(col("h").as("global_hour"))
      val mom = cents.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("vc")).as("sum_c"),
        sum(col("vc") * col("vc")).as("sum_c2"))
      mom.join(modal, "event_type").crossJoin(globalModal)
        .select(
          col("event_type"), col("n"), col("modal_hour"),
          graft.functions.Stats.circularHourDistance(col("modal_hour"), col("global_hour"))
            .cast("long").as("circ_dist"),
          (col("sum_c").cast("double") / (col("n") * lit(100L)).cast("double")).as("mean_value"),
          ((col("n") * col("sum_c2") - col("sum_c") * col("sum_c")).cast("double")
            / (col("n") * col("n") * lit(10000L)).cast("double")).as("var_value"))
    })
  )

  /** Shared DuckDB prelude of the Shapley oracles (q44/q48): coalition
    * counting from events (q17's path semantics), channel indexing, and
    * the raw subset-sum table v over all 2^n masks — the SQL twin of
    * Shapley.rawGame. */
  private[queries] val shapleyGameCtes: String =
    """e AS (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         fc AS (SELECT user_id, min(rn) AS conv_rn FROM e WHERE event_type = 'purchase' GROUP BY user_id),
         kept AS (
           SELECT e.user_id, e.event_type
           FROM e JOIN fc ON e.user_id = fc.user_id
           WHERE e.rn < fc.conv_rn),
         csets AS (
           SELECT f.user_id,
             coalesce(list_sort(list(DISTINCT k.event_type) FILTER (WHERE k.event_type IS NOT NULL)),
                      CAST([] AS VARCHAR[])) AS channels
           FROM fc f LEFT JOIN kept k ON f.user_id = k.user_id
           GROUP BY f.user_id),
         coal AS (SELECT channels, count(*) AS cnt FROM csets GROUP BY channels),
         chans AS (
           SELECT ch, row_number() OVER (ORDER BY ch) - 1 AS i
           FROM (SELECT DISTINCT unnest(channels) AS ch FROM coal)),
         nn AS (SELECT count(*) AS n FROM chans),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM coal),
         coalmask AS (
           SELECT co.cnt,
             coalesce((SELECT sum(1 << c.i) FROM chans c WHERE list_contains(co.channels, c.ch)), 0) AS mask
           FROM coal co),
         masks AS (SELECT unnest(range(0, 1 << (SELECT n FROM nn))) AS mask),
         vraw AS (
           SELECT m.mask, CAST(coalesce(sum(cm.cnt), 0) AS BIGINT) AS v
           FROM masks m LEFT JOIN coalmask cm ON (m.mask & cm.mask) = cm.mask
           GROUP BY m.mask)"""

  /** Factorial CTE 0..n (n from the game prelude's `nn`) — shared by
    * the q44 exact-Shapley oracle and q49's Shapley arm. */
  private[queries] val factCte: String =
    """fact AS (
           SELECT i, CAST((SELECT coalesce(product(x), 1) FROM unnest(range(1, i + 1)) AS t(x)) AS BIGINT) AS f
           FROM (SELECT unnest(range(0, (SELECT n FROM nn) + 1)) AS i))"""

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
         WHERE CAST(i.inter AS DOUBLE) / CAST(ca.ng + cb.ng - i.inter AS DOUBLE) >= 0.35""",
    "q44_shapley_exact" ->
      s"""WITH $shapleyGameCtes,
         $factCte
         SELECT c.ch AS channel,
           (SELECT CAST(n AS BIGINT) FROM nn) AS n_channels,
           (SELECT total FROM tot) AS total_conv,
           CAST(sum(fs.f * fn.f * (v1.v - v0.v)) AS BIGINT) AS phi_num
         FROM chans c
         JOIN masks m ON (m.mask & (1 << c.i)) = 0
         JOIN vraw v0 ON v0.mask = m.mask
         JOIN vraw v1 ON v1.mask = (m.mask | (1 << c.i))
         JOIN fact fs ON fs.i = bit_count(m.mask)
         JOIN fact fn ON fn.i = (SELECT n FROM nn) - bit_count(m.mask) - 1
         GROUP BY c.ch""",
    // same game prelude as q44; the MC layer replays each sample's
    // md5-ordered permutation with a prefix-mask window sum and
    // accumulates the Long marginals — bit-exact by construction
    "q48_shapley_mc" ->
      s"""WITH $shapleyGameCtes,
         samples AS (SELECT unnest(range(0, 256)) AS k),
         perm AS (
           SELECT s.k, c.ch, c.i,
             md5(CAST(s.k AS VARCHAR) || '|' || c.ch) AS key
           FROM samples s CROSS JOIN chans c),
         pm AS (
           SELECT k, ch, i,
             coalesce(CAST(sum(1 << i) OVER (
               PARTITION BY k ORDER BY key, ch
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS prefix
           FROM perm)
         SELECT pm.ch AS channel,
           CAST(256 AS BIGINT) AS samples,
           (SELECT total FROM tot) AS total_conv,
           CAST(sum(v1.v - v0.v) AS BIGINT) AS mc_num
         FROM pm
         JOIN vraw v0 ON v0.mask = pm.prefix
         JOIN vraw v1 ON v1.mask = pm.prefix + (1 << pm.i)
         GROUP BY pm.ch""",
    // wraps q17's oracle verbatim — the probability layer is just a
    // window sum + one division on top of the counts both engines
    // already agree on
    "q46_transition_probs" ->
      s"""SELECT src, dst, n,
            CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS out_total,
            CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS p
          FROM (${Analytics3.oracleSql("q17_transition_counts")}) counts""",
    "q47_cluster_agreement" ->
      """WITH assign AS (
           SELECT lang AS ca,
             split_part(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')), ' ', 1) AS cb
           FROM documents),
         cells AS (SELECT ca, cb, count(*) AS nij FROM assign GROUP BY ca, cb),
         core AS (SELECT CAST(sum(nij) AS BIGINT) AS n, CAST(sum(nij * (nij - 1)) AS BIGINT) AS s2_both FROM cells),
         am AS (SELECT CAST(sum(ai * (ai - 1)) AS BIGINT) AS a2 FROM (SELECT CAST(sum(nij) AS BIGINT) AS ai FROM cells GROUP BY ca)),
         bm AS (SELECT CAST(sum(bj * (bj - 1)) AS BIGINT) AS b2 FROM (SELECT CAST(sum(nij) AS BIGINT) AS bj FROM cells GROUP BY cb))
         -- mirrors ClusterAgreement.agreement's two arms: exact Long
         -- products up to the longSafeMax bound, then the SAME fixed
         -- IEEE +,-,*,/ sequence over the still-exact Long components
         -- (correctly-rounded ops in both engines -> identical bits;
         -- unlike exp/ln this degradation arm IS cross-engine twinnable)
         SELECT n, (n * (n - 1)) // 2 AS t_pairs, s2_both, a2, b2,
           CASE WHEN n > 1 THEN
             CASE WHEN n <= 55000
               THEN CAST(n * (n - 1) + 2 * s2_both - a2 - b2 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
               ELSE (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) + CAST(s2_both AS DOUBLE) * 2.0
                     - CAST(a2 AS DOUBLE) - CAST(b2 AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
             END
           END AS rand,
           CASE WHEN n <= 55000 THEN
             CASE WHEN ((n * (n - 1)) // 2) * (a2 + b2) - a2 * b2 <> 0
               THEN CAST(n * (n - 1) * s2_both - a2 * b2 AS DOUBLE)
                    / CAST(((n * (n - 1)) // 2) * (a2 + b2) - a2 * b2 AS DOUBLE)
             END
           ELSE
             CASE WHEN CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0
                       * (CAST(a2 AS DOUBLE) + CAST(b2 AS DOUBLE))
                       - CAST(a2 AS DOUBLE) * CAST(b2 AS DOUBLE) <> 0.0
               THEN (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * CAST(s2_both AS DOUBLE)
                     - CAST(a2 AS DOUBLE) * CAST(b2 AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0
                       * (CAST(a2 AS DOUBLE) + CAST(b2 AS DOUBLE))
                       - CAST(a2 AS DOUBLE) * CAST(b2 AS DOUBLE))
             END
           END AS ari
         FROM core, am, bm""",
    "q45_temporal_moments" ->
      """WITH c AS (
           SELECT event_type, extract(hour FROM ts) AS h,
                  CAST(round(value * 100) AS BIGINT) AS vc
           FROM events),
         byhour AS (SELECT event_type, h, count(*) AS hn FROM c GROUP BY 1, 2),
         modal AS (
           SELECT event_type, h AS modal_hour FROM (
             SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY hn DESC, h) AS rk
             FROM byhour) WHERE rk = 1),
         gm AS (
           SELECT h AS global_hour FROM (
             SELECT h, count(*) AS hn FROM c GROUP BY h ORDER BY hn DESC, h LIMIT 1)),
         mom AS (
           SELECT event_type, count(*) AS n,
             CAST(sum(vc) AS BIGINT) AS sum_c,
             CAST(sum(vc * vc) AS BIGINT) AS sum_c2
           FROM c GROUP BY event_type)
         SELECT m.event_type, m.n, d.modal_hour,
           least(abs(d.modal_hour - g.global_hour), 24 - abs(d.modal_hour - g.global_hour)) AS circ_dist,
           CAST(m.sum_c AS DOUBLE) / CAST(m.n * 100 AS DOUBLE) AS mean_value,
           CAST(m.n * m.sum_c2 - m.sum_c * m.sum_c AS DOUBLE) / CAST(m.n * m.n * 10000 AS DOUBLE) AS var_value
         FROM mom m JOIN modal d USING (event_type) CROSS JOIN gm g"""
  )
}
