package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Seventh batch — round-5 closeout: the two attribution operators that
  * were spec-only get cross-engine oracles via the exact-integer
  * recasts (the q44/q48 discipline).
  *
  * q49: the hybrid Markov×Shapley blend
  * ([[graft.attribution.Shapley.hybridScaledDF]]) at α = 2/5 — both
  * arms' normalizers and the blended numerator are exact Longs, so
  * value conservation (Σ hybrid_num = hybrid_den) holds exactly and
  * the emitted share is one IEEE division. Reference:
  * hybrid_engine.py:217-218.
  *
  * q50: the deterministic Poisson(1) bootstrap of path-based removal
  * effects ([[graft.attribution.Uncertainty.bootstrapRemovalDF]]) —
  * replicate weights are md5-thresholded integer draws (engine-
  * replayable sampling, the q48 pattern), each replicate's effect one
  * IEEE division of exact Longs, and the p05/p50/p95 bands are
  * row_number order statistics. Reference:
  * uncertainty_quantification.py:137-260, hybrid_engine.py:244-327.
  *
  * q53: the full attribution REPORT as one oracled surface — the
  * deterministic twin of `op_attr_report` (integrated_pipeline.py's
  * final deliverable: per-channel point estimates from every engine
  * plus uncertainty bands in one table). Point estimates come from the
  * q49 integer blend (removal share m_num/m_den, Shapley share
  * phi_num/s_den, hybrid share — each ONE IEEE division of exact
  * Longs) and the bands from the q50 deterministic bootstrap; the
  * oracle stitches the two proven CTE blocks over one shared game
  * prelude. op_attr_report itself stays rows-only (its Gaussian-elim
  * absorption solve and RNG bootstrap are the non-replayable parts —
  * q51 twins the former, this twins the rest). */
object Analytics7 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_shapley_hybrid" -> ((s, dir) =>
      graft.attribution.Shapley.hybridScaledDF(t(s, dir, "events"), alphaNum = 2L, alphaDen = 5L)),
    "q50_bootstrap_removal" -> ((s, dir) =>
      graft.attribution.Uncertainty.bootstrapRemovalDF(t(s, dir, "events"), reps = 64)),
    "q51_absorption_horizon" -> ((s, dir) =>
      graft.attribution.Attribution.absorptionHorizonDF(t(s, dir, "events"), horizon = 48)),
    "q53_attribution_report" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, lit, when}
      val ev = t(s, dir, "events")
      val hybrid = graft.attribution.Shapley.hybridScaledDF(ev, alphaNum = 2L, alphaDen = 5L)
      val bands = graft.attribution.Uncertainty.bootstrapRemovalDF(ev, reps = 64)
      // both channel vocabularies are the distinct channels on
      // converting paths (hybridScaledDF unions its two arms; the
      // bootstrap's explode covers every such channel in every
      // replicate), so the inner join is lossless
      hybrid.join(bands, Seq("channel"))
        .select(
          col("channel"),
          col("m_num"), col("m_den"),
          when(col("m_den") > 0,
            col("m_num").cast("double") / col("m_den").cast("double"))
            .otherwise(lit(0.0)).as("removal_share"),
          col("phi_num"), col("s_den"),
          when(col("s_den") > 0,
            col("phi_num").cast("double") / col("s_den").cast("double"))
            .otherwise(lit(0.0)).as("shapley_share"),
          col("hybrid_share"),
          col("n_reps"), col("re_lo"), col("re_med"), col("re_hi"))
    }),
    // exact per-point silhouette of the q41-style deterministic-Lloyd
    // partition of the embeddings — the k-selection criterion's
    // arithmetic cross-engine (sqrt is correctly-rounded IEEE; every
    // mean folds neighbors in item_id order)
    "q52_silhouette_det" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, lit, transform}
      val pts = t(s, dir, "embeddings").select(
        lit(0L).as("group_id"),
        col("vec_id").as("item_id"),
        transform(col("embedding"), _.cast("double")).as("features"))
      val assign = graft.cluster.KMeans.lloydDeterministic(pts, k = 8, iters = 2)
        .select("item_id", "cluster")
      graft.cluster.KMeans.silhouetteDF(pts.select("item_id", "features"), assign)
    })
  )

  // Poisson(1) CDF thresholds, floor(CDF_k · 2^60) — the same integer
  // constants Uncertainty.poisson1Cdf60 compares against
  private val poissonCase: String =
    graft.attribution.Uncertainty.poisson1Cdf60
      .map { case (k, t) => s"WHEN h < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 7 END")

  /** The q51 oracle: DuckDB replays the horizon-h absorption recursion
    * as a RECURSIVE CTE over the iteration counter (48 unrolled CTEs
    * hit the binder's depth-128 limit; the recursive working table —
    * exactly the previous step's x vector — doesn't). Each step's fold
    * is list_reduce over list_prepend(pc, list(q·x ORDER BY dst)) —
    * seeded at pc then ascending channel order, the exact association
    * of the Scala loop (sparse vs dense is immaterial: absent
    * transitions add +0.0). */
  private def absorptionSql(horizon: Int): String =
    s"""WITH RECURSIVE tp AS (${Analytics6.oracleSql("q46_transition_probs")}),
         chans AS (
           -- DISTINCT over UNION ALL in a subquery: under WITH RECURSIVE
           -- DuckDB gives a bare two-branch UNION fixpoint semantics and
           -- emits duplicates
           SELECT DISTINCT ch FROM (
             SELECT src AS ch FROM tp WHERE src NOT IN ('START','CONV','NULL')
             UNION ALL
             SELECT dst FROM tp WHERE dst NOT IN ('START','CONV','NULL'))),
         qm AS (SELECT src, dst, p FROM tp
                WHERE src IN (SELECT ch FROM chans) AND dst IN (SELECT ch FROM chans)),
         pconv AS (SELECT src, p FROM tp WHERE dst = 'CONV' AND src IN (SELECT ch FROM chans)),
         pstart AS (SELECT dst AS ch, p FROM tp WHERE src = 'START' AND dst IN (SELECT ch FROM chans)),
         it AS (
           SELECT 0 AS t, ch, CAST(0.0 AS DOUBLE) AS x FROM chans
           UNION ALL
           SELECT i.t + 1, c.ch,
             list_reduce(list_prepend(
               coalesce((SELECT p FROM pconv pcv WHERE pcv.src = c.ch), 0.0),
               coalesce((SELECT list(q.p * xp.x ORDER BY q.dst)
                         FROM qm q JOIN it xp ON xp.ch = q.dst AND xp.t = i.t
                         WHERE q.src = c.ch), CAST([] AS DOUBLE[]))),
               (a, b) -> a + b) AS x
           FROM chans c, (SELECT DISTINCT t FROM it) i
           WHERE i.t < $horizon)
         SELECT c.ch AS channel, CAST($horizon AS INTEGER) AS horizon,
           xT.x AS absorb_h, coalesce(ps.p, 0.0) AS p_start,
           coalesce(ps.p, 0.0) * xT.x AS contrib
         FROM chans c
         JOIN it xT ON xT.ch = c.ch AND xT.t = $horizon
         LEFT JOIN pstart ps ON ps.ch = c.ch"""

  val oracleSql: Map[String, String] = Map(
    "q51_absorption_horizon" -> absorptionSql(48),
    // the q41 Lloyd chain supplies the partition (a2); the silhouette
    // layer replays the same order-fixed folds: dimension-order squared
    // distance, item_id-order neighbor sums, one division per mean
    "q52_silhouette_det" -> {
      val chain = LloydSql.chain(k = 8, iters = 2, dim = 64)
      s"""WITH pts AS (
           SELECT CAST(0 AS BIGINT) AS group_id, vec_id AS item_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         $chain,
         pa AS (
           SELECT p.item_id, p.v, a.cluster
           FROM a2 a JOIN pts p USING (group_id, item_id)),
         pairs AS (
           SELECT i.item_id AS id_i, i.cluster AS c_i, j.item_id AS id_j, j.cluster AS c_j,
             sqrt(list_reduce(list_transform(list_zip(i.v, j.v), z -> (z[1] - z[2]) * (z[1] - z[2])), (a, b) -> a + b)) AS d
           FROM pa i JOIN pa j ON i.item_id <> j.item_id),
         per AS (
           SELECT id_i, c_i, c_j,
             list_reduce(list(d ORDER BY id_j), (a, b) -> a + b) AS dsum,
             count(*) AS cnt
           FROM pairs GROUP BY 1, 2, 3),
         own AS (
           SELECT id_i, dsum / CAST(cnt AS DOUBLE) AS a_mean, CAST(cnt AS BIGINT) AS n_own
           FROM per WHERE c_j = c_i),
         oth AS (
           SELECT id_i, min(dsum / CAST(cnt AS DOUBLE)) AS b_mean
           FROM per WHERE c_j <> c_i GROUP BY id_i)
         SELECT p.item_id, p.cluster,
           coalesce(o.n_own, 0) AS n_own,
           coalesce(o.a_mean, 0.0) AS a_mean,
           coalesce(t.b_mean, 0.0) AS b_mean,
           CASE WHEN o.id_i IS NULL OR t.id_i IS NULL
                  OR greatest(o.a_mean, t.b_mean) = 0.0 THEN 0.0
                ELSE (t.b_mean - o.a_mean) / greatest(o.a_mean, t.b_mean) END AS sil
         FROM pa p
         LEFT JOIN own o ON o.id_i = p.item_id
         LEFT JOIN oth t ON t.id_i = p.item_id"""
    },
    // q44's phi CTE + q18's removal counts (over the same `kept`), then
    // the integer blend: hybrid_num = 2·m_num·S + 3·phi_num·M over
    // hybrid_den = 5·M·S, the share one BIGINT→DOUBLE division
    "q49_shapley_hybrid" ->
      s"""WITH ${Analytics6.shapleyGameCtes},
         ${Analytics6.factCte},
         phi AS (
           SELECT c.ch AS channel,
             CAST(sum(fs.f * fn.f * (v1.v - v0.v)) AS BIGINT) AS phi_num
           FROM chans c
           JOIN masks m ON (m.mask & (1 << c.i)) = 0
           JOIN vraw v0 ON v0.mask = m.mask
           JOIN vraw v1 ON v1.mask = (m.mask | (1 << c.i))
           JOIN fact fs ON fs.i = bit_count(m.mask)
           JOIN fact fn ON fn.i = (SELECT n FROM nn) - bit_count(m.mask) - 1
           GROUP BY c.ch),
         mkv AS (
           SELECT event_type AS channel, CAST(count(DISTINCT user_id) AS BIGINT) AS m_num
           FROM kept GROUP BY event_type),
         md AS (SELECT CAST(sum(m_num) AS BIGINT) AS m_den FROM mkv),
         sd AS (SELECT CAST(sum(phi_num) AS BIGINT) AS s_den FROM phi)
         SELECT coalesce(p.channel, m.channel) AS channel,
           coalesce(m.m_num, 0) AS m_num, md.m_den,
           coalesce(p.phi_num, 0) AS phi_num, sd.s_den,
           CAST(2 * coalesce(m.m_num, 0) * sd.s_den
              + 3 * coalesce(p.phi_num, 0) * md.m_den AS BIGINT) AS hybrid_num,
           CAST(5 * md.m_den * sd.s_den AS BIGINT) AS hybrid_den,
           CASE WHEN 5 * md.m_den * sd.s_den > 0
             THEN CAST(2 * coalesce(m.m_num, 0) * sd.s_den
                     + 3 * coalesce(p.phi_num, 0) * md.m_den AS DOUBLE)
                / CAST(5 * md.m_den * sd.s_den AS DOUBLE)
             ELSE 0.0 END AS hybrid_share
         FROM phi p FULL OUTER JOIN mkv m USING (channel), md, sd""",
    // replicate r's weight for user u: Poisson(1) draw from the 60-bit
    // integer md5(r||'|'||u) against the fixed CDF thresholds; each
    // band is a row_number order statistic over the 64 replicates
    "q50_bootstrap_removal" ->
      // the e/fc/kept prelude is the SHARED shapleyGameCtes (one copy
      // of the path semantics repo-wide; DuckDB prunes the unused game
      // CTEs); chan = the distinct channels each converter touched
      s"""WITH ${Analytics6.shapleyGameCtes},
         chan AS (SELECT DISTINCT user_id, event_type AS channel FROM kept),
         reps AS (SELECT unnest(range(0, 64)) AS r),
         hw AS (
           SELECT r.r, f.user_id,
             CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || '|' || CAST(f.user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
           FROM reps r CROSS JOIN fc f),
         w AS (SELECT r, user_id, $poissonCase AS w FROM hw),
         rtot AS (SELECT r, CAST(sum(w) AS BIGINT) AS total_w FROM w GROUP BY r),
         lost AS (
           SELECT w.r, c.channel, CAST(sum(w.w) AS BIGINT) AS lost_w
           FROM w JOIN chan c ON w.user_id = c.user_id
           GROUP BY 1, 2),
         re AS (
           SELECT l.channel, l.r,
             CASE WHEN t.total_w > 0
               THEN CAST(l.lost_w AS DOUBLE) / CAST(t.total_w AS DOUBLE)
               ELSE 0.0 END AS re
           FROM lost l JOIN rtot t USING (r)),
         rk AS (
           SELECT channel, re,
             row_number() OVER (PARTITION BY channel ORDER BY re, r) AS rk
           FROM re)
         SELECT channel, CAST(count(*) AS BIGINT) AS n_reps,
           max(CASE WHEN rk = 4 THEN re END) AS re_lo,
           max(CASE WHEN rk = 32 THEN re END) AS re_med,
           max(CASE WHEN rk = 61 THEN re END) AS re_hi
         FROM rk GROUP BY channel""",
    // q53 = the q49 point-estimate CTEs + the q50 band CTEs stitched
    // over ONE shared game prelude, joined by channel — every emitted
    // double is one IEEE division of exact Longs both engines computed
    // identically
    "q53_attribution_report" ->
      s"""WITH ${Analytics6.shapleyGameCtes},
         ${Analytics6.factCte},
         phi AS (
           SELECT c.ch AS channel,
             CAST(sum(fs.f * fn.f * (v1.v - v0.v)) AS BIGINT) AS phi_num
           FROM chans c
           JOIN masks m ON (m.mask & (1 << c.i)) = 0
           JOIN vraw v0 ON v0.mask = m.mask
           JOIN vraw v1 ON v1.mask = (m.mask | (1 << c.i))
           JOIN fact fs ON fs.i = bit_count(m.mask)
           JOIN fact fn ON fn.i = (SELECT n FROM nn) - bit_count(m.mask) - 1
           GROUP BY c.ch),
         mkv AS (
           SELECT event_type AS channel, CAST(count(DISTINCT user_id) AS BIGINT) AS m_num
           FROM kept GROUP BY event_type),
         md AS (SELECT CAST(sum(m_num) AS BIGINT) AS m_den FROM mkv),
         sd AS (SELECT CAST(sum(phi_num) AS BIGINT) AS s_den FROM phi),
         hyb AS (
           SELECT coalesce(p.channel, m.channel) AS channel,
             coalesce(m.m_num, 0) AS m_num, md.m_den,
             coalesce(p.phi_num, 0) AS phi_num, sd.s_den
           FROM phi p FULL OUTER JOIN mkv m USING (channel), md, sd),
         chan AS (SELECT DISTINCT user_id, event_type AS channel FROM kept),
         reps AS (SELECT unnest(range(0, 64)) AS r),
         hw AS (
           SELECT r.r, f.user_id,
             CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || '|' || CAST(f.user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
           FROM reps r CROSS JOIN fc f),
         w AS (SELECT r, user_id, $poissonCase AS w FROM hw),
         rtot AS (SELECT r, CAST(sum(w) AS BIGINT) AS total_w FROM w GROUP BY r),
         lost AS (
           SELECT w.r, c.channel, CAST(sum(w.w) AS BIGINT) AS lost_w
           FROM w JOIN chan c ON w.user_id = c.user_id
           GROUP BY 1, 2),
         re AS (
           SELECT l.channel, l.r,
             CASE WHEN t.total_w > 0
               THEN CAST(l.lost_w AS DOUBLE) / CAST(t.total_w AS DOUBLE)
               ELSE 0.0 END AS re
           FROM lost l JOIN rtot t USING (r)),
         rk AS (
           SELECT channel, re,
             row_number() OVER (PARTITION BY channel ORDER BY re, r) AS rk
           FROM re),
         bands AS (
           SELECT channel, CAST(count(*) AS BIGINT) AS n_reps,
             max(CASE WHEN rk = 4 THEN re END) AS re_lo,
             max(CASE WHEN rk = 32 THEN re END) AS re_med,
             max(CASE WHEN rk = 61 THEN re END) AS re_hi
           FROM rk GROUP BY channel)
         SELECT h.channel, h.m_num, h.m_den,
           CASE WHEN h.m_den > 0
             THEN CAST(h.m_num AS DOUBLE) / CAST(h.m_den AS DOUBLE)
             ELSE 0.0 END AS removal_share,
           h.phi_num, h.s_den,
           CASE WHEN h.s_den > 0
             THEN CAST(h.phi_num AS DOUBLE) / CAST(h.s_den AS DOUBLE)
             ELSE 0.0 END AS shapley_share,
           CASE WHEN 5 * h.m_den * h.s_den > 0
             THEN CAST(2 * h.m_num * h.s_den + 3 * h.phi_num * h.m_den AS DOUBLE)
                / CAST(5 * h.m_den * h.s_den AS DOUBLE)
             ELSE 0.0 END AS hybrid_share,
           b.n_reps, b.re_lo, b.re_med, b.re_hi
         FROM hyb h JOIN bands b USING (channel)"""
  )
}
