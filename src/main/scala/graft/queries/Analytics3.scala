package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.attribution.Attribution
import graft.ops.{ColdStart, Validation}

/** Third batch of DuckDB-oracled operators: the attribution family's
  * distributed half (path construction → transition counts → path-based
  * removal effects, SURVEY.md §2.11), the full drift-report detector
  * (§2.10 row 66), map-typed distribution aggregates (§2.5 row 24),
  * member-ranking labels (§2.6 row 34), validation with reject reasons
  * (§2.2 row 8), cold-start gating + persona rules (§2.2 rows 11-12),
  * and JSON operators over the events `props` column (§2.9 row 50).
  */
object Analytics3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Markov transition counts (markov_engine.py:161-185) ----
    "q17_transition_counts" -> ((s, dir) => Attribution.transitionCounts(t(s, dir, "events"))),

    // ---- path-based removal effects (markov_engine.py:266-377) ----
    "q18_removal_effects" -> ((s, dir) => Attribution.removalEffectsPathBased(t(s, dir, "events"))),

    // ---- drift report: 4 checks + severity (drift_detection.py:85-555).
    //      Exactly TWO input scans: one for the midpoint scalar, one
    //      GROUPING SETS pass producing both the type and the hour
    //      histograms per half (the naive per-check form read the
    //      events table 9 times — at 100 TB the scan IS the cost; the
    //      ≤ (types + 24) × 2 histogram rows then reduce on the driver)
    "q19_drift_report" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), unix_micros(col("ts").cast("timestamp")).as("us"),
          hour(col("ts").cast("timestamp")).as("h"), col("value"))
      val mid = ev.agg(min(col("us")) + floor((max(col("us")) - min(col("us"))) / 2).cast("long"))
        .head().getLong(0)
      // third grouping set (cur_half alone) feeds the confidence-drift
      // check: per-half mean of the normalized event value (the
      // confidence analog on the driver tables — the reference compares
      // mean assignment confidence, drift_detection.py:282-315).
      // Decimal sums keep the cross-engine averages exact.
      val gs = ev
        .withColumn("cur_half", col("us") >= mid)
        .groupingSets(
          Seq(Seq(col("cur_half"), col("event_type")), Seq(col("cur_half"), col("h")),
            Seq(col("cur_half"))),
          col("cur_half"), col("event_type"), col("h")
        )
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"),
          sum(col("value").cast("decimal(18,2)")).as("sv"),
          count(col("value")).as("nv"),
          max(col("value")).as("mv"))
        .collect()
      // gid bit layout (cur_half, event_type, h): 1 = (half, type), 2 = (half, hour)
      def hist(gid: Long, key: org.apache.spark.sql.Row => Any) =
        gs.filter(_.getAs[Number]("gid").longValue == gid)
          .map(r => (r.getAs[Boolean]("cur_half"), key(r)) -> r.getAs[Long]("n")).toMap
      val byType = hist(1, _.getAs[String]("event_type"))
      val byHour = hist(2, _.getAs[Int]("h"))
      def shares(hm: Map[(Boolean, Any), Long]): Seq[(Double, Double)] = {
        val bt = hm.collect { case ((false, _), n) => n }.sum.toDouble
        val ct = hm.collect { case ((true, _), n) => n }.sum.toDouble
        val keys = hm.keys.map(_._2).toSeq.distinct.sortBy(_.toString)
        keys.map(k => (hm.getOrElse((false, k), 0L) / bt, hm.getOrElse((true, k), 0L) / ct))
      }
      val ts = shares(byType.asInstanceOf[Map[(Boolean, Any), Long]])
      val hs = shares(byHour.asInstanceOf[Map[(Boolean, Any), Long]])
      val bt = byType.collect { case ((false, _), n) => n }.sum.toDouble
      val ct = byType.collect { case ((true, _), n) => n }.sum.toDouble
      // confidence drift (reference drift_detection.py:282-315):
      // drop = mean(conf | baseline) − mean(conf | current) with
      // conf = value / global max — positive drop = degradation
      val confRows = gs.filter(_.getAs[Number]("gid").longValue == 3)
      // degenerate inputs (all events in one half, or all-null values)
      // emit drift 0.0 rather than throwing on Map.apply / null unboxing
      val avgOf = confRows.collect {
        case r if r.getAs[java.math.BigDecimal]("sv") != null && r.getAs[Long]("nv") > 0 =>
          r.getAs[Boolean]("cur_half") ->
            r.getAs[java.math.BigDecimal]("sv").doubleValue / r.getAs[Long]("nv")
      }.toMap
      val vmaxs = confRows.flatMap(r => Option(r.getAs[java.lang.Double]("mv")).map(_.doubleValue))
      val confDrop =
        if (avgOf.size < 2 || vmaxs.isEmpty || vmaxs.max == 0.0) 0.0
        else (avgOf(false) - avgOf(true)) / vmaxs.max
      val checks = Seq(
        "composition_chi2" -> ts.map { case (bs, cs) => (cs - bs) * (cs - bs) / math.max(bs, 1e-12) }.sum,
        "confidence_drift" -> confDrop,
        "kl_divergence" -> ts.map { case (bs, cs) => if (cs > 0) cs * math.log(cs / math.max(bs, 1e-12)) else 0.0 }.sum,
        "volume_drift" -> math.abs(ct - bt) / bt,
        "temporal_l1" -> hs.map { case (bs, cs) => math.abs(cs - bs) }.sum
      )
      def sev(name: String, x: Double): String = name match {
        case "volume_drift" =>
          if (x >= 0.3) "high" else if (x >= 0.15) "medium" else if (x >= 0.05) "low" else "none"
        case "confidence_drift" =>
          // reference alert threshold: drop > 0.2 (config default)
          if (x >= 0.2) "high" else if (x >= 0.1) "medium" else if (x >= 0.02) "low" else "none"
        case _ =>
          if (x >= 0.1) "high" else if (x >= 0.01) "medium" else if (x >= 0.001) "low" else "none"
      }
      // recluster trigger (drift_detection.py:76-77,224-226): the MAX
      // severity across checks, reclustering at >= 0.7. Discrete score
      // mapping none/low/medium/high -> 0/0.25/0.5/1.
      val sevScore = Map("none" -> 0.0, "low" -> 0.25, "medium" -> 0.5, "high" -> 1.0)
      val rows = checks.map { case (name, x) =>
        (name, math.round(x * 1e6) / 1e6, sev(name, x))
      }
      val trig = rows.map(r => sevScore(r._3)).max
      val all = rows :+ (("recluster_trigger", trig, if (trig >= 0.7) "trigger" else "none"))
      import s.implicits._
      all.toDF("check_name", "statistic", "severity")
    }),

    // ---- map-typed distribution aggregate: build MapType dist, total
    //      via aggregate(map_values), explode back to shares
    //      (device_profile.py:99-120 genre→duration map-sum) ----
    "q20_user_type_share" -> ((s, dir) => {
      val cnt = t(s, dir, "events").groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      val m = cnt.groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n"))))).as("dist"))
        .withColumn("tot", aggregate(map_values(col("dist")), lit(0L), (a, x) => a + x))
      m.select(col("user_id"), explode(col("dist")).as(Seq("event_type", "n")), col("tot"))
        .select(
          col("user_id"), col("event_type"), col("n"),
          round(col("n").cast("double") / col("tot"), 6).as("share")
        )
    }),

    // ---- member ranking → "Person A/B/C" labels
    //      (household_inference.py:537-543) ----
    "q21_member_labels" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(
          col("c_mktsegment"), col("c_custkey"),
          concat(lit("Person "), expr("char(64 + rk)")).as("member_label"),
          col("rk").cast("bigint").as("rk")
        )
    }),

    // ---- validation filter + reject-reason metrics
    //      (input_validator.py:43-141) ----
    "q22_validation_report" -> ((s, dir) =>
      Validation.rejectMetrics(t(s, dir, "events"), Validation.eventRules())),

    // ---- cold-start gating + persona rule cascade
    //      (cold_start.py:122-325) ----
    "q23_cold_start" -> ((s, dir) => ColdStart.route(t(s, dir, "events"))),

    // ---- JSON operators: from_json on the props column (§2.9) ----
    "q24_json_props" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k",
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum("k").as("sum_k"),
          min("k").as("min_k"),
          max("k").as("max_k")
        )
    })
  )

  // shared CTE for the attribution path queries
  private val pathCtes =
    """WITH e AS (
         SELECT user_id, event_type,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         FROM events),
       fc AS (SELECT user_id, min(rn) AS conv_rn FROM e WHERE event_type = 'purchase' GROUP BY user_id)"""

  val oracleSql: Map[String, String] = Map(
    "q17_transition_counts" -> (pathCtes +
      """,
       kept AS (
         SELECT e.user_id, e.event_type, e.rn
         FROM e LEFT JOIN fc ON e.user_id = fc.user_id
         WHERE fc.conv_rn IS NULL OR e.rn < fc.conv_rn),
       heads AS (SELECT user_id, coalesce(lag(event_type) OVER (PARTITION BY user_id ORDER BY rn), 'START') AS src, event_type AS dst FROM kept),
       lasts AS (SELECT user_id, max_by(event_type, rn) AS last_ch FROM kept GROUP BY user_id),
       users AS (SELECT DISTINCT user_id FROM events),
       tails AS (
         SELECT u.user_id, coalesce(l.last_ch, 'START') AS src,
           CASE WHEN fc.user_id IS NOT NULL THEN 'CONV' ELSE 'NULL' END AS dst
         FROM users u LEFT JOIN lasts l ON u.user_id = l.user_id
         LEFT JOIN fc ON u.user_id = fc.user_id)
       SELECT src, dst, count(*) AS n
       FROM (SELECT src, dst FROM heads UNION ALL SELECT src, dst FROM tails)
       GROUP BY src, dst"""),
    "q18_removal_effects" -> (pathCtes +
      """,
       kept AS (SELECT e.user_id, e.event_type FROM e JOIN fc ON e.user_id = fc.user_id WHERE e.rn < fc.conv_rn),
       tot AS (SELECT count(*) AS total_conv FROM fc),
       w AS (SELECT event_type AS channel, count(DISTINCT user_id) AS n_conv_with FROM kept GROUP BY event_type)
       SELECT channel, n_conv_with, total_conv,
         round(CAST(n_conv_with AS DOUBLE)/total_conv, 6) AS removal_effect FROM w, tot"""),
    "q19_drift_report" ->
      """WITH b AS (SELECT min(epoch_us(ts)) + CAST(floor((max(epoch_us(ts)) - min(epoch_us(ts))) / 2) AS BIGINT) AS mid FROM events),
       base AS (SELECT event_type, count(*) AS n FROM events, b WHERE epoch_us(ts) < mid GROUP BY event_type),
       cur  AS (SELECT event_type, count(*) AS n FROM events, b WHERE epoch_us(ts) >= mid GROUP BY event_type),
       bt AS (SELECT sum(n) AS t FROM base), ct AS (SELECT sum(n) AS t FROM cur),
       shares AS (
         SELECT coalesce(base.event_type, cur.event_type) AS et,
           CAST(coalesce(base.n,0) AS DOUBLE)/bt.t AS bs,
           CAST(coalesce(cur.n,0) AS DOUBLE)/ct.t AS cs
         FROM base FULL JOIN cur ON base.event_type = cur.event_type, bt, ct),
       bh AS (SELECT extract(hour FROM ts) AS h, count(*) AS n FROM events, b WHERE epoch_us(ts) < mid GROUP BY 1),
       ch AS (SELECT extract(hour FROM ts) AS h, count(*) AS n FROM events, b WHERE epoch_us(ts) >= mid GROUP BY 1),
       bht AS (SELECT sum(n) AS t FROM bh), cht AS (SELECT sum(n) AS t FROM ch),
       hshares AS (
         SELECT coalesce(bh.h, ch.h) AS h,
           CAST(coalesce(bh.n,0) AS DOUBLE)/bht.t AS bs,
           CAST(coalesce(ch.n,0) AS DOUBLE)/cht.t AS cs
         FROM bh FULL JOIN ch ON bh.h = ch.h, bht, cht),
       cf AS (
         SELECT (CAST(sum(CASE WHEN epoch_us(ts) < mid THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                   / count(CASE WHEN epoch_us(ts) < mid THEN value END)
               - CAST(sum(CASE WHEN epoch_us(ts) >= mid THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                   / count(CASE WHEN epoch_us(ts) >= mid THEN value END))
              / max(value) AS drop
         FROM events, b),
       checks AS (
         SELECT 'composition_chi2' AS check_name, sum(pow(cs - bs, 2) / greatest(bs, 1e-12)) AS statistic FROM shares
         UNION ALL
         SELECT 'confidence_drift', drop FROM cf
         UNION ALL
         SELECT 'kl_divergence', sum(CASE WHEN cs > 0 THEN cs * ln(cs / greatest(bs, 1e-12)) ELSE 0 END) FROM shares
         UNION ALL
         SELECT 'volume_drift', abs(CAST(ct.t AS DOUBLE) - bt.t) / bt.t FROM bt, ct
         UNION ALL
         SELECT 'temporal_l1', sum(abs(cs - bs)) FROM hshares),
       sevd AS (
         SELECT check_name, statistic,
           CASE WHEN check_name = 'volume_drift' THEN
             (CASE WHEN statistic >= 0.3 THEN 'high' WHEN statistic >= 0.15 THEN 'medium' WHEN statistic >= 0.05 THEN 'low' ELSE 'none' END)
           WHEN check_name = 'confidence_drift' THEN
             (CASE WHEN statistic >= 0.2 THEN 'high' WHEN statistic >= 0.1 THEN 'medium' WHEN statistic >= 0.02 THEN 'low' ELSE 'none' END)
           ELSE
             (CASE WHEN statistic >= 0.1 THEN 'high' WHEN statistic >= 0.01 THEN 'medium' WHEN statistic >= 0.001 THEN 'low' ELSE 'none' END)
           END AS severity
         FROM checks)
       SELECT check_name, round(statistic, 6) AS statistic, severity FROM sevd
       UNION ALL
       SELECT 'recluster_trigger',
         max(CASE severity WHEN 'high' THEN CAST(1.0 AS DOUBLE) WHEN 'medium' THEN 0.5 WHEN 'low' THEN 0.25 ELSE 0.0 END),
         CASE WHEN max(CASE severity WHEN 'high' THEN CAST(1.0 AS DOUBLE) WHEN 'medium' THEN 0.5 WHEN 'low' THEN 0.25 ELSE 0.0 END) >= 0.7
              THEN 'trigger' ELSE 'none' END
       FROM sevd""",
    "q20_user_type_share" ->
      """SELECT user_id, event_type, n,
         round(CAST(n AS DOUBLE)/sum(n) OVER (PARTITION BY user_id), 6) AS share
       FROM (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1,2)""",
    "q21_member_labels" ->
      """SELECT c_mktsegment, c_custkey, 'Person ' || chr(CAST(64 + rk AS INTEGER)) AS member_label, rk FROM (
         SELECT c_mktsegment, c_custkey,
           row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rk
         FROM customer) WHERE rk <= 3""",
    "q22_validation_report" ->
      """SELECT reason, count(*) AS n FROM (
         SELECT CASE
           WHEN user_id IS NULL THEN 'missing_user'
           WHEN event_type IS NULL OR event_type NOT IN ('click','view','purchase','signup','error') THEN 'bad_event_type'
           WHEN value IS NULL OR value < 0 THEN 'bad_value'
           WHEN ts IS NULL OR extract(year FROM ts) < 2020 OR extract(year FROM ts) >= 2030 THEN 'ts_out_of_range'
           ELSE 'ok' END AS reason
         FROM events) GROUP BY reason""",
    "q23_cold_start" ->
      """WITH n AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
       dom AS (SELECT user_id, event_type AS dom_type FROM (
         SELECT user_id, event_type, row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rk
         FROM events GROUP BY user_id, event_type) WHERE rk = 1),
       peak AS (SELECT user_id, h AS peak_hour FROM (
         SELECT user_id, extract(hour FROM ts) AS h, row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, h) AS rk
         FROM events GROUP BY user_id, h) WHERE rk = 1)
       SELECT n.user_id, n.n_events,
         CASE WHEN n_events < 3 THEN 'account_level' WHEN n_events < 7 THEN 'bayesian_prior'
              WHEN n_events < 10 THEN 'heuristic' ELSE 'full_model' END AS strategy,
         CASE WHEN dom_type = 'purchase' THEN 'buyer'
              WHEN peak_hour BETWEEN 0 AND 5 THEN 'night_owl'
              WHEN peak_hour BETWEEN 6 AND 11 THEN 'morning'
              WHEN peak_hour BETWEEN 12 AND 17 THEN 'afternoon'
              ELSE 'evening' END AS persona
       FROM n JOIN dom ON n.user_id = dom.user_id JOIN peak ON n.user_id = peak.user_id""",
    "q24_json_props" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
         max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
       FROM events GROUP BY event_type"""
  )
}
