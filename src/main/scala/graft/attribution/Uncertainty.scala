package graft.attribution

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Uncertainty quantification for attribution shares
  * (reference: src/attribution/uncertainty_quantification.py:137-501):
  * bootstrap CIs, α-sweep sensitivity bands, Dirichlet transition
  * perturbation. Resamples are embarrassingly parallel — fanned out via
  * spark.range over the (tiny, pre-aggregated) transition/coalition
  * tables, so the 100 TB half of the work (building those tables) is
  * never repeated per replicate.
  */
object Uncertainty {

  final case class Band(channel: String, lo: Double, hi: Double, mean: Double)

  /** Per-replicate attribution, resilient to degenerate resamples: a
    * replicate that zeroes all outflow from a transient channel makes
    * (I − Q) singular and `Attribution.solve` throws — skip that
    * replicate (returning None) instead of failing the whole job. */
  private def tryAttribution(counts: Seq[(String, String, Long)]): Option[Map[String, Double]] =
    scala.util.Try(Attribution.markovAttribution(Attribution.chainFromCounts(counts))).toOption

  /** Poisson-bootstrap the transition counts B times and recompute the
    * Markov attribution per replicate; returns per-channel percentile
    * bands. Poisson(n) resampling of an aggregated count table is the
    * scale-friendly analog of resampling raw users with replacement. */
  def bootstrapMarkov(
      spark: SparkSession,
      counts: Seq[(String, String, Long)],
      b: Int = 200,
      seed: Long = 42L,
      loQ: Double = 0.025,
      hiQ: Double = 0.975
  ): Seq[Band] = {
    import spark.implicits._
    val cB = spark.sparkContext.broadcast(counts.toVector)
    val reps: Seq[Option[Seq[(String, Double)]]] = spark
      .range(b)
      .mapPartitions { it =>
        it.map { k =>
          val rng = new java.util.Random(seed ^ (k * 0x9E3779B97F4A7C15L))
          def poisson(lambda: Double): Long = {
            // Knuth for small λ, normal approx for large — counts here
            // are per-cell so λ is modest
            if (lambda > 500) math.max(0L, math.round(lambda + math.sqrt(lambda) * rng.nextGaussian()))
            else {
              val l = math.exp(-lambda); var kk = 0L; var p = 1.0
              while ({ p *= rng.nextDouble(); p > l }) kk += 1
              kk
            }
          }
          val resampled = cB.value.map { case (s, d, n) => (s, d, poisson(n.toDouble)) }.filter(_._3 > 0)
          tryAttribution(resampled).map(_.toSeq)
        }
      }
      .collect()
      .toSeq

    // skipped (singular) replicates shrink the CI denominator honestly
    // rather than polluting it with zeros or crashing the job
    val kept = reps.flatten.map(_.toMap)
    val nSkipped = reps.size - kept.size
    if (nSkipped > 0)
      System.err.println(s"[uncertainty] $nSkipped/$b bootstrap replicates singular — skipped")
    require(kept.nonEmpty, "all bootstrap replicates degenerate")

    bandsOf(kept, loQ, hiQ)
  }

  private def bandsOf(reps: Seq[Map[String, Double]], loQ: Double, hiQ: Double): Seq[Band] = {
    val channels = reps.flatMap(_.keys).distinct.sorted
    channels.map { ch =>
      val xs = reps.map(_.getOrElse(ch, 0.0)).sorted
      def pct(q: Double) = xs(math.min(xs.size - 1, math.max(0, math.round(q * (xs.size - 1)).toInt)))
      Band(ch, pct(loQ), pct(hiQ), xs.sum / xs.size)
    }
  }

  /** Dirichlet transition perturbation — the reference's third
    * uncertainty mode (uncertainty_quantification.py:137-501): each
    * replicate redraws every source row's outgoing transition
    * distribution from Dirichlet(concentration × observed counts) and
    * recomputes the Markov attribution. Higher `concentration` ⇒
    * tighter bands around the point estimate. Same spark.range fan-out
    * as the bootstrap (the aggregated count table is tiny and
    * broadcast; the replicates are the parallel work). */
  def dirichletMarkov(
      spark: SparkSession,
      counts: Seq[(String, String, Long)],
      b: Int = 200,
      concentration: Double = 1.0,
      seed: Long = 42L,
      loQ: Double = 0.025,
      hiQ: Double = 0.975
  ): Seq[Band] = {
    val cB = spark.sparkContext.broadcast(counts.toVector)
    import spark.implicits._
    val reps = spark
      .range(b)
      .mapPartitions { it =>
        it.map { k =>
          val rng = new java.util.Random(seed ^ (k * 0x9E3779B97F4A7C15L))
          // Gamma(α,1) via Marsaglia–Tsang (with the α<1 boost); a
          // Dirichlet draw is normalized independent Gammas
          def gamma(alpha: Double): Double = {
            if (alpha < 1.0) {
              val u = rng.nextDouble()
              gamma(alpha + 1.0) * math.pow(u, 1.0 / alpha)
            } else {
              val d = alpha - 1.0 / 3.0
              val c = 1.0 / math.sqrt(9.0 * d)
              var r = -1.0
              while (r < 0) {
                val x = rng.nextGaussian()
                val v = { val t = 1.0 + c * x; t * t * t }
                if (v > 0) {
                  val u = rng.nextDouble()
                  if (math.log(u) < 0.5 * x * x + d - d * v + d * math.log(v)) r = d * v
                }
              }
              r
            }
          }
          // redraw each source's outgoing distribution; scale to 1e9 so
          // the Long quantization is negligible (chainFromCounts
          // normalizes per source — only the ratios matter)
          val bySrc = cB.value.groupBy(_._1)
          val perturbed = bySrc.toSeq.flatMap { case (_, rows) =>
            val draws = rows.map { case (_, _, n) => gamma(math.max(1e-9, concentration * n)) }
            val z = draws.sum
            rows.zip(draws).map { case ((s, d, _), g) =>
              (s, d, math.max(1L, math.round(g / z * 1e9)))
            }
          }
          tryAttribution(perturbed).map(_.toSeq)
        }
      }
      .collect()
      .toSeq
    val kept = reps.flatten.map(_.toMap)
    require(kept.nonEmpty, "all Dirichlet replicates degenerate")
    bandsOf(kept, loQ, hiQ)
  }

  /** Poisson(1) CDF thresholds scaled to 2^60, floor(CDF_k·2^60) for
    * k = 0..6 (draws above the last threshold cap at 7) — exact integer
    * constants, so ANY engine comparing the same 60-bit hash lands on
    * the identical draw. */
  val poisson1Cdf60: Seq[(Int, Long)] = Seq(
    0 -> 424136118829305329L,
    1 -> 848272237658610659L,
    2 -> 1060340297073263324L,
    3 -> 1131029650211480879L,
    4 -> 1148701988496035267L,
    5 -> 1152236456152946145L,
    6 -> 1152825534095764625L)

  /** The Poisson(1) draw for a 60-bit hash column: the first k whose
    * CDF threshold exceeds h, capped at 7. */
  private def poissonDraw(h: Column): Column =
    poisson1Cdf60.foldRight(lit(7L): Column) { case ((k, t), acc) =>
      when(h < t, lit(k.toLong)).otherwise(acc)
    }

  /** DETERMINISTIC Poisson bootstrap of the path-based removal effects
    * (q18's integers) as a distributed DataFrame — the cross-engine-
    * verifiable twin of [[bootstrapMarkov]] (q50). Replicate r's weight
    * for converting user u is a Poisson(1) draw read off fixed integer
    * thresholds ([[poisson1Cdf60]]) against the 60-bit integer
    * md5(r||'|'||u) — the q48 md5-determinism discipline, so any engine
    * replays the identical resamples (unlike a seeded JVM RNG). Per
    * replicate, each channel's removal effect is ONE IEEE division of
    * exact Long weight sums; the emitted bands are order statistics
    * (row_number ranks loRank/medRank/hiRank with an (re, r) tie-break),
    * so the whole output is bit-stable cross-engine. The users×reps
    * fan-out is distributed (reps broadcast); no driver loop, so the
    * replicate count scales with the cluster. NOTE the two aggregates
    * (totals, lost) each recompute the path window from events in this
    * lazy formulation — at scale, checkpoint userPaths (or persist the
    * weighted frame) so the scan happens once (see PLANS.md q50).
    * Reference: uncertainty_quantification.py:137-260 (bootstrap CIs,
    * percentile bands); hybrid_engine.py:244-327 (p05/p50/p95). */
  def bootstrapRemovalDF(
      events: DataFrame,
      reps: Int = 64,
      loRank: Int = 4,
      medRank: Int = 32,
      hiRank: Int = 61,
      convType: String = "purchase"): DataFrame = {
    require(reps >= 1 && loRank >= 1 && loRank <= medRank && medRank <= hiRank && hiRank <= reps,
      s"ranks $loRank/$medRank/$hiRank must be ordered within [1, $reps]")
    val spark = events.sparkSession
    val users = Attribution.userPaths(events, convType)
      .where(col("converted"))
      .select(col("user_id").cast("string").as("uid"), array_distinct(col("path")).as("chs"))
    val weighted = users
      .crossJoin(broadcast(spark.range(reps).toDF("r")))
      .withColumn("h",
        conv(substring(md5(concat(col("r").cast("string"), lit("|"), col("uid"))), 1, 15), 16, 10)
          .cast("long"))
      .withColumn("w", poissonDraw(col("h")))
    val totals = weighted.groupBy("r").agg(sum("w").as("total_w"))
    // w = 0 rows still flow through the explode, so every channel that
    // appears on any converting path has a row in EVERY replicate (the
    // (r, channel) grid is complete — ranks are well defined)
    val lost = weighted
      .select(col("r"), col("w"), explode(col("chs")).as("channel"))
      .groupBy("r", "channel")
      .agg(sum("w").as("lost_w"))
    val re = lost.join(totals, "r")
      .withColumn("re",
        when(col("total_w") > 0, col("lost_w").cast("double") / col("total_w").cast("double"))
          .otherwise(lit(0.0)))
    val rk = row_number().over(Window.partitionBy("channel").orderBy(col("re"), col("r")))
    re.withColumn("rk", rk)
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_reps"),
        max(when(col("rk") === loRank, col("re"))).as("re_lo"),
        max(when(col("rk") === medRank, col("re"))).as("re_med"),
        max(when(col("rk") === hiRank, col("re"))).as("re_hi"))
  }

  /** α-sweep: hybrid attribution at α = 0, step, …, 1; per-channel
    * min/max envelope (uncertainty_quantification.py α-sensitivity). */
  def alphaSweep(markov: Map[String, Double], shapley: Map[String, Double], steps: Int = 10): Seq[Band] = {
    val sweeps = (0 to steps).map(i => Shapley.hybrid(markov, shapley, i.toDouble / steps))
    val channels = (markov.keySet ++ shapley.keySet).toSeq.sorted
    channels.map { ch =>
      val xs = sweeps.map(_.getOrElse(ch, 0.0))
      Band(ch, xs.min, xs.max, xs.sum / xs.size)
    }
  }
}
