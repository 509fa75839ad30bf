package graft.attribution

import org.apache.spark.sql.SparkSession

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
    val reps: Seq[Map[String, Double]] = spark
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
          Attribution.markovAttribution(Attribution.chainFromCounts(resampled)).toSeq
        }
      }
      .collect()
      .toSeq
      .map(_.toMap)

    val channels = reps.flatMap(_.keys).distinct.sorted
    channels.map { ch =>
      val xs = reps.map(_.getOrElse(ch, 0.0)).sorted
      def pct(q: Double) = xs(math.min(xs.size - 1, math.max(0, math.round(q * (xs.size - 1)).toInt)))
      Band(ch, pct(loQ), pct(hiQ), xs.sum / xs.size)
    }
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
