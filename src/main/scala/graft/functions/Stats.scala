package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scalar/statistical Column helpers mirroring the reference's feature
  * and metric math (SURVEY.md §2.5, §2.9) — all pure expression trees,
  * no UDFs.
  */
object Stats {

  /** Cyclical encoding sin/cos(2π·v/period) — the reference's
    * hour/day-of-week features (reference:
    * src/models/streaming_event.py:104-111,
    * src/api/optimized_api_server.py:360-363). */
  def cyclical(v: Column, period: Double): (Column, Column) = {
    val angle = v * lit(2.0 * math.Pi / period)
    (sin(angle), cos(angle))
  }

  /** Sigmoid 1/(1+e^{-x}) — the reference's link-probability squash
    * (reference: src/core/cross_device_linker.py:214, 368-370). */
  def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  /** Shannon entropy of a distribution given as an array of
    * non-negative weights, normalized to [0,1] by log(n) — the
    * reference's temporal-regularity feature (reference:
    * src/models/device_profile.py:182-189). */
  def normalizedEntropy(weights: Column): Column = {
    val total = aggregate(weights, lit(0.0), (a, x) => a + x)
    val h = aggregate(
      weights,
      lit(0.0),
      (a, x) => a + when(x > 0, -(x / total) * log(x / total)).otherwise(lit(0.0))
    )
    when(size(weights) > 1 && total > 0, h / log(size(weights).cast("double"))).otherwise(lit(0.0))
  }

  /** Cosine similarity of two equal-length weight arrays (fixed
    * vocabulary order) — the reference's genre/hour distribution
    * similarity (reference: src/core/cross_device_linker.py:353-366,
    * src/models/device_profile.py:237-250). */
  def cosineSim(a: Column, b: Column): Column = graft.ops.Similarity.cosine(a, b)

  /** Circular distance on a 24h clock (reference:
    * src/core/drift_detection.py:262-265). */
  def circularHourDistance(a: Column, b: Column): Column =
    least(abs(a - b), lit(24) - abs(a - b))

  /** Softmax over an array of scores with temperature τ (reference's
    * session→person assignment, src/core/household_inference.py:168-172:
    * exp(−d/τ) normalized). Input: distances; output: probabilities. */
  def softmaxNegDistances(d: Column, tau: Double): Column = {
    val expd = transform(d, x => exp(-x / lit(tau)))
    val z = aggregate(expd, lit(0.0), (a, x) => a + x)
    transform(expd, x => x / z)
  }

  /** Welford-equivalent batch variance/mean per group — the
    * reference's online cluster statistics (reference:
    * src/core/incremental_clustering.py:103-111). Use inside
    * groupBy(...).agg(...). */
  def meanVar(x: Column): Seq[Column] = Seq(avg(x).as("mean"), var_pop(x).as("variance"))

  /** Engagement share: each member's weight as a fraction of its
    * group's total (reference: src/models/household_profile.py:220-245). */
  def shareOver(weight: Column, group: Column*): Column =
    weight / sum(weight).over(Window.partitionBy(group: _*))

  /** KL divergence term Σ p·log(p/q) from two count columns plus group
    * totals — build the per-row term; sum per group for D_KL (reference:
    * README.md:210-222; db/schema.sql kl_divergence). */
  def klTerm(p: Column, q: Column): Column =
    when(p > 0 && q > 0, p * log(p / q)).otherwise(lit(0.0))
}
