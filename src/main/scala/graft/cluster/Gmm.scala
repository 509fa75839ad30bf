package graft.cluster

import org.apache.spark.sql.Dataset

/** Gaussian mixture model — EM with diagonal covariance and BIC model
  * selection (reference: src/core/gaussian_mixture.py:81-471: E-step
  * `:356-372`, M-step `:374-399`, BIC `:282-301,435-444`). The
  * reference's accuracy-headline model (81.4% vs 78.0% for K-means,
  * STRESS_TEST_REPORT.md:139-143).
  *
  * Same distribution model as [[KMeans]]: one model per (small) group,
  * fitted locally inside `flatMapGroups`, data-parallel across groups.
  */
object Gmm {

  final case class Cfg(
      kMin: Int = 1,
      kMax: Int = 4,
      maxIter: Int = 100,
      tol: Double = 1e-6,
      // covariance regularization floor (the reference's reg_covar):
      // too small and a component collapses onto a few points, gaming
      // the likelihood past any BIC penalty
      minVar: Double = 1e-3,
      seed: Long = 42L
  )

  final case class Model(
      weights: Array[Double],
      means: Array[Array[Double]],
      variances: Array[Array[Double]], // diagonal
      logLik: Double,
      bic: Double
  ) {
    def k: Int = weights.length
  }

  private def logPdfDiag(x: Array[Double], mu: Array[Double], v: Array[Double]): Double = {
    var s = -0.5 * x.length * math.log(2 * math.Pi)
    var d = 0
    while (d < x.length) {
      s += -0.5 * math.log(v(d)) - 0.5 * (x(d) - mu(d)) * (x(d) - mu(d)) / v(d)
      d += 1
    }
    s
  }

  private def logSumExp(xs: Array[Double]): Double = {
    val m = xs.max
    if (m.isNegInfinity) m else m + math.log(xs.map(x => math.exp(x - m)).sum)
  }

  /** EM fit for a fixed k; init means via k-means++-seeded Lloyd
    * (gaussian_mixture.py initializes from k-means too). Deterministic
    * given (points order, k, seed). */
  def fit(pts: Array[Array[Double]], k: Int, cfg: Cfg = Cfg()): Model = {
    val n = pts.length
    val dim = pts.head.length
    val (initMeans, assign) = KMeans.lloyd(pts, k, 50, cfg.seed)
    val means = initMeans.map(_.clone())
    val vars = Array.fill(k)(Array.fill(dim)(1.0))
    // init vars from the k-means partition
    for (j <- 0 until k) {
      val members = pts.indices.filter(assign(_) == j)
      if (members.nonEmpty) {
        for (d <- 0 until dim) {
          val m = means(j)(d)
          vars(j)(d) = math.max(cfg.minVar, members.map(i => (pts(i)(d) - m) * (pts(i)(d) - m)).sum / members.size)
        }
      }
    }
    val weights = Array.tabulate(k)(j => math.max(1, pts.indices.count(assign(_) == j)).toDouble / n)

    var ll = Double.NegativeInfinity
    var iter = 0
    var converged = false
    val resp = Array.ofDim[Double](n, k)
    while (iter < cfg.maxIter && !converged) {
      // E-step
      var newLl = 0.0
      for (i <- 0 until n) {
        val lw = Array.tabulate(k)(j => math.log(weights(j)) + logPdfDiag(pts(i), means(j), vars(j)))
        val lse = logSumExp(lw)
        newLl += lse
        for (j <- 0 until k) resp(i)(j) = math.exp(lw(j) - lse)
      }
      // M-step
      for (j <- 0 until k) {
        val nj = (0 until n).map(resp(_)(j)).sum
        weights(j) = math.max(1e-12, nj / n)
        for (d <- 0 until dim) {
          val mu = (0 until n).map(i => resp(i)(j) * pts(i)(d)).sum / math.max(nj, 1e-12)
          means(j)(d) = mu
          vars(j)(d) = math.max(
            cfg.minVar,
            (0 until n).map(i => resp(i)(j) * (pts(i)(d) - mu) * (pts(i)(d) - mu)).sum / math.max(nj, 1e-12)
          )
        }
      }
      converged = math.abs(newLl - ll) < cfg.tol * math.max(1.0, math.abs(newLl))
      ll = newLl
      iter += 1
    }
    // BIC = −2·LL + p·ln n, p = free params = k·(2·dim) + (k−1)
    val p = k * 2 * dim + (k - 1)
    Model(weights, means, vars, ll, -2 * ll + p * math.log(n.toDouble))
  }

  /** BIC-selected fit over k = kMin..min(kMax, n/5). */
  def selectBIC(pts: Array[Array[Double]], cfg: Cfg = Cfg()): Model = {
    val kCap = math.max(1, math.min(cfg.kMax, pts.length / 5))
    (math.min(cfg.kMin, kCap) to kCap).map(k => fit(pts, k, cfg)).minBy(_.bic)
  }

  /** Soft responsibilities of a point under a model. */
  def responsibilities(m: Model, x: Array[Double]): Array[Double] = {
    val lw = Array.tabulate(m.k)(j => math.log(m.weights(j)) + logPdfDiag(x, m.means(j), m.variances(j)))
    val lse = logSumExp(lw)
    lw.map(w => math.exp(w - lse))
  }

  final case class GmmAssigned(
      group_id: String,
      item_id: String,
      cluster: Int,
      responsibility: Double,
      k: Int,
      bic: Double
  )

  /** One BIC-selected GMM per group via flatMapGroups (rows sorted by
    * item_id inside the group for determinism). */
  def clusterGroups(points: Dataset[KMeans.GroupedPoint], cfg: Cfg = Cfg()): Dataset[GmmAssigned] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(_.group_id)
      .flatMapGroups { (gid, it) =>
        val rows = it.toArray.sortBy(_.item_id)
        val m = selectBIC(rows.map(_.features), cfg)
        rows.map { r =>
          val resp = responsibilities(m, r.features)
          val best = resp.indices.maxBy(j => (resp(j), -j))
          GmmAssigned(gid, r.item_id, best, resp(best), m.k, m.bic)
        }
      }
  }
}
