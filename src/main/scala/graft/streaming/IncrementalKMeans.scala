package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.cluster.KMeans

/** Streaming incremental K-means — per-account cluster state maintained
  * with `flatMapGroupsWithState`, the Spark analog of the reference's
  * Redis-held incremental clusterer
  * (reference: src/core/incremental_clustering.py:81-458: online update
  * `:97-127`, assignment + confidence `:268-304`, cluster creation at
  * distance cap `:341-375`).
  *
  * Semantics per event: assign to the nearest centroid if within
  * `createDist`, update it online (θ += α(x−θ), adaptive α); otherwise
  * create a new cluster (capped at `maxClusters`; beyond the cap the
  * nearest centroid absorbs). Confidence = exp(−d/(radius+0.1)) as in
  * the reference (incremental_clustering.py:279-287).
  *
  * State size is O(maxClusters × dim) per account — bounded, so the
  * state store scales with #accounts, not #events.
  */
object IncrementalKMeans {

  final case class Point(account_id: String, item_id: String, features: Array[Double])

  /** Per-account state: centroids, member counts, the per-cluster
    * last-`driftWindow`-distances ring feeding the z-score drift signal
    * (reference: incremental_clustering.py:70-71,113-127), and running
    * per-dimension sum / sum-of-squares for the online variance +
    * confidence radius (`:104-111`, Welford-style via moment sums,
    * variance floored at 1e-3 to prevent collapse). Ring and moment
    * sizes are bounded ⇒ state stays O(maxClusters × dim). */
  final case class ClusterState(
      centroids: Array[Array[Double]],
      counts: Array[Long],
      recentDists: Array[Array[Double]] = Array.empty,
      driftScores: Array[Double] = Array.empty,
      sums: Array[Array[Double]] = Array.empty,
      sumSqs: Array[Array[Double]] = Array.empty
  ) {
    /** Per-dim variance of cluster `i`: E[x²] − E[x]², floored. */
    def variance(i: Int): Array[Double] =
      if (i >= sums.length || counts(i) == 0) Array.empty
      else {
        val n = counts(i).toDouble
        sums(i).indices.toArray.map { d =>
          math.max(sumSqs(i)(d) / n - math.pow(sums(i)(d) / n, 2), 0.001)
        }
      }
    /** Confidence radius = 2·mean std dev (incremental_clustering.py
      * get_confidence_radius). */
    def confidenceRadius(i: Int): Double = {
      val v = variance(i)
      if (v.isEmpty) 0.0 else 2.0 * v.map(math.sqrt).sum / v.length
    }
  }

  final case class Assignment(
      account_id: String,
      item_id: String,
      cluster: Int,
      confidence: Double,
      n_clusters: Int,
      drift_score: Double = 0.0,
      drifting: Boolean = false
  )

  final case class Cfg(
      maxClusters: Int = 6,
      createDist: Double = 2.0,
      baseAlpha: Double = 0.1,
      radius: Double = 1.0,
      // z-score window + threshold (incremental_clustering.py:40-41,119-123)
      driftWindow: Int = 10,
      driftThreshold: Double = 2.0
  )

  /** Pure per-batch state transition — shared by the streaming operator
    * and its batch/unit-test oracle. Returns (assignments, new state). */
  def step(points: Seq[Point], st0: Option[ClusterState], cfg: Cfg): (Seq[Assignment], ClusterState) = {
    var cs = st0.map(_.centroids.map(_.clone()).toVector).getOrElse(Vector.empty)
    var counts = st0.map(_.counts.toVector).getOrElse(Vector.empty)
    var rings = st0.map(_.recentDists.map(_.toVector).toVector).getOrElse(Vector.empty)
    var drifts = st0.map(_.driftScores.toVector).getOrElse(Vector.empty)
    var sums = st0.map(_.sums.map(_.clone()).toVector).getOrElse(Vector.empty)
    var sumSqs = st0.map(_.sumSqs.map(_.clone()).toVector).getOrElse(Vector.empty)
    // older checkpoints may predate the ring/moment fields — pad to shape
    while (rings.size < cs.size) rings = rings :+ Vector.empty[Double]
    while (drifts.size < cs.size) drifts = drifts :+ 0.0
    while (sums.size < cs.size) sums = sums :+ cs(sums.size).clone()
    while (sumSqs.size < cs.size) sumSqs = sumSqs :+ cs(sumSqs.size).map(x => x * x)
    def addMoments(i: Int, x: Array[Double]): Unit = {
      sums = sums.updated(i, sums(i).zip(x).map { case (a, b) => a + b })
      sumSqs = sumSqs.updated(i, sumSqs(i).zip(x).map { case (a, b) => a + b * b })
    }

    // z-score of the assignment distance against the cluster's last-w
    // window INCLUDING it (mirrors the reference: append, then score
    // over the trailing 10; population std; 0 until the window fills)
    def scored(ring: Vector[Double], d: Double): (Vector[Double], Double) = {
      val r = (ring :+ d).takeRight(cfg.driftWindow)
      if (r.size < cfg.driftWindow) (r, 0.0)
      else {
        val mean = r.sum / r.size
        val std = math.sqrt(r.map(x => (x - mean) * (x - mean)).sum / r.size)
        (r, if (std > 0) math.abs(d - mean) / std else 0.0)
      }
    }

    val out = points.sortBy(_.item_id).map { p =>
      if (cs.isEmpty) {
        cs = Vector(p.features.clone()); counts = Vector(1L)
        rings = Vector(Vector.empty); drifts = Vector(0.0)
        sums = Vector(p.features.clone()); sumSqs = Vector(p.features.map(x => x * x))
        Assignment(p.account_id, p.item_id, 0, 1.0, 1)
      } else {
        val dists = cs.map(c => math.sqrt(KMeans.sqDist(c, p.features)))
        val best = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        if (dists(best) > cfg.createDist && cs.size < cfg.maxClusters) {
          cs = cs :+ p.features.clone(); counts = counts :+ 1L
          rings = rings :+ Vector.empty; drifts = drifts :+ 0.0
          sums = sums :+ p.features.clone(); sumSqs = sumSqs :+ p.features.map(x => x * x)
          Assignment(p.account_id, p.item_id, cs.size - 1, 1.0, cs.size)
        } else {
          val conf = math.exp(-dists(best) / (cfg.radius + 0.1))
          cs = cs.updated(best, KMeans.onlineUpdate(cs(best), p.features, counts(best), cfg.baseAlpha))
          counts = counts.updated(best, counts(best) + 1)
          addMoments(best, p.features)
          val (ring, z) = scored(rings(best), dists(best))
          rings = rings.updated(best, ring)
          drifts = drifts.updated(best, z)
          Assignment(p.account_id, p.item_id, best, conf, cs.size, z, z > cfg.driftThreshold)
        }
      }
    }
    (out, ClusterState(cs.toArray, counts.toArray, rings.map(_.toArray).toArray, drifts.toArray,
      sums.map(_.clone()).toArray, sumSqs.map(_.clone()).toArray))
  }

  /** Streaming operator: works on a streaming OR batch Dataset[Point]. */
  def assign(points: Dataset[Point], cfg: Cfg = Cfg()): Dataset[Assignment] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(_.account_id)
      .flatMapGroupsWithState[ClusterState, Assignment](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout
      ) { case (_, it, state: GroupState[ClusterState]) =>
        val (out, st) = step(it.toSeq, state.getOption, cfg)
        state.update(st)
        out.iterator
      }
  }
}
