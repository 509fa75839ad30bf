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

  /** Per-account state: centroids, member counts, and the per-cluster
    * last-`driftWindow`-distances ring feeding the z-score drift signal
    * (reference: incremental_clustering.py:70-71,113-127). Ring size is
    * bounded by Cfg.driftWindow ⇒ state stays O(maxClusters × dim). */
  final case class ClusterState(
      centroids: Array[Array[Double]],
      counts: Array[Long],
      recentDists: Array[Array[Double]] = Array.empty,
      driftScores: Array[Double] = Array.empty
  )

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
    // older checkpoints may predate the ring fields — pad to shape
    while (rings.size < cs.size) rings = rings :+ Vector.empty[Double]
    while (drifts.size < cs.size) drifts = drifts :+ 0.0

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
        Assignment(p.account_id, p.item_id, 0, 1.0, 1)
      } else {
        val dists = cs.map(c => math.sqrt(KMeans.sqDist(c, p.features)))
        val best = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        if (dists(best) > cfg.createDist && cs.size < cfg.maxClusters) {
          cs = cs :+ p.features.clone(); counts = counts :+ 1L
          rings = rings :+ Vector.empty; drifts = drifts :+ 0.0
          Assignment(p.account_id, p.item_id, cs.size - 1, 1.0, cs.size)
        } else {
          val conf = math.exp(-dists(best) / (cfg.radius + 0.1))
          cs = cs.updated(best, KMeans.onlineUpdate(cs(best), p.features, counts(best), cfg.baseAlpha))
          counts = counts.updated(best, counts(best) + 1)
          val (ring, z) = scored(rings(best), dists(best))
          rings = rings.updated(best, ring)
          drifts = drifts.updated(best, z)
          Assignment(p.account_id, p.item_id, best, conf, cs.size, z, z > cfg.driftThreshold)
        }
      }
    }
    (out, ClusterState(cs.toArray, counts.toArray, rings.map(_.toArray).toArray, drifts.toArray))
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
