package graft.cluster

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-group K-means with k-means++ seeding, silhouette model
  * selection, and softmax assignment confidence — the reference's
  * within-account clustering engine re-expressed for Spark
  * (reference: src/core/household_inference.py:328-454 Lloyd +
  * silhouette, `:129-182` softmax assignment).
  *
  * Distribution model mirrors the reference exactly: each GROUP
  * (account) is small (tens-to-hundreds of points), so the Lloyd loop
  * runs locally inside `flatMapGroups`, data-parallel ACROSS groups —
  * at 10^12 docs the parallelism is the number of accounts, not points
  * per account. (The graft-level clustering of the whole corpus is
  * stage C's connected components; this operator is the per-account
  * analytic the reference layers on top.)
  */
object KMeans {

  final case class Cfg(
      kMin: Int = 2,
      kMax: Int = 6,
      maxIter: Int = 100,
      silhouetteThreshold: Double = 0.3,
      temperature: Double = 0.5,
      seed: Long = 42L,
      // z-score features within each group before fitting (the
      // reference normalizes inside its per-account model,
      // household_inference.py:321-326)
      zScore: Boolean = false,
      // silhouette is exact O(n²) per group (matching the reference);
      // above this size it is ESTIMATED on a deterministic stride
      // subsample so one pathological 10⁵-member account cannot wedge
      // a task for hours. Lloyd itself stays exact (O(n·k·iter)).
      silhouetteSample: Int = 2000
  )

  final case class Fit(k: Int, centroids: Array[Array[Double]], assign: Array[Int], silhouette: Double)

  private[graft] def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** k-means++ seeding (household_inference.py:422-454), seeded RNG. */
  private def init(pts: Array[Array[Double]], k: Int, rng: java.util.Random): Array[Array[Double]] = {
    val cs = new Array[Array[Double]](k)
    cs(0) = pts(rng.nextInt(pts.length)).clone()
    for (c <- 1 until k) {
      val d2 = pts.map(p => (0 until c).map(j => sqDist(p, cs(j))).min)
      val tot = d2.sum
      var r = rng.nextDouble() * tot
      var idx = 0
      while (idx < pts.length - 1 && r > d2(idx)) { r -= d2(idx); idx += 1 }
      cs(c) = pts(idx).clone()
    }
    cs
  }

  /** Lloyd's algorithm (household_inference.py:371-420). Deterministic
    * given (points order, k, seed). */
  def lloyd(pts: Array[Array[Double]], k: Int, maxIter: Int, seed: Long): (Array[Array[Double]], Array[Int]) = {
    val rng = new java.util.Random(seed)
    val dim = pts.head.length
    var cs = init(pts, k, rng)
    val assign = new Array[Int](pts.length)
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      changed = false
      var i = 0
      while (i < pts.length) {
        var best = 0; var bd = sqDist(pts(i), cs(0))
        var j = 1
        while (j < k) { val d = sqDist(pts(i), cs(j)); if (d < bd) { bd = d; best = j }; j += 1 }
        if (assign(i) != best) { assign(i) = best; changed = true }
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val cnts = new Array[Int](k)
      for (i <- pts.indices) {
        cnts(assign(i)) += 1
        val s = sums(assign(i)); val p = pts(i)
        var d = 0; while (d < dim) { s(d) += p(d); d += 1 }
      }
      cs = Array.tabulate(k)(j => if (cnts(j) == 0) cs(j) else sums(j).map(_ / cnts(j)))
      iter += 1
    }
    (cs, assign)
  }

  /** Mean silhouette coefficient, exact O(n²) — groups are small by
    * construction (household_inference.py:456-504). */
  def silhouette(pts: Array[Array[Double]], assign: Array[Int], k: Int): Double = {
    if (k < 2) return 0.0
    val n = pts.length
    val vals = (0 until n).map { i =>
      val byCluster = Array.fill(k)(0.0)
      val cnt = Array.fill(k)(0)
      for (j <- 0 until n if j != i) {
        byCluster(assign(j)) += math.sqrt(sqDist(pts(i), pts(j)))
        cnt(assign(j)) += 1
      }
      val own = assign(i)
      if (cnt(own) == 0) 0.0
      else {
        val a = byCluster(own) / cnt(own)
        val bs = (0 until k).filter(c => c != own && cnt(c) > 0).map(c => byCluster(c) / cnt(c))
        if (bs.isEmpty) 0.0
        else { val b = bs.min; if (math.max(a, b) == 0) 0.0 else (b - a) / math.max(a, b) }
      }
    }
    vals.sum / n
  }

  /** Silhouette (exact below `cap`, stride-subsample estimate above):
    * sample indices 0, step, 2·step, … — deterministic, preserves the
    * cluster mix of the sorted input, and bounds the cost at O(cap²). */
  private[graft] def silhouetteCapped(pts: Array[Array[Double]], assign: Array[Int], k: Int, cap: Int): Double = {
    if (pts.length <= cap) silhouette(pts, assign, k)
    else {
      val step = pts.length.toDouble / cap
      val idx = Array.tabulate(cap)(i => (i * step).toInt)
      silhouette(idx.map(pts), idx.map(assign), k)
    }
  }

  /** Silhouette-selected fit: try k = kMin..min(kMax, n/10 floor like
    * the reference); fall back to k = 1 when no k clears the threshold
    * (household_inference.py:328-369). */
  def fit(pts: Array[Array[Double]], cfg: Cfg = Cfg()): Fit = {
    val kCap = math.min(cfg.kMax, math.max(1, pts.length / 10))
    if (pts.length < 2 || kCap < cfg.kMin)
      return Fit(1, Array(mean(pts)), Array.fill(pts.length)(0), 0.0)
    val fits = (cfg.kMin to kCap).map { k =>
      val (cs, as) = lloyd(pts, k, cfg.maxIter, cfg.seed)
      Fit(k, cs, as, silhouetteCapped(pts, as, k, cfg.silhouetteSample))
    }
    val best = fits.maxBy(_.silhouette)
    if (best.silhouette >= cfg.silhouetteThreshold) best
    else Fit(1, Array(mean(pts)), Array.fill(pts.length)(0), 0.0)
  }

  private def mean(pts: Array[Array[Double]]): Array[Double] = {
    val dim = pts.head.length
    val s = new Array[Double](dim)
    pts.foreach(p => { var d = 0; while (d < dim) { s(d) += p(d); d += 1 } })
    s.map(_ / pts.length)
  }

  /** Softmax assignment confidence exp(−d/τ)/Σ over centroids
    * (household_inference.py:129-182). */
  def softmaxConfidence(dists: Array[Double], temperature: Double): Array[Double] = {
    val w = dists.map(d => math.exp(-d / temperature))
    val tot = w.sum
    if (tot == 0) Array.fill(dists.length)(1.0 / dists.length) else w.map(_ / tot)
  }

  /** Online centroid update θ += α(x−θ) with adaptive learning rate
    * α = base / (1 + 0.01·count) (reference:
    * src/core/incremental_clustering.py:97-127). Shared by the
    * streaming incremental clusterer. */
  def onlineUpdate(centroid: Array[Double], x: Array[Double], count: Long, baseAlpha: Double = 0.1): Array[Double] = {
    val alpha = baseAlpha / (1.0 + 0.01 * count)
    Array.tabulate(centroid.length)(i => centroid(i) + alpha * (x(i) - centroid(i)))
  }

  /** Per-dim z-score over a local point set (constant dims → 0). */
  private[graft] def zScoreLocal(pts: Array[Array[Double]]): Array[Array[Double]] = {
    if (pts.isEmpty) return pts
    val dim = pts.head.length
    val mu = new Array[Double](dim)
    pts.foreach(p => { var d = 0; while (d < dim) { mu(d) += p(d); d += 1 } })
    (0 until dim).foreach(d => mu(d) /= pts.length)
    val sd = new Array[Double](dim)
    pts.foreach(p => { var d = 0; while (d < dim) { val x = p(d) - mu(d); sd(d) += x * x; d += 1 } })
    (0 until dim).foreach(d => sd(d) = math.sqrt(sd(d) / pts.length))
    pts.map(p => Array.tabulate(dim)(d => if (sd(d) > 0) (p(d) - mu(d)) / sd(d) else 0.0))
  }

  final case class GroupedPoint(group_id: String, item_id: String, features: Array[Double])
  final case class Assigned(
      group_id: String,
      item_id: String,
      cluster: Int,
      confidence: Double,
      k: Int,
      silhouette: Double
  )

  /** Distributed per-group clustering: one silhouette-selected K-means
    * model per group_id via flatMapGroups (typed; no codegen — matches
    * the reference's per-account model boundary, SURVEY §2.13). Input
    * rows are sorted by item_id inside each group so fits are
    * deterministic under any partitioning. */
  def clusterGroups(points: Dataset[GroupedPoint], cfg: Cfg = Cfg()): Dataset[Assigned] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(_.group_id)
      .flatMapGroups { (gid, it) =>
        val rows = it.toArray.sortBy(_.item_id)
        val raw = rows.map(_.features)
        val pts = if (cfg.zScore) zScoreLocal(raw) else raw
        val f = fit(pts, cfg)
        rows.zipWithIndex.map { case (r, i) =>
          val dists = f.centroids.map(c => math.sqrt(sqDist(pts(i), c)))
          val conf = softmaxConfidence(dists, cfg.temperature)(f.assign(i))
          Assigned(gid, r.item_id, f.assign(i), conf, f.k, f.silhouette)
        }
      }
  }

  /** Deterministic DISTRIBUTED per-group z-score (population σ) with
    * order-fixed floating-point folds — the cross-engine-reproducible
    * twin of [[zScoreLocal]], feeding [[lloydDeterministic]] on the
    * oracled op_kmeans_households path (reference normalization:
    * household_inference.py:321-326). Per (group_id, pos): μ and σ are
    * item_id-ordered left folds divided by n, so a DuckDB
    * `list_reduce(list(x ORDER BY item_id), ...)` reproduces every bit;
    * constant dimensions (σ = 0) map to 0 like zScoreLocal.
    *
    * Input/output: (group_id, item_id, features: array<double>). Two
    * aggregate shuffles on (group_id, pos) + one rebuild aggregate on
    * (group_id, item_id) — all keyed on group-sized grains, so at scale
    * this parallelizes over groups×dims like the Lloyd update itself. */
  def zScoreDeterministic(pts: DataFrame): DataFrame = {
    def fold(c: org.apache.spark.sql.Column) = aggregate(
      sort_array(collect_list(struct(col("item_id"), c.as("v")))),
      lit(0.0),
      (acc, s) => acc + s.getField("v")
    )
    val fx = pts.select(
      col("group_id"), col("item_id"),
      posexplode(col("features")).as(Seq("pos", "x"))
    )
    val mu = fx.groupBy("group_id", "pos")
      .agg((fold(col("x")) / count(lit(1))).as("mu"))
    val fxm = fx.join(mu, Seq("group_id", "pos"))
    val sd = fxm.groupBy("group_id", "pos")
      .agg(sqrt(fold((col("x") - col("mu")) * (col("x") - col("mu"))) / count(lit(1)).cast("double")).as("sd"))
    fxm.join(sd, Seq("group_id", "pos"))
      .withColumn("z", when(col("sd") > 0, (col("x") - col("mu")) / col("sd")).otherwise(lit(0.0)))
      .groupBy("group_id", "item_id")
      .agg(
        transform(sort_array(collect_list(struct(col("pos"), col("z")))), s => s.getField("z"))
          .as("features")
      )
  }

  /** Fully-deterministic DISTRIBUTED Lloyd with fixed k, fixed
    * iteration count, and lowest-item_id init — the cross-engine oracle
    * twin of [[clusterGroups]] (which stays silhouette-selected and
    * k-means++-seeded for production). Every floating-point reduction
    * is an ORDER-FIXED fold (item_id order for member sums, pos order
    * for dimension rebuild, index order for distances), so a DuckDB
    * oracle recomputing the same folds left-to-right reproduces the
    * assignments bit-exactly — the q32 md5-twin pattern applied to the
    * per-group model fits (reference semantics:
    * household_inference.py:371-454).
    *
    * Input cols: (group_id, item_id:long-orderable, features:
    * array<double>). Output: (group_id, item_id, cluster:long, dist6) —
    * the final argmin assignment and its squared distance rounded to 6
    * digits. Runs `iters` assignment rounds with `iters − 1` centroid
    * updates between them; empty clusters drop out of the centroid
    * table (both engines agree: no members → no row). */
  def lloydDeterministic(pts: DataFrame, k: Int, iters: Int): DataFrame =
    lloydDeterministicParts(pts, k, iters)._1

  /** [[lloydDeterministic]] exposing BOTH outputs: the final
    * assignments AND the centroid table they were assigned against
    * (c_{iters−1}). The IVF coarse quantizer ([[graft.ops.Ivf]]) needs
    * the centroids for query-side cell probing; a DuckDB oracle reads
    * the same table as the `c<iters-1>` CTE of [[
    * graft.queries.LloydSql]].chain. Centroid schema:
    * (group_id, cluster, cent: array<double>). */
  def lloydDeterministicParts(pts: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1)
    // init = the k lowest item_ids per group, in TWO phases. Phase 1:
    // a per-(group, physical-partition) window caps its output at k
    // rows each — the k global minima survive by construction. Phase 2
    // picks the k winners per group from the ≤ k × numPartitions
    // survivors with a plain partial+final aggregate — deliberately NOT
    // a per-group window, because a caller training ONE group (Ivf's
    // coarse quantizer) constant-folds group_id out of a window's
    // partition spec and the window degenerates to a single partition
    // over the whole training set. Selected init is bit-identical to
    // the old single-window form.
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("group_id", "_phys").orderBy("item_id")
    var cents = pts
      .withColumn("_phys", spark_partition_id())
      .withColumn("rn", row_number().over(wLocal))
      .where(col("rn") <= k)
      .groupBy("group_id")
      .agg(slice(array_sort(collect_list(struct(col("item_id"), col("features")))), 1, k).as("top"))
      .select(col("group_id"), posexplode(col("top")).as(Seq("cluster", "kv")))
      .select(col("group_id"), col("cluster").cast("long").as("cluster"), col("kv.features").as("cent"))

    def sqd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

    def assign(c: DataFrame): DataFrame =
      pts.join(c, "group_id")
        .withColumn("dist", sqd(col("features"), col("cent")))
        .groupBy("group_id", "item_id")
        .agg(min(struct(col("dist"), col("cluster"))).as("best"))
        .select(
          col("group_id"), col("item_id"),
          col("best.cluster").as("cluster"), col("best.dist").as("dist")
        )

    var assigned = assign(cents)
    for (_ <- 2 to iters) {
      val ex = pts
        .join(assigned.select("group_id", "item_id", "cluster"), Seq("group_id", "item_id"))
        .select(
          col("group_id"), col("cluster"), col("item_id"),
          posexplode(col("features")).as(Seq("pos", "x"))
        )
      cents = ex
        .groupBy("group_id", "cluster", "pos")
        .agg(
          (aggregate(
            sort_array(collect_list(struct(col("item_id"), col("x")))),
            lit(0.0),
            (acc, s) => acc + s.getField("x")
          ) / count(lit(1))).as("m")
        )
        .groupBy("group_id", "cluster")
        .agg(
          transform(sort_array(collect_list(struct(col("pos"), col("m")))), s => s.getField("m"))
            .as("cent")
        )
      assigned = assign(cents)
    }
    (
      assigned.select(
        col("group_id"), col("item_id"), col("cluster"),
        round(col("dist"), 6).as("dist6")
      ),
      cents
    )
  }

  /** Exact per-point silhouette as a DISTRIBUTED, cross-engine-
    * verifiable DataFrame — the oracle twin of [[silhouette]] (q52),
    * the k-selection criterion's arithmetic made engine-replayable.
    * Same recipe as [[lloydDeterministic]]: every fp reduction is an
    * ORDER-FIXED fold — the squared distance folds dimensions in pos
    * order, each per-(point, cluster) distance sum folds neighbors in
    * item_id order (sqrt is correctly-rounded IEEE, so identical
    * cross-engine), a and b are ONE division each, min/greatest and
    * the final (b−a)/max(a,b) are order-free — so a DuckDB replay
    * lands bit-identical. Edge semantics mirror [[silhouette]]:
    * singleton own cluster → 0, no other non-empty cluster → 0,
    * max(a,b) = 0 → 0. The pairwise self-join is O(n²) BY DEFINITION
    * of exact silhouette — the production path caps it
    * ([[silhouetteCapped]] stride sample); this surface is for
    * verification and per-account-sized groups.
    * Input: vecs (item_id, features), assign (item_id, cluster).
    * Output: (item_id, cluster, n_own, a_mean, b_mean, sil). */
  def silhouetteDF(vecs: DataFrame, assign: DataFrame): DataFrame = {
    val pa = vecs.join(assign, "item_id")
    val lhs = pa.select(col("item_id").as("id_i"), col("features").as("v_i"), col("cluster").as("c_i"))
    val rhs = pa.select(col("item_id").as("id_j"), col("features").as("v_j"), col("cluster").as("c_j"))
    val pairs = lhs.join(rhs, col("id_i") =!= col("id_j"))
      .withColumn("d",
        sqrt(aggregate(
          zip_with(col("v_i"), col("v_j"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v)))
    val per = pairs.groupBy("id_i", "c_i", "c_j")
      .agg(
        aggregate(
          sort_array(collect_list(struct(col("id_j"), col("d")))),
          lit(0.0), (acc, s) => acc + s.getField("d")).as("dsum"),
        count(lit(1)).as("cnt"))
    val own = per.where(col("c_j") === col("c_i"))
      .select(col("id_i"), (col("dsum") / col("cnt").cast("double")).as("a_mean"), col("cnt").as("n_own"))
    val oth = per.where(col("c_j") =!= col("c_i"))
      .groupBy("id_i")
      .agg(min(col("dsum") / col("cnt").cast("double")).as("b_mean"))
    pa.select(col("item_id"), col("cluster"))
      .join(own.withColumnRenamed("id_i", "item_id"), Seq("item_id"), "left")
      .join(oth.withColumnRenamed("id_i", "item_id"), Seq("item_id"), "left")
      .select(
        col("item_id"), col("cluster"),
        coalesce(col("n_own"), lit(0L)).as("n_own"),
        coalesce(col("a_mean"), lit(0.0)).as("a_mean"),
        coalesce(col("b_mean"), lit(0.0)).as("b_mean"),
        when(
          col("a_mean").isNull || col("b_mean").isNull ||
            greatest(col("a_mean"), col("b_mean")) === 0.0, lit(0.0))
          .otherwise((col("b_mean") - col("a_mean")) / greatest(col("a_mean"), col("b_mean")))
          .as("sil"))
  }
}
