package graft.attribution

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Shapley-value attribution (reference: src/attribution/
  * shapley_engine.py:96-173) with the characteristic function the
  * reference uses: v(S) = share of conversions whose touched-channel
  * set is a subset of S.
  *
  * Distribution split: the coalition table (channel-set → conversion
  * count) is built with one distributed aggregation over converting
  * paths; there are at most 2^n distinct sets (n ≤ 12 guardrail,
  * reference shapley_engine.py:67-75), so the Shapley sums run locally
  * over a dense 2^n array (subset-sum zeta transform, O(2^n·n)).
  * Monte Carlo permutation sampling fans out via spark.range.
  */
object Shapley {

  val MaxChannels = 12

  /** Distributed coalition counts: (channels: sorted distinct array,
    * n_conversions). */
  def coalitionCounts(events: DataFrame, convType: String = "purchase"): DataFrame =
    Attribution.userPaths(events, convType)
      .where(col("converted"))
      .select(array_sort(array_distinct(col("path"))).as("channels"))
      .groupBy("channels")
      .agg(count(lit(1)).as("n_conversions"))

  /** Dense v over all 2^n subsets: v[mask] = Σ counts of coalition sets
    * ⊆ mask, normalized by total conversions. */
  final case class Game(channels: Vector[String], v: Array[Double])

  def game(coalitions: Seq[(Seq[String], Long)]): Game = {
    val channels = coalitions.flatMap(_._1).distinct.sorted.toVector
    require(channels.size <= MaxChannels, s"exact Shapley capped at $MaxChannels channels (got ${channels.size})")
    val idx = channels.zipWithIndex.toMap
    val n = channels.size
    val v = new Array[Double](1 << n)
    var total = 0.0
    coalitions.foreach { case (chs, cnt) =>
      val mask = chs.map(c => 1 << idx(c)).foldLeft(0)(_ | _)
      v(mask) += cnt.toDouble
      total += cnt.toDouble
    }
    // zeta transform: v[S] = Σ_{T ⊆ S} raw[T]
    for (i <- 0 until n; mask <- 0 until (1 << n)) if ((mask & (1 << i)) != 0) v(mask) += v(mask ^ (1 << i))
    if (total > 0) for (m <- v.indices) v(m) /= total
    Game(channels, v)
  }

  /** Exact Shapley values, O(n·2^n) (shapley_engine.py:96-137). */
  def exact(g: Game): Map[String, Double] = {
    val n = g.channels.size
    val fact = new Array[Double](n + 1)
    fact(0) = 1.0
    for (i <- 1 to n) fact(i) = fact(i - 1) * i
    val phi = new Array[Double](n)
    for (mask <- 0 until (1 << n); i <- 0 until n) if ((mask & (1 << i)) == 0) {
      val s = Integer.bitCount(mask)
      val w = fact(s) * fact(n - s - 1) / fact(n)
      phi(i) += w * (g.v(mask | (1 << i)) - g.v(mask))
    }
    g.channels.zipWithIndex.map { case (c, i) => c -> phi(i) }.toMap
  }

  /** Exact Shapley in SCALED INTEGER arithmetic, as a DataFrame — the
    * cross-engine-verifiable twin of [[exact]] (q44). With raw
    * coalition counts (not normalized) the quantity
    *   phi_num(i) = Σ_{S ∌ i} |S|!·(n−|S|−1)!·(vraw(S∪{i}) − vraw(S))
    * is an exact integer and phi(i) = phi_num(i) / (n!·total); every
    * step is Long-domain, so an independent engine replaying the same
    * subset algebra lands on the identical integers — no fp fold-order
    * caveats (contrast the documented GMM exp/ln limit). Coalition
    * counting is the distributed half (one aggregation over converting
    * paths); the 2^n subset sweep is driver-local over ≤ 2^MaxChannels
    * values, the same bounded-reduction split as [[exact]] and the
    * Markov chain algebra (reference: shapley_engine.py:96-137).
    * Output: (channel, n_channels, total_conv, phi_num). */
  /** Shared distributed-count + zeta-transform prelude of the integer
    * engines: sorted channel vocabulary, raw (unnormalized) v over all
    * 2^n masks, and the total conversion count. */
  private def rawGame(events: DataFrame, convType: String): (Vector[String], Array[Long], Long) = {
    val spark = events.sparkSession
    import spark.implicits._
    val coalitions: Seq[(Seq[String], Long)] =
      coalitionCounts(events, convType).as[(Seq[String], Long)].collect().toSeq
    val channels = coalitions.flatMap(_._1).distinct.sorted.toVector
    val n = channels.size
    require(n <= MaxChannels, s"exact Shapley capped at $MaxChannels channels (got $n)")
    val idx = channels.zipWithIndex.toMap
    val vraw = new Array[Long](1 << n)
    var total = 0L
    coalitions.foreach { case (chs, cnt) =>
      val mask = chs.map(c => 1 << idx(c)).foldLeft(0)(_ | _)
      vraw(mask) += cnt
      total += cnt
    }
    for (i <- 0 until n; mask <- 0 until (1 << n))
      if ((mask & (1 << i)) != 0) vraw(mask) += vraw(mask ^ (1 << i))
    (channels, vraw, total)
  }

  def exactScaledDF(events: DataFrame, convType: String = "purchase"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val (channels, vraw, total) = rawGame(events, convType)
    val n = channels.size
    val fact = new Array[Long](n + 1)
    fact(0) = 1L
    for (i <- 1 to n) fact(i) = fact(i - 1) * i
    // |phi_num| <= n!·total (the per-i weights sum to n! and each diff
    // is bounded by total) — guard the Long domain loudly instead of
    // letting the "every step is Long-domain" claim silently wrap
    // (the ClusterAgreement longSafeMax discipline)
    require(n == 0 || total <= Long.MaxValue / fact(n),
      s"exactScaledDF Long domain exceeded: n!*total_conv = ${fact(n)}*$total overflows Long — " +
        "pre-aggregate conversions or reduce the channel set")
    val rows = channels.zipWithIndex.map { case (c, i) =>
      var acc = 0L
      for (mask <- 0 until (1 << n)) if ((mask & (1 << i)) == 0) {
        val s = Integer.bitCount(mask)
        acc += fact(s) * fact(n - s - 1) * (vraw(mask | (1 << i)) - vraw(mask))
      }
      (c, n.toLong, total, acc)
    }
    rows.toDF("channel", "n_channels", "total_conv", "phi_num")
  }

  /** Monte Carlo Shapley via permutation sampling
    * (shapley_engine.py:139-173), fanned out with spark.range — each
    * sample index seeds its own RNG so the estimate is deterministic.
    * Returns channel → (estimate, standard error). */
  def monteCarlo(spark: SparkSession, g: Game, samples: Int, seed: Long = 42L): Map[String, (Double, Double)] = {
    import spark.implicits._
    val n = g.channels.size
    if (n == 0) return Map.empty
    val vB = spark.sparkContext.broadcast(g.v)
    val contribs = spark.range(samples).mapPartitions { it =>
      val v = vB.value
      it.map { k =>
        val rng = new java.util.Random(seed ^ (k * 0x9E3779B97F4A7C15L))
        val perm = rng.ints(0, n).distinct().limit(n).toArray
        var mask = 0
        val row = new Array[Double](n)
        perm.foreach { i =>
          val before = v(mask); mask |= 1 << i
          row(i) = v(mask) - before
        }
        row
      }
    }
    val aggExprs =
      (0 until n).flatMap(i => Seq(avg(col(s"c$i")).as(s"m$i"), stddev_samp(col(s"c$i")).as(s"s$i")))
    val stats = contribs
      .toDF("c")
      .select((0 until n).map(i => col("c").getItem(i).as(s"c$i")): _*)
      .agg(
        aggExprs.head,
        aggExprs.tail: _*
      )
      .head()
    g.channels.zipWithIndex.map { case (c, i) =>
      val m = stats.getAs[Double](s"m$i")
      val s = Option(stats.getAs[Double](s"s$i")).getOrElse(0.0)
      c -> (m, s / math.sqrt(samples.toDouble))
    }.toMap
  }

  /** Deterministic Monte Carlo Shapley as a distributed DataFrame —
    * the cross-engine-verifiable twin of [[monteCarlo]] (q48). Sample
    * k's permutation is the lexicographic order of
    * md5(k || '|' || channel) — an engine-independent shuffle (the
    * md5-twin discipline of q28/q32-q34) — and every accumulation is
    * Long-domain: mc_num(i) = Σ_k [vraw(prefix_k(i)∪{i}) −
    * vraw(prefix_k(i))] is an exact integer whose estimate is
    * mc_num / (samples · total), so the cross-engine hash can't drift
    * on fp fold order (and, unlike a seeded JVM RNG, the sampling
    * itself is reproducible by ANY engine). The v table (2^n ≤ 4096
    * rows) broadcasts; the samples×channels fan-out and the
    * prefix-mask window run distributed, so the sample count scales
    * without a driver loop. Integer invariant:
    * Σ_i mc_num = samples · (vraw(full) − vraw(∅)).
    * Output: (channel, samples, total_conv, mc_num).
    * Reference: shapley_engine.py:139-173 (permutation sampling). */
  def monteCarloDetDF(events: DataFrame, samples: Int, convType: String = "purchase"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val (channels, vraw, total) = rawGame(events, convType)
    val vDf = vraw.toIndexedSeq.zipWithIndex
      .map { case (v, m) => (m.toLong, v) }.toDF("mask", "v")
    val chDf = channels.zipWithIndex
      .map { case (c, i) => (c, 1L << i) }.toDF("channel", "bit")
    val w = Window.partitionBy("k").orderBy("key", "channel")
    spark.range(samples).toDF("k")
      .crossJoin(broadcast(chDf)) // ≤ MaxChannels rows — bounded fan-out
      .withColumn("key", md5(concat(col("k").cast("string"), lit("|"), col("channel"))))
      // channels before this one in sample k's permutation, as a mask;
      // bit ∉ prefix, so prefix + bit == prefix | bit (Long-exact)
      .withColumn("prefix",
        coalesce(sum(col("bit")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(vDf.select(col("mask").as("m0"), col("v").as("v0"))), col("prefix") === col("m0"))
      .join(broadcast(vDf.select(col("mask").as("m1"), col("v").as("v1"))),
        (col("prefix") + col("bit")) === col("m1"))
      .groupBy("channel")
      .agg(sum(col("v1") - col("v0")).as("mc_num"))
      .select(col("channel"), lit(samples.toLong).as("samples"),
        lit(total).as("total_conv"), col("mc_num"))
  }

  /** Hybrid Markov×Shapley blend in SCALED INTEGER arithmetic — the
    * cross-engine-verifiable twin of [[hybrid]] (q49). Markov arm:
    * the path-based removal-effect integers m_num(c) = converting
    * users touched by c (q18's counts), normalized by M = Σ m_num.
    * Shapley arm: q44's exact phi_num(c), normalized by
    * S = Σ phi_num (the efficiency sum). With α = alphaNum/alphaDen,
    *   hybrid_num(c) = alphaNum·m_num(c)·S + (alphaDen−alphaNum)·phi_num(c)·M
    *   hybrid_den    = alphaDen·M·S
    * are exact Longs (domain guarded loudly, the q44 discipline), so
    * value conservation Σ_c hybrid_num = hybrid_den holds EXACTLY —
    * not within 1e-9 — and the emitted share is ONE IEEE division, so
    * the cross-engine hash can't drift on fp fold order. Both arms are
    * BOUNDED driver reductions (≤ MaxChannels rows each) over their
    * distributed halves (path window, coalition counts), collected
    * exactly once — the blend runs on one consistent snapshot and the
    * overflow guard covers the very integers that are emitted (a lazy
    * formulation would recompute the Markov subtree per
    * materialization and could outgrow an already-passed guard). At
    * 100 TB checkpoint userPaths once and feed both arms.
    * Reference: hybrid_engine.py:217-218 (α·markov + (1−α)·shapley),
    * hybrid_engine.py:191-253 (conservation). */
  def hybridScaledDF(
      events: DataFrame,
      alphaNum: Long = 2L,
      alphaDen: Long = 5L,
      convType: String = "purchase"): DataFrame = {
    require(alphaDen > 0 && alphaNum >= 0 && alphaNum <= alphaDen,
      s"alpha = $alphaNum/$alphaDen outside [0,1]")
    val spark = events.sparkSession
    import spark.implicits._
    val phi = exactScaledDF(events, convType)
      .select(col("channel"), col("phi_num")).as[(String, Long)].collect().toMap
    val m = Attribution.removalEffectsPathBased(events, convType)
      .select(col("channel"), col("n_conv_with")).as[(String, Long)].collect().toMap
    // channel vocabularies coincide (both are the distinct channels on
    // converting paths) — the union keeps the contract honest if one
    // arm ever drops a channel
    val channels = (phi.keySet ++ m.keySet).toSeq.sorted
    val mDen = m.values.sum
    val sDen = phi.values.sum
    // Long-domain guard (phi_num, m_num ≥ 0: the game is monotone, so
    // every blend term is bounded by alphaDen·M·S)
    require(mDen == 0L || sDen == 0L || Long.MaxValue / mDen / sDen >= alphaDen,
      s"hybridScaledDF Long domain exceeded: $alphaDen*$mDen*$sDen overflows Long — " +
        "pre-aggregate conversions or reduce the channel set")
    val hden = alphaDen * mDen * sDen
    val rows = channels.map { ch =>
      val mn = m.getOrElse(ch, 0L)
      val pn = phi.getOrElse(ch, 0L)
      val hn = alphaNum * mn * sDen + (alphaDen - alphaNum) * pn * mDen
      (ch, mn, mDen, pn, sDen, hn, hden,
        if (hden > 0) hn.toDouble / hden.toDouble else 0.0)
    }
    rows.toDF("channel", "m_num", "m_den", "phi_num", "s_den",
      "hybrid_num", "hybrid_den", "hybrid_share")
  }

  /** Hybrid blend H_i = α·markov_i + (1−α)·shapley_i, renormalized;
    * returns shares summing to 1 (value conservation —
    * reference: src/attribution/hybrid_engine.py:191-253). */
  def hybrid(markov: Map[String, Double], shapley: Map[String, Double], alpha: Double): Map[String, Double] = {
    require(alpha >= 0 && alpha <= 1, "alpha in [0,1]")
    val keys = (markov.keySet ++ shapley.keySet).toSeq.sorted
    val raw = keys.map(k => k -> (alpha * markov.getOrElse(k, 0.0) + (1 - alpha) * shapley.getOrElse(k, 0.0)))
    val tot = raw.map(_._2).sum
    if (tot <= 0) raw.toMap else raw.map { case (k, x) => k -> x / tot }.toMap
  }
}
