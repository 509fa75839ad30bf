package graft.attribution

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Multi-touch attribution over event streams — the reference's
  * headline downstream consumer (reference:
  * src/attribution/markov_engine.py:161-377, src/adapters/
  * attribution_adapter.py:129-376).
  *
  * Distribution split: path construction and transition counting are
  * data-parallel over users (the 100 TB part); the transition MATRIX is
  * tiny (|channels| ≤ ~15), so absorption algebra runs on the driver —
  * exactly the reference's shape, with the O(n)-over-events half moved
  * onto Spark.
  *
  * Channel conventions (mirrors markov_engine.py:161-185):
  * START → c1 → c2 → … → CONV (user converted) | NULL (user did not).
  * A user's path is their event-type sequence ordered by (ts, event_id)
  * up to but excluding the first conversion event.
  */
object Attribution {

  val Start = "START"
  val Conv = "CONV"
  val Null = "NULL"

  /** Per-user ordered channel paths: (user_id, path: array<string>,
    * converted: boolean). Conversion events terminate the path and are
    * not themselves channels. One shuffle (the window by user). */
  def userPaths(events: DataFrame, convType: String = "purchase"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val withRn = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
    val firstConv = withRn
      .where(col("event_type") === convType)
      .groupBy("user_id")
      .agg(min("rn").as("conv_rn"))
    withRn
      .join(firstConv, Seq("user_id"), "left")
      .groupBy("user_id")
      .agg(
        // conditional collect (collect_list drops nulls) so users whose
        // FIRST event converts still get a row — their path is empty
        // and their only transition is START→CONV. struct sort keeps
        // the path in event order after collect_list's nondeterministic
        // gather.
        transform(
          sort_array(collect_list(
            when(col("conv_rn").isNull || col("rn") < col("conv_rn"), struct(col("rn"), col("event_type")))
          )),
          s => s.getField("event_type")
        ).as("path"),
        max(col("conv_rn").isNotNull).as("converted")
      )
  }

  /** Distributed Markov transition counts over START+path+terminal
    * (reference: markov_engine.py:161-185). Output: (src, dst, n). */
  def transitionCounts(events: DataFrame, convType: String = "purchase"): DataFrame = {
    val paths = userPaths(events, convType)
    val full = paths.select(
      concat(
        array(lit(Start)),
        col("path"),
        array(when(col("converted"), lit(Conv)).otherwise(lit(Null)))
      ).as("p")
    )
    // consecutive-pair explode: zip path with its own tail
    full
      .select(explode(zip_with(
        slice(col("p"), lit(1), size(col("p")) - 1),
        slice(col("p"), lit(2), size(col("p")) - 1),
        (a, b) => struct(a.as("src"), b.as("dst"))
      )).as("t"))
      .groupBy(col("t.src").as("src"), col("t.dst").as("dst"))
      .agg(count(lit(1)).as("n"))
  }

  /** Row-stochastic transition probabilities, fully distributed — the
    * normalize step of [[chainFromCounts]] as a DataFrame (q46), so the
    * driver-local chain algebra's input matrix is itself cross-engine
    * verified. out_total is an exact Long sum per src; each p is ONE
    * correctly-rounded IEEE division of exact Longs, so both engines
    * land bit-identical (reference: markov_engine.py:187-234).
    * Output: (src, dst, n, out_total, p). */
  def transitionProbabilities(events: DataFrame, convType: String = "purchase"): DataFrame =
    transitionCounts(events, convType)
      .withColumn("out_total", sum(col("n")).over(Window.partitionBy("src")))
      .withColumn("p", col("n").cast("double") / col("out_total").cast("double"))

  /** Horizon-bounded absorption probabilities — the cross-engine-
    * verifiable twin of the fundamental-matrix method (q51).
    * absorb_h(i) = P(absorbed in CONV within `horizon` steps | at i),
    * computed by the fixed-point recursion x_{t+1} = pc + Q·x_t from
    * x_0 = 0 — the truncated Neumann series Σ_{t<h} Q^t·pc whose limit
    * is [[conversionProbability]]'s (I−Q)^{-1}·pc. The horizon is part
    * of the operator's SEMANTICS ("converts within h touches"), which
    * is what makes it oracle-able: Gaussian elimination has a
    * data-dependent pivot order no independent engine replays, but a
    * fixed iteration with ORDER-FIXED fp folds (ascending-channel
    * accumulation seeded at pc, the q35 Lloyd discipline) is
    * bit-reproducible — every q entry is one IEEE division of the
    * distributed transition Longs, every step the same fold. The
    * distributed half is [[transitionProbabilities]] (one events scan);
    * the k×k iteration is driver-local over ≤ ~15 channels, the same
    * bounded-reduction split as the reference (markov_engine.py:236-264).
    * Output: (channel, horizon, absorb_h, p_start, contrib) with
    * contrib = p_start·absorb_h (one multiply). */
  def absorptionHorizonDF(events: DataFrame, horizon: Int = 48, convType: String = "purchase"): DataFrame = {
    require(horizon >= 1, "horizon >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val tp = transitionProbabilities(events, convType)
      .select("src", "dst", "p").as[(String, String, Double)].collect()
    val channels = tp.flatMap(r => Seq(r._1, r._2))
      .filter(s => s != Start && s != Conv && s != Null).distinct.sorted.toVector
    val idx = channels.zipWithIndex.toMap
    val k = channels.size
    val q = Array.ofDim[Double](k, k)
    val pc = new Array[Double](k)
    val ps = new Array[Double](k)
    tp.foreach {
      case (s, d, p) if idx.contains(s) && idx.contains(d) => q(idx(s))(idx(d)) = p
      case (s, Conv, p) if idx.contains(s) => pc(idx(s)) = p
      case (Start, d, p) if idx.contains(d) => ps(idx(d)) = p
      case _ => () // START→CONV/NULL, channel→NULL: not part of Q/pc/ps
    }
    var x = Array.fill(k)(0.0)
    for (_ <- 1 to horizon) {
      val nx = Array.tabulate(k) { i =>
        // fold seeded at pc(i), then ascending j; q=0 terms add +0.0,
        // so a sparse replay visiting only stored transitions in the
        // same order lands on the identical partial sums
        var s = pc(i)
        var j = 0
        while (j < k) { s += q(i)(j) * x(j); j += 1 }
        s
      }
      x = nx
    }
    channels.zipWithIndex.map { case (ch, i) => (ch, horizon, x(i), ps(i), ps(i) * x(i)) }
      .toDF("channel", "horizon", "absorb_h", "p_start", "contrib")
  }

  /** Path-based removal effects, fully distributed and SQL-expressible
    * (the absorption-based variant below is the matrix analog):
    * removal_effect(c) = P(conv lost if channel c removed)
    *                   = (#converting users whose path contains c) / #converting users.
    * Output: (channel, n_conv_with, total_conv, removal_effect). */
  def removalEffectsPathBased(events: DataFrame, convType: String = "purchase"): DataFrame = {
    val paths = userPaths(events, convType).where(col("converted"))
    val total = paths.agg(count(lit(1)).as("total_conv"))
    paths
      .select(explode(array_distinct(col("path"))).as("channel"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_conv_with"))
      .crossJoin(total)
      .select(
        col("channel"),
        col("n_conv_with"),
        col("total_conv"),
        round(col("n_conv_with").cast("double") / col("total_conv"), 6).as("removal_effect")
      )
  }

  // ------------------------------------------------------------------
  // Driver-side matrix algebra (|channels| tiny — same split as the
  // reference: counts distributed, algebra local).
  // ------------------------------------------------------------------

  /** First-order Markov chain from transition counts. Channels are the
    * transient states; CONV/NULL absorb. */
  final case class Chain(channels: Vector[String], p: Array[Array[Double]], pConv: Array[Double], pNull: Array[Double], pStart: Array[Double], startToConv: Double)

  /** Build the row-stochastic chain (reference: markov_engine.py:187-234).
    * `counts`: rows (src, dst, n) incl. START/CONV/NULL. */
  def chainFromCounts(counts: Seq[(String, String, Long)]): Chain = {
    val channels = counts
      .flatMap(c => Seq(c._1, c._2))
      .filter(s => s != Start && s != Conv && s != Null)
      .distinct.sorted.toVector
    val idx = channels.zipWithIndex.toMap
    val k = channels.size
    val outTotals = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum.toDouble).toMap

    def prob(src: String, dst: String): Double = {
      val tot = outTotals.getOrElse(src, 0.0)
      if (tot == 0) 0.0
      else counts.collect { case (s, d, n) if s == src && d == dst => n.toDouble }.sum / tot
    }

    val p = Array.tabulate(k, k)((i, j) => prob(channels(i), channels(j)))
    val pc = Array.tabulate(k)(i => prob(channels(i), Conv))
    val pn = Array.tabulate(k)(i => prob(channels(i), Null))
    val ps = Array.tabulate(k)(i => prob(Start, channels(i)))
    Chain(channels, p, pc, pn, ps, prob(Start, Conv))
  }

  /** Overall conversion probability via absorption: solve
    * (I − Q) x = R_conv for per-state absorption probs, then weight by
    * START distribution (fundamental-matrix method,
    * reference: markov_engine.py:236-264). Gaussian elimination — the
    * system is ≤ 15×15. */
  def conversionProbability(c: Chain): Double = {
    val k = c.channels.size
    if (k == 0) return c.startToConv
    // A = I - Q, b = pConv
    val a = Array.tabulate(k, k)((i, j) => (if (i == j) 1.0 else 0.0) - c.p(i)(j))
    val b = c.pConv.clone()
    val x = solve(a, b)
    c.startToConv + (0 until k).map(i => c.pStart(i) * x(i)).sum
  }

  /** Removal effect per channel: redirect the channel's transitions to
    * NULL and recompute absorption (reference: markov_engine.py:266-377).
    * Returns channel → 1 − P(conv | channel removed)/P(conv). */
  def removalEffects(c: Chain): Map[String, Double] = {
    val pAll = conversionProbability(c)
    if (pAll <= 0) return c.channels.map(_ -> 0.0).toMap
    c.channels.zipWithIndex.map { case (ch, r) =>
      val k = c.channels.size
      // zero all flow INTO r (it redirects to NULL implicitly: rows no
      // longer sum to 1, the missing mass absorbs into NULL) and all
      // flow OUT of r
      val p2 = Array.tabulate(k, k)((i, j) => if (i == r || j == r) 0.0 else c.p(i)(j))
      val pc2 = Array.tabulate(k)(i => if (i == r) 0.0 else c.pConv(i))
      val ps2 = Array.tabulate(k)(i => if (i == r) 0.0 else c.pStart(i))
      val removed = Chain(c.channels, p2, pc2, c.pNull, ps2, c.startToConv)
      ch -> math.max(0.0, 1.0 - conversionProbability(removed) / pAll)
    }.toMap
  }

  /** Markov attribution: removal effects normalized to shares
    * (markov_engine.py:329-377). */
  def markovAttribution(c: Chain): Map[String, Double] = {
    val re = removalEffects(c)
    val tot = re.values.sum
    if (tot <= 0) re else re.view.mapValues(_ / tot).toMap
  }

  /** Plain Gaussian elimination with partial pivoting (k ≤ ~15). */
  private[graft] def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (col <- 0 until n) {
      var piv = col
      for (r <- col + 1 until n) if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tb = b(col); b(col) = b(piv); b(piv) = tb
      val d = a(col)(col)
      require(math.abs(d) > 1e-12, "singular system (I - Q) — chain has a closed transient loop")
      for (r <- col + 1 until n) {
        val f = a(r)(col) / d
        if (f != 0.0) {
          for (j <- col until n) a(r)(j) -= f * a(col)(j)
          b(r) -= f * b(col)
        }
      }
    }
    val x = new Array[Double](n)
    for (r <- n - 1 to 0 by -1) {
      var s = b(r)
      for (j <- r + 1 until n) s -= a(r)(j) * x(j)
      x(r) = s / a(r)(r)
    }
    x
  }
}
