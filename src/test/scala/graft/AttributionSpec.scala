package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.attribution.{Attribution, Shapley, Uncertainty}

class AttributionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  // events: (event_id, ts, user_id, event_type)
  private def eventsDF(rows: Seq[(Long, String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  test("userPaths: truncation at first conversion, empty-path converters, non-converters") {
    val ev = eventsDF(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click"),
      (2L, "2024-01-01 10:01:00", 1L, "view"),
      (3L, "2024-01-01 10:02:00", 1L, "purchase"),
      (4L, "2024-01-01 10:03:00", 1L, "click"), // after conversion: ignored
      (5L, "2024-01-01 11:00:00", 2L, "purchase"), // converts immediately
      (6L, "2024-01-01 12:00:00", 3L, "view") // never converts
    ))
    val out = Attribution.userPaths(ev).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((Seq("click", "view"), true)))
    assert(out(2L) == ((Seq(), true)))
    assert(out(3L) == ((Seq("view"), false)))
  }

  test("transitionCounts matches hand-computed counts incl. START->CONV") {
    val ev = eventsDF(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click"),
      (2L, "2024-01-01 10:01:00", 1L, "purchase"),
      (3L, "2024-01-01 11:00:00", 2L, "purchase"),
      (4L, "2024-01-01 12:00:00", 3L, "click"),
      (5L, "2024-01-01 12:01:00", 3L, "click")
    ))
    val out = Attribution.transitionCounts(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("START", "click") -> 2L,
      ("click", "CONV") -> 1L,
      ("START", "CONV") -> 1L,
      ("click", "click") -> 1L,
      ("click", "NULL") -> 1L
    ))
  }

  test("conversionProbability: analytic single-channel chain") {
    // START -> A always; A -> CONV 0.5 / NULL 0.5  =>  P(conv) = 0.5
    val chain = Attribution.chainFromCounts(Seq(
      ("START", "A", 10L), ("A", "CONV", 5L), ("A", "NULL", 5L)
    ))
    assert(math.abs(Attribution.conversionProbability(chain) - 0.5) < 1e-12)
  }

  test("conversionProbability: chain with a loop (A -> A) solves absorption") {
    // A: 0.5 self-loop, 0.25 CONV, 0.25 NULL => absorption P = 0.25/(1-0.5) = 0.5
    val chain = Attribution.chainFromCounts(Seq(
      ("START", "A", 8L), ("A", "A", 4L), ("A", "CONV", 2L), ("A", "NULL", 2L)
    ))
    assert(math.abs(Attribution.conversionProbability(chain) - 0.5) < 1e-12)
  }

  test("removalEffects: removing the only path to conversion has effect 1") {
    val chain = Attribution.chainFromCounts(Seq(
      ("START", "A", 10L), ("A", "B", 10L), ("B", "CONV", 5L), ("B", "NULL", 5L)
    ))
    val re = Attribution.removalEffects(chain)
    assert(math.abs(re("A") - 1.0) < 1e-12 && math.abs(re("B") - 1.0) < 1e-12)
    val shares = Attribution.markovAttribution(chain)
    assert(math.abs(shares.values.sum - 1.0) < 1e-9)
  }

  test("removalEffects: bypassed channel has smaller effect") {
    // START -> A -> CONV and START -> CONV directly: removing A loses
    // only the A-routed conversions
    val chain = Attribution.chainFromCounts(Seq(
      ("START", "A", 5L), ("START", "CONV", 5L), ("A", "CONV", 5L)
    ))
    val re = Attribution.removalEffects(chain)
    assert(re("A") > 0.49 && re("A") < 0.51, s"A routed half the conversions: $re")
  }

  test("solve: known 2x2 system") {
    val x = Attribution.solve(Array(Array(2.0, 1.0), Array(1.0, 3.0)), Array(5.0, 10.0))
    assert(math.abs(x(0) - 1.0) < 1e-12 && math.abs(x(1) - 3.0) < 1e-12)
  }

  test("Shapley exact: efficiency and symmetry axioms") {
    // A and B perfectly symmetric; C carries the rest
    val g = Shapley.game(Seq(
      (Seq("A"), 10L), (Seq("B"), 10L), (Seq("A", "B"), 20L), (Seq("C"), 40L)
    ))
    val phi = Shapley.exact(g)
    assert(math.abs(phi.values.sum - 1.0) < 1e-9, s"efficiency: $phi") // v(full)=1
    assert(math.abs(phi("A") - phi("B")) < 1e-9, s"symmetry: $phi")
    assert(phi("C") > phi("A"), s"C carries more value: $phi")
  }

  test("Shapley exactScaledDF: integer phi_num / (n!·total) == double-domain exact()") {
    // end-to-end from events (incl. an empty-path converter and a
    // non-converter) so the distributed coalition counting is in the
    // loop, not just the local sweep
    val ev = eventsDF(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click"),
      (2L, "2024-01-01 10:01:00", 1L, "view"),
      (3L, "2024-01-01 10:02:00", 1L, "purchase"),
      (4L, "2024-01-01 11:00:00", 2L, "purchase"), // empty path, converts
      (5L, "2024-01-01 12:00:00", 3L, "view"), // never converts
      (6L, "2024-01-01 13:00:00", 4L, "view"),
      (7L, "2024-01-01 13:01:00", 4L, "purchase"),
      (8L, "2024-01-01 14:00:00", 5L, "signup"),
      (9L, "2024-01-01 14:01:00", 5L, "click"),
      (10L, "2024-01-01 14:02:00", 5L, "purchase")
    ))
    val scaled = Shapley.exactScaledDF(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = scaled.head._2.toInt
    val total = scaled.head._3
    assert(n == 3 && total == 4L) // channels {click,view,signup}; 4 converters
    val fact = (1 to n).foldLeft(1L)(_ * _)
    import spark.implicits._
    val coalitions = Shapley.coalitionCounts(ev).as[(Seq[String], Long)].collect().toSeq
    val phi = Shapley.exact(Shapley.game(coalitions))
    scaled.foreach { case (ch, _, _, num) =>
      assert(math.abs(num.toDouble / (fact * total) - phi(ch)) < 1e-12, s"$ch: $num vs ${phi(ch)}")
    }
    // efficiency in the integer domain: Σ phi_num = n!·(vraw(full) − vraw(∅))·? —
    // with v normalized it's n!·total·(v(full)−v(∅)) = n!·(total − empty-path count)
    assert(scaled.map(_._4).sum == fact * (total - 1), "integer efficiency (one empty-path converter)")
  }

  test("Shapley monteCarloDetDF: deterministic, integer-efficient, converges to exact") {
    val ev = eventsDF(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click"),
      (2L, "2024-01-01 10:01:00", 1L, "view"),
      (3L, "2024-01-01 10:02:00", 1L, "purchase"),
      (4L, "2024-01-01 11:00:00", 2L, "purchase"), // empty path, converts
      (5L, "2024-01-01 12:00:00", 3L, "view"), // never converts
      (6L, "2024-01-01 13:00:00", 4L, "view"),
      (7L, "2024-01-01 13:01:00", 4L, "purchase"),
      (8L, "2024-01-01 14:00:00", 5L, "signup"),
      (9L, "2024-01-01 14:01:00", 5L, "click"),
      (10L, "2024-01-01 14:02:00", 5L, "purchase")
    ))
    val s = 512
    val rows = Shapley.monteCarloDetDF(ev, samples = s).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val total = rows.head._3
    assert(rows.map(_._1).toSeq == Seq("click", "signup", "view") && total == 4L)
    // integer efficiency: Σ mc_num = samples·(v(full) − v(∅));
    // one empty-path converter ⇒ v(∅) = 1
    assert(rows.map(_._4).sum == s.toLong * (total - 1), s"integer efficiency: $rows")
    // bit-stable across invocations (the cross-engine q48 contract)
    val again = Shapley.monteCarloDetDF(ev, samples = s).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(rows.toSeq == again.toSeq, "determinism")
    // MC estimate converges on the exact values (n=3 ⇒ only 6
    // permutations; 512 md5-shuffled samples cover them near-uniformly)
    import spark.implicits._
    val phi = Shapley.exact(Shapley.game(
      Shapley.coalitionCounts(ev).as[(Seq[String], Long)].collect().toSeq))
    rows.foreach { case (ch, _, _, num) =>
      val est = num.toDouble / (s.toDouble * total)
      assert(math.abs(est - phi(ch)) < 0.05, s"$ch: mc=$est exact=${phi(ch)}")
    }
  }

  test("Shapley Monte Carlo approximates exact within 3 SE + tolerance") {
    val g = Shapley.game(Seq(
      (Seq("A"), 10L), (Seq("B"), 5L), (Seq("A", "C"), 15L), (Seq("B", "C"), 10L)
    ))
    val exact = Shapley.exact(g)
    val mc = Shapley.monteCarlo(spark, g, samples = 2000)
    exact.foreach { case (ch, v) =>
      val (m, se) = mc(ch)
      assert(math.abs(m - v) < 3 * se + 0.02, s"$ch: mc=$m exact=$v se=$se")
    }
  }

  test("hybrid blend conserves value and interpolates") {
    val markov = Map("A" -> 0.7, "B" -> 0.3)
    val shap = Map("A" -> 0.5, "B" -> 0.5)
    val h = Shapley.hybrid(markov, shap, 0.5)
    assert(math.abs(h.values.sum - 1.0) < 1e-12)
    assert(h("A") > 0.5 && h("A") < 0.7)
    assert(Shapley.hybrid(markov, shap, 1.0) == markov)
  }

  test("bootstrap bands bracket the point estimate; alpha sweep envelope is sane") {
    val counts = Seq(
      ("START", "A", 50L), ("START", "B", 50L),
      ("A", "CONV", 30L), ("A", "NULL", 20L),
      ("B", "CONV", 10L), ("B", "NULL", 40L)
    )
    val point = Attribution.markovAttribution(Attribution.chainFromCounts(counts))
    val bands = Uncertainty.bootstrapMarkov(spark, counts, b = 50).map(b => b.channel -> b).toMap
    point.foreach { case (ch, v) =>
      val b = bands(ch)
      assert(b.lo <= v + 0.05 && b.hi >= v - 0.05, s"$ch: point $v outside [${b.lo}, ${b.hi}]")
      assert(b.lo <= b.hi)
    }
    val sweep = Uncertainty.alphaSweep(point, Map("A" -> 0.5, "B" -> 0.5))
    sweep.foreach(b => assert(b.lo <= b.mean && b.mean <= b.hi))
  }

  test("Dirichlet perturbation: bands bracket the point estimate and tighten with concentration") {
    val counts = Seq(
      ("START", "A", 50L), ("START", "B", 50L),
      ("A", "CONV", 30L), ("A", "NULL", 20L),
      ("B", "CONV", 10L), ("B", "NULL", 40L)
    )
    val point = Attribution.markovAttribution(Attribution.chainFromCounts(counts))
    val loose = Uncertainty.dirichletMarkov(spark, counts, b = 80, concentration = 1.0)
      .map(b => b.channel -> b).toMap
    val tight = Uncertainty.dirichletMarkov(spark, counts, b = 80, concentration = 50.0)
      .map(b => b.channel -> b).toMap
    point.foreach { case (ch, v) =>
      val l = loose(ch); val t = tight(ch)
      assert(l.lo <= v + 0.05 && l.hi >= v - 0.05, s"$ch: point $v outside loose [${l.lo}, ${l.hi}]")
      assert(t.lo <= v + 0.05 && t.hi >= v - 0.05, s"$ch: point $v outside tight [${t.lo}, ${t.hi}]")
      assert(t.hi - t.lo < l.hi - l.lo + 1e-9,
        s"$ch: concentration 50 band [${t.lo},${t.hi}] not tighter than 1.0 band [${l.lo},${l.hi}]")
    }
  }

  private def hybridFixture = eventsDF(Seq(
    (1L, "2024-01-01 10:00:00", 1L, "click"),
    (2L, "2024-01-01 10:01:00", 1L, "view"),
    (3L, "2024-01-01 10:02:00", 1L, "purchase"),
    (4L, "2024-01-01 11:00:00", 2L, "purchase"), // empty path, converts
    (5L, "2024-01-01 12:00:00", 3L, "view"), // never converts
    (6L, "2024-01-01 13:00:00", 4L, "view"),
    (7L, "2024-01-01 13:01:00", 4L, "purchase"),
    (8L, "2024-01-01 14:00:00", 5L, "signup"),
    (9L, "2024-01-01 14:01:00", 5L, "click"),
    (10L, "2024-01-01 14:02:00", 5L, "purchase")
  ))

  test("hybridScaledDF: EXACT conservation, double-path agreement, pure-arm degeneration") {
    val ev = hybridFixture
    val rows = Shapley.hybridScaledDF(ev, alphaNum = 2L, alphaDen = 5L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getDouble(7))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("click", "signup", "view"))
    // value conservation in the INTEGER domain: Σ hybrid_num == hybrid_den
    val hden = rows.head._7
    assert(rows.map(_._6).sum == hden, s"exact conservation: $rows")
    assert(rows.forall(_._7 == hden), "hybrid_den constant across channels")
    // each share is m_num/M and phi_num/S blended at α = 2/5 — agree
    // with the double-domain hybrid() on the same normalized arms
    val markov = rows.map(r => r._1 -> r._2.toDouble / r._3).toMap
    val shap = rows.map(r => r._1 -> r._4.toDouble / r._5).toMap
    val blended = Shapley.hybrid(markov, shap, 0.4)
    rows.foreach { case (ch, _, _, _, _, _, _, share) =>
      assert(math.abs(share - blended(ch)) < 1e-12, s"$ch: $share vs ${blended(ch)}")
    }
    // α = 1 degenerates to the pure Markov arm, α = 0 to pure Shapley
    Shapley.hybridScaledDF(ev, alphaNum = 1L, alphaDen = 1L).collect().foreach { r =>
      assert(math.abs(r.getDouble(7) - markov(r.getString(0))) < 1e-15, "pure markov arm")
    }
    Shapley.hybridScaledDF(ev, alphaNum = 0L, alphaDen = 1L).collect().foreach { r =>
      assert(math.abs(r.getDouble(7) - shap(r.getString(0))) < 1e-15, "pure shapley arm")
    }
  }

  test("bootstrapRemovalDF: deterministic, ordered bands, complete replicate grid") {
    val ev = hybridFixture
    val out = Uncertainty.bootstrapRemovalDF(ev, reps = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("click", "signup", "view"))
    out.foreach { case (ch, n, lo, med, hi) =>
      assert(n == 64L, s"$ch: complete (r, channel) grid")
      assert(lo <= med && med <= hi, s"$ch: bands ordered ($lo, $med, $hi)")
      assert(lo >= 0.0 && hi <= 1.0, s"$ch: removal effects are shares")
    }
    // bit-stable across invocations (the cross-engine q50 contract)
    val again = Uncertainty.bootstrapRemovalDF(ev, reps = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(out.toSeq == again.toSeq, "determinism")
    // the median band brackets the unweighted point estimate loosely
    // (4 converters ⇒ wide bands; the invariant is bracketing, not width)
    val point = Attribution.removalEffectsPathBased(ev).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    out.foreach { case (ch, _, lo, _, hi) =>
      assert(lo <= point(ch) + 0.3 && hi >= point(ch) - 0.3, s"$ch: point ${point(ch)} vs [$lo,$hi]")
    }
    // degenerate single replicate: all three ranks read the same row
    val one = Uncertainty.bootstrapRemovalDF(ev, reps = 1, loRank = 1, medRank = 1, hiRank = 1)
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    one.foreach { case (lo, med, hi) => assert(lo == med && med == hi) }
  }

  test("absorptionHorizonDF: converges to the fundamental-matrix solve, monotone in horizon") {
    val ev = hybridFixture
    val out = Attribution.absorptionHorizonDF(ev, horizon = 48).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("click", "signup", "view"))
    // the truncated Neumann series converges on the Gaussian-elimination
    // absorption probabilities (every user here converts quickly, so 48
    // steps is deep convergence)
    import spark.implicits._
    val counts = Attribution.transitionCounts(ev).as[(String, String, Long)].collect().toSeq
    val chain = Attribution.chainFromCounts(counts)
    val exact = Attribution.solve(
      Array.tabulate(chain.channels.size, chain.channels.size)((i, j) =>
        (if (i == j) 1.0 else 0.0) - chain.p(i)(j)),
      chain.pConv.clone())
    out.foreach { case (ch, h, x, ps, contrib) =>
      assert(h == 48)
      val i = chain.channels.indexOf(ch)
      assert(math.abs(x - exact(i)) < 1e-9, s"$ch: horizon-48 $x vs solve ${exact(i)}")
      assert(math.abs(ps - chain.pStart(i)) < 1e-15)
      assert(contrib == ps * x)
      assert(x >= 0.0 && x <= 1.0 + 1e-12)
    }
    // monotone in horizon (more steps can only add absorption mass)
    val h8 = Attribution.absorptionHorizonDF(ev, horizon = 8).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    out.foreach { case (ch, _, x48, _, _) => assert(h8(ch) <= x48 + 1e-15, s"$ch monotone") }
    // bit-stable across invocations (the cross-engine q51 contract)
    val again = Attribution.absorptionHorizonDF(ev, horizon = 48).collect()
      .map(r => (r.getString(0), r.getDouble(2))).sortBy(_._1)
    assert(out.map(t => (t._1, t._3)).toSeq == again.toSeq)
  }

  test("bootstrap skips singular replicates instead of failing the job") {
    // a chain with a rarely-exited transient loop: replicates that zero
    // the C->CONV/NULL outflow make (I - Q) singular
    val fragile = Seq(
      ("START", "C", 40L),
      ("C", "C", 200L), ("C", "CONV", 1L), ("C", "NULL", 1L)
    )
    // must not throw, and bands must still be well-formed
    val bands = Uncertainty.bootstrapMarkov(spark, fragile, b = 60)
    assert(bands.nonEmpty)
    bands.foreach(b => assert(b.lo <= b.hi && !b.mean.isNaN))
  }
}
