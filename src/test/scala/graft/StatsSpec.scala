package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Stats

class StatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val eps = 1e-9

  private def one(c: org.apache.spark.sql.Column): Double = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).head().getDouble(0)
  }

  test("sigmoid") {
    assert(math.abs(one(Stats.sigmoid(lit(0.0))) - 0.5) < eps)
    assert(one(Stats.sigmoid(lit(10.0))) > 0.9999)
    assert(one(Stats.sigmoid(lit(-10.0))) < 0.0001)
  }

  test("cyclical encoding is on the unit circle and 24h-periodic") {
    val (s0, c0) = Stats.cyclical(lit(6.0), 24.0)
    assert(math.abs(one(s0) - 1.0) < eps) // sin(π/2)
    val (s1, c1) = Stats.cyclical(lit(30.0), 24.0) // 30 ≡ 6 (mod 24)
    assert(math.abs(one(s1) - one(s0)) < eps && math.abs(one(c1) - one(c0)) < eps)
  }

  test("normalized entropy: uniform=1, point-mass=0, empty-safe") {
    assert(math.abs(one(Stats.normalizedEntropy(array(lit(1.0), lit(1.0), lit(1.0), lit(1.0)))) - 1.0) < eps)
    assert(one(Stats.normalizedEntropy(array(lit(5.0), lit(0.0), lit(0.0)))) < eps)
    assert(one(Stats.normalizedEntropy(array().cast("array<double>"))) == 0.0)
  }

  test("circular hour distance") {
    assert(one(Stats.circularHourDistance(lit(23), lit(1)).cast("double")) == 2.0)
    assert(one(Stats.circularHourDistance(lit(1), lit(23)).cast("double")) == 2.0)
    assert(one(Stats.circularHourDistance(lit(6), lit(12)).cast("double")) == 6.0)
  }

  test("softmax over negative distances sums to 1 and prefers nearest") {
    import spark.implicits._
    val probs = Seq(1).toDF("x")
      .select(Stats.softmaxNegDistances(array(lit(0.1), lit(2.0), lit(5.0)), tau = 0.5).as("p"))
      .head().getSeq[Double](0)
    assert(math.abs(probs.sum - 1.0) < 1e-9)
    assert(probs(0) > probs(1) && probs(1) > probs(2))
  }

  test("engagement share sums to 1 per group; mean/var agree with oracle") {
    import spark.implicits._
    val df = Seq(("g1", 2.0), ("g1", 6.0), ("g2", 5.0)).toDF("g", "w")
    val shares = df.select(col("g"), Stats.shareOver(col("w"), col("g")).as("s"))
      .groupBy("g").agg(sum("s").as("t")).collect().map(_.getDouble(1))
    assert(shares.forall(t => math.abs(t - 1.0) < eps))
    val mv = df.where(col("g") === "g1").agg(Stats.meanVar(col("w")).head, Stats.meanVar(col("w")).tail: _*).head()
    assert(math.abs(mv.getDouble(0) - 4.0) < eps)
    assert(math.abs(mv.getDouble(1) - 4.0) < eps) // var_pop of {2,6}
  }

  test("KL term: zero-safe and matches closed form") {
    assert(math.abs(one(Stats.klTerm(lit(0.5), lit(0.25))) - 0.5 * math.log(2.0)) < eps)
    assert(one(Stats.klTerm(lit(0.0), lit(0.25))) == 0.0)
    assert(one(Stats.klTerm(lit(0.5), lit(0.0))) == 0.0)
  }
}
