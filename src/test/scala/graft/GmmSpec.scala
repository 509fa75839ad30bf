package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cluster.{Gmm, KMeans}
import graft.pipeline.ModelRegistry

class GmmSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def blob(cx: Double, cy: Double, n: Int, seed: Long, sd: Double = 0.2): Seq[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Seq.fill(n)(Array(cx + rng.nextGaussian() * sd, cy + rng.nextGaussian() * sd))
  }

  test("EM log-likelihood is finite and variances stay positive (PSD axiom)") {
    val pts = (blob(0, 0, 40, 1) ++ blob(6, 6, 40, 2)).toArray
    val m = Gmm.fit(pts, 2)
    assert(!m.logLik.isNaN && !m.logLik.isInfinity)
    assert(m.variances.flatten.forall(_ > 0), "diagonal covariances must stay positive")
    assert(math.abs(m.weights.sum - 1.0) < 1e-9)
  }

  test("BIC selects k=2 on two separated blobs, k=1 on one blob") {
    val two = (blob(0, 0, 50, 3) ++ blob(8, 8, 50, 4)).toArray
    assert(Gmm.selectBIC(two).k == 2)
    val one = blob(3, 3, 60, 5).toArray
    assert(Gmm.selectBIC(one).k == 1)
  }

  test("responsibilities are confident on separated data and sum to 1") {
    val pts = (blob(0, 0, 40, 6) ++ blob(9, 9, 40, 7)).toArray
    val m = Gmm.fit(pts, 2)
    val r0 = Gmm.responsibilities(m, Array(0.0, 0.0))
    val r1 = Gmm.responsibilities(m, Array(9.0, 9.0))
    assert(math.abs(r0.sum - 1.0) < 1e-9 && math.abs(r1.sum - 1.0) < 1e-9)
    assert(r0.max > 0.99 && r1.max > 0.99)
    assert(r0.indexOf(r0.max) != r1.indexOf(r1.max))
  }

  test("more components never worsen raw log-likelihood; BIC penalizes them") {
    val pts = blob(2, 2, 60, 8).toArray
    val m1 = Gmm.fit(pts, 1)
    val m2 = Gmm.fit(pts, 2)
    assert(m2.logLik >= m1.logLik - 1e-6, "extra component cannot lower max log-lik")
    assert(m1.bic <= m2.bic, "BIC must prefer the simpler model on one blob")
  }

  test("clusterGroups: per-group BIC fits, deterministic under repartition") {
    import spark.implicits._
    val rows =
      (blob(0, 0, 30, 9) ++ blob(7, 7, 30, 10)).zipWithIndex.map { case (f, i) =>
        KMeans.GroupedPoint("g1", f"i$i%03d", f)
      } ++ blob(3, 3, 60, 11).zipWithIndex.map { case (f, i) =>
        // 60 points: BIC's ln(n) penalty needs enough samples to beat
        // chance splits of a single blob (same n as the standalone test)
        KMeans.GroupedPoint("g2", f"i$i%03d", f)
      }
    val ds = rows.toDS()
    val out = KMeans.clusterGroups(ds).collect() // warm path shared
    val g = graft.cluster.Gmm.clusterGroups(ds).collect().groupBy(_.group_id)
    assert(g("g1").head.k == 2 && g("g2").head.k == 1)
    val again = graft.cluster.Gmm.clusterGroups(ds.repartition(5)).collect()
      .map(a => (a.group_id, a.item_id, a.cluster)).sortBy(_.toString).toSeq
    assert(again == g.values.flatten.map(a => (a.group_id, a.item_id, a.cluster)).toSeq.sortBy(_.toString))
  }

  test("model registry: Brier gate skips a degraded snapshot, accepts a recovered one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_registry").toString
    def snap(id: String, brier: Double, seq: Long) =
      ModelRegistry.Snapshot(id, "clusters", brier, s"/models/$id", seq)
    ModelRegistry.record(spark, dir, snap("s1", 0.10, 1))
    ModelRegistry.record(spark, dir, snap("s2", 0.30, 2)) // degraded > 0.15 worse
    assert(ModelRegistry.active(spark, dir, "clusters").map(_.snapshot_id).contains("s1"))
    ModelRegistry.record(spark, dir, snap("s3", 0.12, 3)) // recovered
    assert(ModelRegistry.active(spark, dir, "clusters").map(_.snapshot_id).contains("s3"))
    assert(ModelRegistry.active(spark, dir, "missing").isEmpty)
  }
}
