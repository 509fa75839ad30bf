package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.tools.Lift

/** Attribution-lift metric (person-level vs naive account-level
  * baseline): analytic values on a planted case, then the production
  * pipeline on the fixture must show a significant positive lift —
  * the repo analog of the reference's published "+19-22% lift". */
class LiftSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("analytic planted case: purity accuracy, primary-member baseline, lift and z") {
    import spark.implicits._
    // account X: entity A has 3 docs, entity B has 1 (primary = A).
    // account Y: entity C has 2 docs, entity D has 2 (tie -> larger id D).
    val labels = Seq(
      ("a1", "A"), ("a2", "A"), ("a3", "A"), ("b1", "B"),
      ("c1", "C"), ("c2", "C"), ("d1", "D"), ("d2", "D")
    ).toDF("doc_id", "entity_id")
    val account = when(col("entity_id").isin("A", "B"), "X").otherwise("Y")

    // perfect clustering -> person_acc 1.0
    val perfect = labels.select(col("doc_id"), col("entity_id").as("cluster_id"))
    val r = Lift.compute(perfect, labels, account).head()
    // baseline: X correct 3/4 (A primary), Y correct 2/4 (D primary) -> 5/8
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 5.0 / 8.0)
    assert(math.abs(r.getDouble(3) - (1.0 - 5.0 / 8.0) / (5.0 / 8.0)) < 1e-12)
    // z with p1=1 (zero variance): (1 - .625)/sqrt(.625*.375/8) = 2.19 -> significant
    assert(r.getBoolean(5))

    // an impure cluster: c1 joins the A-cluster -> majority stays A,
    // c1 becomes wrong; person_acc = 7/8
    val impure = perfect.withColumn("cluster_id",
      when(col("doc_id") === "c1", "A").otherwise(col("cluster_id")))
    val r2 = Lift.compute(impure, labels, account).head()
    assert(r2.getDouble(0) == 7.0 / 8.0)

    // degenerate: everything in ONE cluster -> majority entity covers
    // only its own docs; person_acc = 3/8 (A's docs), no positive lift
    val collapsed = labels.select(col("doc_id"), lit("k").as("cluster_id"))
    val r3 = Lift.compute(collapsed, labels, account).head()
    assert(r3.getDouble(0) == 3.0 / 8.0)
    assert(r3.getDouble(3) < 0)
  }

  test("fairness: per-group accuracy and disparate-impact ratio are exact on a planted case") {
    import spark.implicits._
    // group G1: 4 docs all correct; group G2: 4 docs, 2 correct -> DI = 0.5
    val labels = Seq(
      ("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B"),   // G1
      ("c1", "C"), ("c2", "C"), ("d1", "D"), ("d2", "D")    // G2
    ).toDF("doc_id", "entity_id")
    val group = when(col("entity_id").isin("A", "B"), "G1").otherwise("G2")
    // C and D merged into one cluster -> majority is D (tie-break), C's 2 docs wrong
    val assigned = labels.select(col("doc_id"),
      when(col("entity_id").isin("C", "D"), "CD").otherwise(col("entity_id")).as("cluster_id"))
    val rows = Lift.fairness(assigned, labels, group).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows("G1") == ((4L, 1.0, 0.5)))
    assert(rows("G2") == ((4L, 0.5, 0.5)))
  }

  test("cohortLabels: volume terciles from distributed percentile cutoffs") {
    import spark.implicits._
    // entities with 1, 2 and 10 docs -> low / mid / high
    val labels = (Seq(("x1", "X")) ++ Seq(("y1", "Y"), ("y2", "Y")) ++
      (1 to 10).map(i => (s"z$i", "Z"))).toDF("doc_id", "entity_id")
    val c = Lift.cohortLabels(labels).select("entity_id", "cohort").distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(c == Map("X" -> "low", "Y" -> "mid", "Z" -> "high"))
  }

  test("fixture + production pipeline: significant positive lift over the account baseline") {
    val cfg = graft.schema.Fixture.scales("t1")
    val docs = graft.schema.Fixture.docs(spark, cfg).toDF().cache()
    val labels = graft.schema.Fixture.labels(spark, cfg).toDF().cache()
    val cand = graft.blocking.Blocking.candidates(docs, graft.blocking.Blocking.Cfg())
    val scored = graft.scoring.Scoring.score(cand, docs)
    val edges = scored.where(col("is_match")).select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val cc = graft.cluster.ConnectedComponents.run(edges, docs.select("doc_id"))
    val att = graft.cluster.Attach.attachSingletons(cc.assignments.localCheckpoint(true), scored)

    val r = Lift.compute(att.select("doc_id", "cluster_id"), labels, Lift.fixtureAccount).head()
    val (personAcc, accountAcc, lift, significant) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(3), r.getBoolean(5))
    info(f"person_acc=$personAcc%.4f account_acc=$accountAcc%.4f lift=$lift%.4f sig=$significant")
    // purity accuracy is harsher than pairwise F1: a merged household
    // pair makes every minority-member doc wrong at once (F1 0.99 and
    // purity 0.92 coexist honestly; the reference's own person-level
    // accuracy is 0.78-0.81, STRESS_TEST_REPORT.md:139-143)
    assert(personAcc > 0.85, s"pipeline person accuracy degraded: $personAcc")
    assert(accountAcc < 0.9, "account baseline suspiciously high — account grain broken?")
    assert(lift > 0.1 && significant,
      f"lift not significant: person=$personAcc%.4f account=$accountAcc%.4f lift=$lift%.4f")

    // fairness across volume cohorts: every cohort resolvable, no
    // cohort silently abandoned (DI floor is a tripwire, not a target)
    val fair = Lift.fairness(att.select("doc_id", "cluster_id"),
      Lift.cohortLabels(labels), col("cohort")).collect()
    val di = fair.head.getDouble(3)
    fair.foreach(r => info(f"cohort=${r.getString(0)} n=${r.getLong(1)} acc=${r.getDouble(2)}%.4f"))
    info(f"disparate_impact=$di%.4f")
    assert(fair.length == 3 && di > 0.5, f"cohort accuracy collapsed: DI=$di%.4f")
  }
}
