package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{ColdStart, Validation}

class ValidationColdStartSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ev(rows: Seq[(java.lang.Long, String, java.lang.Long, String, java.lang.Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  test("validation: first failing rule names the reason; clean rows pass") {
    val df = ev(Seq(
      (1L, "2024-03-01 10:00:00", 7L, "click", 1.0),            // ok
      (2L, "2024-03-01 10:00:00", null, "click", 1.0),          // missing_user
      (3L, "2024-03-01 10:00:00", 7L, "teleport", 1.0),         // bad_event_type
      (4L, "2024-03-01 10:00:00", 7L, "view", -2.0),            // bad_value
      (5L, "2031-03-01 10:00:00", 7L, "view", 2.0),             // ts_out_of_range
      (6L, "2031-03-01 10:00:00", null, "teleport", -1.0)       // first rule wins: missing_user
    ))
    val m = Validation.rejectMetrics(df, Validation.eventRules())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("ok" -> 1L, "missing_user" -> 2L, "bad_event_type" -> 1L,
      "bad_value" -> 1L, "ts_out_of_range" -> 1L))
    assert(Validation.clean(df, Validation.eventRules()).count() == 1)
  }

  test("cold-start routing tiers and persona cascade") {
    // user 1: 2 events (account_level), mode=click, peak hour 3 -> night_owl
    // user 2: 8 events (heuristic), dominated by purchase -> buyer
    val rows = Seq(
      (1L, "2024-03-01 03:00:00", 1L, "click", 1.0),
      (2L, "2024-03-01 03:30:00", 1L, "click", 1.0)
    ) ++ (0 until 8).map(i => (10L + i, f"2024-03-01 14:0$i%d:00", 2L, "purchase", 1.0))
    val out = ColdStart.route(ev(rows.map { case (a, b, c, d, e) =>
      (java.lang.Long.valueOf(a), b, java.lang.Long.valueOf(c), d, java.lang.Double.valueOf(e))
    })).collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, "account_level", "night_owl")))
    assert(out(2L) == ((8L, "heuristic", "buyer")))
  }

  test("LSH recall gate on planted weak-similarity vectors (nPlanes=2, tables=6)") {
    import spark.implicits._
    // 120 seeded random 16-dim vectors; truth = brute-force pairs at
    // cos >= 0.30; tuned LSH must recover >= 85% of them while pruning
    // at least SOMETHING (candidate_frac < 1)
    val rng = new java.util.Random(7L)
    val vecs = (0 until 120).map { i =>
      (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat))
    }.toDF("id", "vec")
    val truth = graft.ops.Similarity.cosinePairs(vecs, 0.30)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = graft.ops.Similarity
      .lshCosinePairs(vecs, threshold = 0.30, nPlanes = 2, dim = 16, tables = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val recall = (truth intersect found).size.toDouble / truth.size
    assert(recall >= 0.85, s"recall $recall over ${truth.size} true pairs")
    val cand = graft.ops.Similarity
      .lshCosinePairs(vecs, threshold = -1.0, nPlanes = 2, dim = 16, tables = 6).count()
    assert(cand < 120L * 119 / 2, "LSH must prune some pairs")
  }
}
