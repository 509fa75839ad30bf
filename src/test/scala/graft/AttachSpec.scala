package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cluster.Attach

class AttachSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def df(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "cluster_id")
  }

  // scored-pair row: (doc_a, doc_b, score, mask_a, mask_b)
  private def scoredDF(rows: Seq[(String, String, Double, Long, Long)]) = {
    import spark.implicits._
    rows.map { case (a, b, s, ma, mb) => (a, b, s, 0.0, 0.0, 0.0, 0L, ma, mb, s >= 6.5) }
      .toDF("doc_a", "doc_b", "score", "jw_best", "lev_best", "media_jaccard", "strong_min", "mask_a", "mask_b", "is_match")
  }

  test("singleton with two distinct matched spans across a cluster attaches; one-span (contamination) does not") {
    val clusters = df(Seq(
      ("a1", "a1"), ("a2", "a1"), ("a3", "a1"), // cluster a1
      ("s1", "s1"),                              // singleton, genuinely of a1
      ("c1", "c1")                               // contaminated singleton
    ))
    val scored = scoredDF(Seq(
      // s1: span 0 matches a1, span 1 matches a2 -> union mask 0b11
      ("a1", "s1", 3.0, 1L, 1L),
      ("a2", "s1", 3.0, 1L, 2L),
      // c1: its single borrowed span (bit 0) matches two members
      ("a1", "c1", 3.0, 1L, 1L),
      ("a3", "c1", 3.0, 1L, 1L)
    ))
    val out = Attach.attachSingletons(clusters, scored)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("s1") == "a1", s"s1 should attach: $out")
    assert(out("c1") == "c1", s"c1 must stay singleton: $out")
  }

  test("attached smaller id re-canonicalizes the cluster label; resume-stable") {
    val clusters = df(Seq(("b5", "b5"), ("b6", "b5"), ("a0", "a0")))
    val scored = scoredDF(Seq(
      ("a0", "b5", 3.0, 3L, 1L), // a0 spans 0+1 match b5
      ("a0", "b6", 3.0, 1L, 1L)
    ))
    val out = Attach.attachSingletons(clusters, scored)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a0" -> "a0", "b5" -> "a0", "b6" -> "a0"))
  }

  test("mutually-supported singleton pair merges (no swap-and-restore)") {
    // u and v each pick the other's singleton cluster as best target;
    // naive move+relabel would swap ids and restore two singletons
    val clusters = df(Seq(("u1", "u1"), ("v2", "v2")))
    val scored = scoredDF(Seq(("u1", "v2", 3.0, 3L, 3L)))
    val out = Attach.attachSingletons(clusters, scored)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("u1" -> "u1", "v2" -> "u1"), s"mutual pair must merge: $out")
  }

  test("chained singleton moves resolve transitively") {
    // a→b's cluster, b→c's cluster (c in a real cluster): all end up together
    val clusters = df(Seq(("a1", "a1"), ("b2", "b2"), ("c3", "c3"), ("c4", "c3")))
    val scored = scoredDF(Seq(
      ("a1", "b2", 3.0, 3L, 3L),
      ("b2", "c3", 4.0, 3L, 3L)
    ))
    val out = Attach.attachSingletons(clusters, scored)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.values.toSet.size == 1 && out.values.head == "a1",
      s"chain must merge into one cluster labeled by min member: $out")
  }

  test("no eligible evidence leaves clustering unchanged") {
    val clusters = df(Seq(("x1", "x1"), ("x2", "x2")))
    val scored = scoredDF(Seq(("x1", "x2", 1.0, 3L, 3L))) // below attach floor
    val out = Attach.attachSingletons(clusters, scored)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("x1" -> "x1", "x2" -> "x2"))
  }
}
