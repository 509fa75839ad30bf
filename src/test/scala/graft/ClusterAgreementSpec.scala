package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cluster.ClusterAgreement

class ClusterAgreementSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def assignDF(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("id", "ca", "cb")
  }

  private def row(rows: Seq[(Long, String, String)]) =
    ClusterAgreement.agreement(assignDF(rows)).collect().head

  /** Independent brute-force pair counting: rand = fraction of pairs
    * on which the clusterings agree (both-same or both-different);
    * ari from the same counts via the Hubert–Arabie formula. */
  private def bruteForce(labels: Seq[(String, String)]): (Double, Option[Double]) = {
    val idx = labels.toIndexedSeq
    var ss = 0L; var dd = 0L; var t = 0L
    for (i <- idx.indices; j <- (i + 1) until idx.size) {
      t += 1
      val sameA = idx(i)._1 == idx(j)._1
      val sameB = idx(i)._2 == idx(j)._2
      if (sameA && sameB) ss += 1
      if (!sameA && !sameB) dd += 1
    }
    val a2 = idx.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val b2 = idx.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val exp = a2.toDouble * b2 / t
    val max = (a2 + b2) / 2.0
    val ari = if (max == exp) None else Some((ss - exp) / (max - exp))
    ((ss + dd).toDouble / t, ari)
  }

  test("identical clusterings: rand = ari = 1") {
    val r = row(Seq((1L, "x", "p"), (2L, "x", "p"), (3L, "y", "q"), (4L, "z", "r")))
    assert(r.getAs[Double]("rand") == 1.0)
    assert(r.getAs[Double]("ari") == 1.0)
  }

  test("fully crossed 2x2: ari = -0.5, rand = 1/3 (textbook values)") {
    val r = row(Seq((1L, "a", "p"), (2L, "a", "q"), (3L, "b", "p"), (4L, "b", "q")))
    assert(math.abs(r.getAs[Double]("rand") - 1.0 / 3) < 1e-15)
    assert(math.abs(r.getAs[Double]("ari") - (-0.5)) < 1e-15)
    assert(r.getAs[Long]("t_pairs") == 6L && r.getAs[Long]("s2_both") == 0L)
  }

  test("ari undefined (all singletons both sides) -> null; rand = 1") {
    val r = row(Seq((1L, "a", "p"), (2L, "b", "q"), (3L, "c", "r")))
    assert(r.isNullAt(r.fieldIndex("ari")))
    assert(r.getAs[Double]("rand") == 1.0)
  }

  test("degenerate universe (single id, zero pairs): rand AND ari null, never NaN") {
    // 0/0 would be NaN, which Spark orders above every double — a
    // ">= threshold" stability gate would read a pairless comparison
    // as perfect agreement
    val r = row(Seq((1L, "a", "p")))
    assert(r.isNullAt(r.fieldIndex("rand")))
    assert(r.isNullAt(r.fieldIndex("ari")))
  }

  test("matches independent brute-force pair counting on a mixed case") {
    // deterministic pseudo-random labels, 60 ids, 4 x 5 label space
    val labels = (0 until 60).map { i =>
      val h = i * 2654435761L
      (s"a${(h >>> 7) % 4}", s"b${(h >>> 17) % 5}")
    }
    val rows = labels.zipWithIndex.map { case ((ca, cb), i) => (i.toLong, ca, cb) }
    val r = row(rows)
    val (randBf, ariBf) = bruteForce(labels)
    assert(math.abs(r.getAs[Double]("rand") - randBf) < 1e-12)
    assert(math.abs(r.getAs[Double]("ari") - ariBf.get) < 1e-12)
  }

  test("big-n double arm (longSafeMax exceeded) matches the Long arm at small n") {
    val rows = Seq((1L, "a", "p"), (2L, "a", "q"), (3L, "b", "p"), (4L, "b", "q"),
      (5L, "a", "p"), (6L, "b", "q"), (7L, "c", "r"))
    val long = row(rows)
    val dbl = ClusterAgreement.agreement(assignDF(rows), longSafeMax = 2L).collect().head
    assert(math.abs(long.getAs[Double]("rand") - dbl.getAs[Double]("rand")) < 1e-12)
    assert(math.abs(long.getAs[Double]("ari") - dbl.getAs[Double]("ari")) < 1e-12)
  }

  test("stability: drops ids absent from one run, agrees on the intersection") {
    import spark.implicits._
    val runA = Seq((1L, 10L), (2L, 10L), (3L, 11L), (9L, 12L)).toDF("doc_id", "cluster_id")
    val runB = Seq((1L, 20L), (2L, 20L), (3L, 21L), (8L, 22L)).toDF("doc_id", "cluster_id")
    val r = ClusterAgreement.stability(runA, runB).collect().head
    assert(r.getAs[Long]("n") == 3L) // ids 8/9 dropped
    assert(r.getAs[Double]("rand") == 1.0 && r.getAs[Double]("ari") == 1.0)
  }
}
