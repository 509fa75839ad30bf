package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cluster.ClusterMerge
import graft.schema.{Doc, Span}

class MergeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("mergedEntities: union ids, distinct media, weighted score, JSON round-trip") {
    import spark.implicits._
    val docs = Seq(
      Doc("d1", Seq(Span("text", "aa bb", null, 0), Span("text", "cc dd", null, 1), Span("media", null, "m1", 2))),
      Doc("d2", Seq(Span("media", null, "m1", 0), Span("media", null, "m2", 1))),
      Doc("d3", Seq(Span("text", "zz", null, 0)))
    ).toDS().toDF()
    val clusters = Seq(("d1", "c1"), ("d2", "c1"), ("d3", "d3")).toDF("doc_id", "cluster_id")
    val scored = Seq(("d1", "d2", 7.0)).toDF("doc_a", "doc_b", "score")

    val out = ClusterMerge.mergedEntities(clusters, docs, scored).collect()
      .map(r => r.getString(0) -> r).toMap
    val c1 = out("c1")
    assert(c1.getLong(1) == 2)
    assert(c1.getSeq[String](2) == Seq("d1", "d2"))
    assert(c1.getLong(3) == 2) // text spans
    assert(c1.getSeq[String](4) == Seq("m1", "m2"))
    assert(math.abs(c1.getDouble(5) - 7.0) < 1e-12)
    // JSON round-trip
    val rt = ClusterMerge.mergedEntities(clusters, docs, scored)
      .select(get_json_object(col("entity_json"), "$.n_members").cast("long").as("n"), col("n_members"))
      .where(col("n") =!= col("n_members")).count()
    assert(rt == 0)
    // singleton with no scored pair: score coalesces to 0
    assert(out("d3").getDouble(5) == 0.0)
  }

  test("md5 simhash: near-identical docs pair up; Spark sketch matches a local md5 reference") {
    import spark.implicits._
    // vote margins are O(√tokens): near-dup detection needs long docs
    val rnd = new scala.util.Random(23)
    val base = (0 until 300).map(_ => s"w${rnd.nextInt(500000)}").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base), // identical text → hamming 0, must band-collide
      (3L, (0 until 300).map(_ => s"z${rnd.nextInt(500000)}").mkString(" "))
    ).toDF("id", "text")
    val pairs = graft.ops.Dedup.simhashMd5Pairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0), s"identical docs must pair: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L), "unrelated doc must not pair")

    // cross-check one sketch against a local md5 implementation
    val sk = graft.ops.Dedup.simhashMd5(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sketchSrc = base
    def localSketch(text: String): Long = {
      val words = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" +").filter(_.nonEmpty)
      val votes = new Array[Int](60)
      words.foreach { w =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
        val h = java.lang.Long.parseLong(hex, 16)
        (0 until 60).foreach(i => votes(i) += (if (((h >> i) & 1) == 1) 1 else -1))
      }
      (0 until 60).foldLeft(0L)((acc, i) => if (votes(i) >= 0) acc | (1L << i) else acc)
    }
    assert(sk(1L) == localSketch(sketchSrc))
  }
}
