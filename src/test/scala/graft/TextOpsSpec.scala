package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextOps

class TextOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.DataFrame

  private def normed(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextOps.normText(col("t")).as("n")).head().getString(0)
  }

  test("normText lowercases, strips punctuation, collapses whitespace") {
    assert(normed("Hello,  WORLD!!") == "hello world")
    assert(normed("  a\t b\nc ") == "a b c")
    assert(normed("") == "")
    assert(normed("..!?") == "")
  }

  test("charShingles handles short strings") {
    import spark.implicits._
    val r = Seq("ab", "abcd").toDF("t")
      .select(TextOps.charShingles(col("t"), 3).as("s"))
      .collect()
      .map(_.getSeq[String](0))
    assert(r(0) == Seq("ab"))
    assert(r(1) == Seq("abc", "bcd"))
  }

  /** Band keys for a set of texts via the production explode→agg path. */
  private def bands(texts: Seq[String], k: Int = 48, b: Int = 12): Seq[Set[Long]] = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
    val sh = df.select(col("id"), explode(TextOps.shingleHashes(TextOps.charShingles(TextOps.normText(col("t")), 4))).as("h"))
    val aggs = TextOps.minhashAggExprs(col("h"), k)
    val sig = sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), TextOps.minhashSigFromAgg(k).as("sig"))
    val bk = sig.select(col("id"), TextOps.bandKeys(col("sig"), b, k / b).as("bands"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSet).toMap
    texts.indices.map(bk)
  }

  test("minhash bands: identical text → identical bands; near-dup shares bands; disjoint shares none") {
    val base = "ladu miko pera sonte velu karo bine tasselo morid"
    val near = "ladu miko pera zonte velu karo bine tasselo morid" // 1 char edit
    val far = "qqq www eee rrr ttt yyy uuu iii ooo ppp"
    val Seq(b1, b1b, b2, b3) = bands(Seq(base, base, near, far))
    assert(b1 == b1b)
    assert((b1 intersect b2).nonEmpty, "near-duplicate should share at least one LSH band")
    assert((b1 intersect b3).isEmpty, "disjoint text should share no band")
  }

  test("minhash signature is deterministic across partitionings") {
    import spark.implicits._
    def sigOf(parallelism: Int): Map[Int, Seq[Long]] = {
      val df = (0 until 50).map(i => (i, s"text number $i with words ${i * 7} and ${i % 11}"))
        .toDF("id", "t").repartition(parallelism)
      val sh = df.select(col("id"), explode(TextOps.shingleHashes(TextOps.charShingles(TextOps.normText(col("t")), 4))).as("h"))
      val aggs = TextOps.minhashAggExprs(col("h"), 16)
      sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
        .select(col("id"), TextOps.minhashSigFromAgg(16).as("sig"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    }
    assert(sigOf(1) == sigOf(7))
  }
}
