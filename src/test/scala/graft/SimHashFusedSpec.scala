package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup
import graft.schema.{Doc, Fixture, Span}

/** The fused SimHash kernel must emit BIT-IDENTICAL (id, simhash) rows
  * to the explode→64-vote-aggregate formulation — sketches feed band
  * keys and Hamming thresholds, where a single flipped bit changes the
  * candidate set. Edge docs: empty text, single token, repeated
  * tokens (vote magnitudes), whitespace-only, and non-ASCII (byte-level
  * token scan vs split on ' '). */
class SimHashFusedSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def sketches(docs: org.apache.spark.sql.DataFrame, fused: Boolean): Map[String, Long] = {
    val d = docs.selectExpr("cast(doc_id as string) as id",
      "array_join(transform(filter(spans, s -> s.kind = 'text'), s -> s.text), ' ') as text")
    Dedup.simhash(d, fused = fused)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("simhash")).toMap
  }

  test("fused sketch equals the aggregate path exactly on the t1 fixture") {
    val docs = Fixture.docs(spark, Fixture.scales("t1")).toDF()
    val f = sketches(docs, fused = true)
    val a = sketches(docs, fused = false)
    assert(f.size > 1000)
    assert(f == a, {
      val bad = a.keys.filter(k => f.get(k) != a.get(k)).take(3)
      s"sketches differ, e.g. ${bad.map(k => s"$k: fused=${f.get(k)} agg=${a.get(k)}").mkString("; ")}"
    })
  }

  test("fused sketch equals the aggregate path on edge docs") {
    import spark.implicits._
    def text(t: String, off: Int) = Span("text", t, null, off)
    val docs = Seq(
      Doc("s01", Seq(text("", 0))),                       // no tokens → dropped by both
      Doc("s02", Seq(text("word", 0))),                   // single token
      Doc("s03", Seq(text("a a a a b", 0))),              // repeated tokens, vote magnitudes
      Doc("s04", Seq(text("   ", 0))),                    // whitespace-only → dropped
      Doc("s05", Seq(text("the quick brown fox jumps over the lazy dog", 0))),
      Doc("s06", Seq(text("päivää öljyä überhaupt çok", 0)))  // non-ASCII byte scan
    ).toDF()
    assert(sketches(docs, fused = true) == sketches(docs, fused = false))
  }
}
