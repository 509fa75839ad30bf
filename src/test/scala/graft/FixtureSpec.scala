package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.schema.Fixture

class FixtureSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("generation is deterministic and partitioning-independent") {
    val cfg = Fixture.scales("t1")
    def contentHash(parallelism: Int): Long = {
      Fixture.docs(spark, cfg).toDF()
        .repartition(parallelism)
        .select(bit_xor(xxhash64(col("doc_id"), to_json(col("spans")))).as("h"))
        .head().getLong(0)
    }
    assert(contentHash(2) == contentHash(13))
  }

  test("docs and labels align 1:1; spans interleave text and media with increasing offsets") {
    val cfg = Fixture.scales("t1")
    val docs = Fixture.docs(spark, cfg).toDF().cache()
    val labels = Fixture.labels(spark, cfg).toDF()
    assert(docs.count() == labels.count())
    assert(docs.join(labels, "doc_id").count() == docs.count())

    // offsets strictly 0..n-1 in order
    val badOffsets = docs.select(
      col("doc_id"),
      transform(col("spans"), s => s.getField("offset")).as("offs"),
      size(col("spans")).as("n")
    ).where(col("offs") =!= sequence(lit(0), col("n") - 1)).count()
    assert(badOffsets == 0)

    // kind/text/media_ref consistency
    val badSpans = docs.select(explode(col("spans")).as("s"))
      .where(
        !(col("s.kind") === "text" && col("s.text").isNotNull && col("s.media_ref").isNull) &&
          !(col("s.kind") === "media" && col("s.text").isNull && col("s.media_ref").isNotNull)
      ).count()
    assert(badSpans == 0)

    // both kinds present overall
    val kinds = docs.select(explode(col("spans")).as("s")).select(col("s.kind")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("text", "media"))
  }

  test("hot media ref lands on roughly 5% of docs (skew fixture)") {
    val cfg = Fixture.scales("t1")
    val docs = Fixture.docs(spark, cfg).toDF()
    val n = docs.count().toDouble
    val hot = docs.where(array_contains(
      transform(filter(col("spans"), s => s.getField("kind") === lit("media")), s => s.getField("media_ref")),
      Fixture.hotAsset
    )).count().toDouble
    assert(hot / n > 0.02 && hot / n < 0.10, s"hot fraction ${hot / n}")
  }
}
