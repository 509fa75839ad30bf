package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Bucketed

/** Bucketed-table co-location: a join of two tables bucketed on the
  * join key must plan WITHOUT a shuffle exchange (the write pre-paid
  * the partitioning), while the same join on plain parquet shuffles.
  * This is the plan-level contract the 100 TB layout depends on. */
class BucketedSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("join of two tables bucketed on the key is exchange-free; unbucketed join shuffles") {
    import spark.implicits._
    // AQE rewrites small joins to broadcast, which would hide the
    // exchange question entirely — pin sort-merge for the assertion
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = (0 until 5000).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
      val reps = (0 until 5000).map(i => (i.toLong, i * 2.0)).toDF("doc_id", "score")
      Bucketed.write(docs, "b_docs", buckets = 8, key = "doc_id")
      Bucketed.write(reps, "b_reps", buckets = 8, key = "doc_id")

      val bucketed = Bucketed.table(spark, "b_docs").join(Bucketed.table(spark, "b_reps"), "doc_id")
      assert(!Bucketed.hasShuffle(bucketed), "bucketed join must not shuffle:\n" +
        bucketed.queryExecution.executedPlan.toString.take(2000))
      assert(bucketed.count() == 5000)

      val plainDir = java.nio.file.Files.createTempDirectory("graft_plain").toString
      docs.write.mode("overwrite").parquet(s"$plainDir/docs")
      reps.write.mode("overwrite").parquet(s"$plainDir/reps")
      val plain = spark.read.parquet(s"$plainDir/docs")
        .join(spark.read.parquet(s"$plainDir/reps"), "doc_id")
      assert(Bucketed.hasShuffle(plain), "plain parquet join should shuffle under sort-merge")

      // group-by on the bucket key is exchange-free too (partial+final
      // aggregation collapses onto the bucketed partitioning)
      val agg = Bucketed.table(spark, "b_docs").groupBy("doc_id").agg(count(lit(1)))
      assert(!Bucketed.hasShuffle(agg), "bucketed group-by must not shuffle")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_reps")
    }
  }
}
