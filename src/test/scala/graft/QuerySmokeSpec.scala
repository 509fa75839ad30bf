package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes EVERY driver-contract query end-to-end at sf0.001 with a
  * real parquet write (a count() would let Catalyst prune the very
  * expressions under test). Catches runtime failures — e.g. driver-side
  * row accessor type errors — that no per-operator spec covers, before
  * the driver's Verify does. */
class QuerySmokeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val outDir = java.nio.file.Files.createTempDirectory("graft_smoke").toString

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracled query has a query implementation and vice-versa names align") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes and writes at sf0.001") {
      fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
      assert(spark.read.parquet(s"$outDir/$name").count() >= 0)
    }
  }
}
