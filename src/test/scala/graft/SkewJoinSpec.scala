package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** AQE skew-join evidence: blocking handles known-hot keys explicitly
  * (block caps + two-sided salt), and RESIDUAL skew is left to AQE's
  * runtime re-plan. This spec proves the session actually gets that
  * re-plan: a join with one hot key, under test-scaled thresholds,
  * must show skew-split sort-merge join partitions in the final
  * adaptive plan. */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32kb",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16kb",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    )
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~90% of the rows, with a fat payload
      // incompressible per-row payload: shuffle blocks are lz4'd, and a
      // constant pad would compress the "hot" partition below the skew
      // threshold. Also pre-spread over many map partitions: AQE splits
      // a skewed reduce partition by MAPPER ranges, so a single local
      // partition (one mapper block) is unsplittable by construction.
      val rnd = new scala.util.Random(7)
      def pad() = rnd.alphanumeric.take(200).mkString
      val left = ((0 until 20000).map(_ => 0L) ++ (1L to 2000L))
        .map(k => (k, pad())).toDF("k", "pl").repartition(16)
      val right = (0L to 2000L).map(k => (k, k * 2.0)).toDF("k", "v").repartition(4)
      val joined = left.join(right, "k")
      // execute THIS plan (count() would run a different QueryExecution
      // and leave joined's adaptive plan un-finalized)
      assert(joined.collect().length == 22000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isSkew=true") || finalPlan.contains("skew=true"),
        "expected AQE skew-split markers in the final plan:\n" + finalPlan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
