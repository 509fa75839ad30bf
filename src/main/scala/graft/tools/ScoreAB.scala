package graft.tools
import org.apache.spark.sql.SparkSession
import graft.schema.Fixture
import graft.blocking.Blocking
import graft.scoring.Scoring

/** A/B harness for stage-S changes: full parquet write (no count()
  * pruning), JIT-warmed, bench-scale candidates. Report the 2nd run. */
object ScoreAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (docsPath, _) = Fixture.ensureWritten(spark, "bench")
    val docs = spark.read.parquet(docsPath)
    val cand = Blocking.candidates(docs, Blocking.Cfg()).localCheckpoint(true)
    println("cand=" + cand.count())
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      Scoring.score(cand, docs).write.mode("overwrite").parquet("/tmp/score_ab")
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
