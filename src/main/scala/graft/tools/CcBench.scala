package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cluster.ConnectedComponents

/** Timed connected-components runs on the bench-scale match edges
  * (JIT-warmed; reports 2nd/3rd runs). */
object CcBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (docsPath, _) = graft.schema.Fixture.ensureWritten(spark, "bench")
    val docs = spark.read.parquet(docsPath).select("doc_id").localCheckpoint(true)
    val scoredDir = s"/tmp/graft_bench_run_bench_$cpus/scored_pairs"
    val scored = spark.read.parquet(scoredDir)
    val edges = scored.where(col("is_match"))
      .select(col("doc_a").as("src"), col("doc_b").as("dst")).localCheckpoint(true)
    println("edges=" + edges.count() + " docs=" + docs.count())
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val r = ConnectedComponents.run(edges, docs)
      val n = r.assignments.select(countDistinct("cluster_id")).head().getLong(0)
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.1f s, iters=${r.iterations}, clusters=$n")
    }
    spark.stop()
  }
}
