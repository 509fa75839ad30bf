package graft.tools
import org.apache.spark.sql.SparkSession
import graft.schema.Fixture
import graft.pipeline.Pipeline

/** A/B harness for pipeline-level changes: full runs into fresh dirs,
  * first run is the JIT warmup. Chunk concurrency via
  * SPARK_GRAFT_SCORE_CONC. */
object PipeAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (docsPath, _) = Fixture.ensureWritten(spark, "bench")
    val docs = spark.read.parquet(docsPath)
    (1 to 3).foreach { i =>
      val dir = s"/tmp/graft_pipe_ab_$i"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val t0 = System.nanoTime()
      val cfg = Pipeline.Cfg(
        dictIds = sys.env.get("SPARK_GRAFT_DICT_IDS").forall(_ != "0"),
        scoreChunks = sys.env.get("SPARK_GRAFT_CHUNKS").map(_.toInt).getOrElse(4)
      )
      Pipeline.run(spark, docs, dir, cfg)
      val wall = (System.nanoTime() - t0) / 1e9
      val m = spark.read.parquet(s"$dir/metrics").collect()
        .map(r => (r.getString(0), r.getString(2)) -> r.getDouble(3)).toMap
      println(f"run $i: e2e $wall%.1f s, scoring ${m(("scored_pairs", "wall_ms")) / 1000}%.1f s, clustering ${m(("clusters", "wall_ms")) / 1000}%.1f s")
    }
    spark.stop()
  }
}
