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
    // SPARK_GRAFT_SCORE_PATH=direct|pair|dict|fused (default fused —
    // the single-expression kernel). pair/dict/fused include their
    // stage-S1 builds in the measured run, like a fresh pipeline would.
    val path = sys.env.getOrElse("SPARK_GRAFT_SCORE_PATH", "fused")
    val txt = Scoring.textRep(docs).localCheckpoint(true)
    val med = Scoring.mediaRep(docs).localCheckpoint(true)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val scored = path match {
        case "direct" => Scoring.scoreWithRepsDirect(cand, txt, med)
        case "pair" =>
          // checkpointed pair-score table, as the pipeline stages it
          Scoring.textPairScores(cand, txt)
            .write.mode("overwrite").parquet("/tmp/score_ab_ps")
          val ps = spark.read.parquet("/tmp/score_ab_ps")
          println(f"  ps build: ${(System.nanoTime() - t0) / 1e9}%.1f s, rows=${ps.count()}")
          Scoring.scoreWithReps(cand, txt, med, Scoring.Weights(), Some(ps))
        case p =>
          val dict = Scoring.textDictDense(txt).localCheckpoint(true)
          val ids = Scoring.textIdsRep(txt, dict).localCheckpoint(true)
          val bc = Scoring.broadcastDict(dict)
          println(f"  dict build: ${(System.nanoTime() - t0) / 1e9}%.1f s, texts=${bc.value.size}")
          if (p == "fused") Scoring.scoreWithRepsFused(cand, ids, med, Scoring.Weights(), bc)
          else Scoring.scoreWithRepsDict(cand, ids, med, Scoring.Weights(), bc)
      }
      scored.write.mode("overwrite").parquet("/tmp/score_ab")
      println(f"run $i ($path): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
