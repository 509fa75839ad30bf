package graft.tools
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong
import graft.schema.Fixture
import graft.blocking.Blocking
import graft.scoring.Scoring

/** Round-4 fused-kernel A/B: task-CPU comparison of the fused stage-B
  * MinHash kernel and fused stage-S span kernel against their
  * explode→aggregate baselines. CPU (not wall) is the decision metric —
  * this box carries co-running load (BASELINE.md attribution). */
object FusedAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs = new AtomicLong; val gcMs = new AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { cpuNs.addAndGet(m.executorCpuTime); gcMs.addAndGet(m.jvmGCTime) }
      }
    })
    def timed(name: String)(b: => Any): Unit = {
      Thread.sleep(300)
      val (c0, g0) = (cpuNs.get, gcMs.get); val t0 = System.nanoTime(); b
      Thread.sleep(300)
      println(f"[ab] $name%-28s wall=${(System.nanoTime() - t0) / 1e9}%6.1f cpu=${(cpuNs.get - c0) / 1e9}%7.1f gc=${(gcMs.get - g0) / 1e3}%5.1f")
    }
    val (docsPath, _) = Fixture.ensureWritten(spark, "bench")
    val docs = spark.read.parquet(docsPath)

    // one variant per JVM (SPARK_GRAFT_AB=<variant>): accumulated
    // broadcasts/checkpoints from earlier variants otherwise GC-pollute
    // later ones (measured: the 3rd scoring run in one JVM carried
    // 300 s of GC vs 4 s in a fresh JVM)
    val variant = sys.env.getOrElse("SPARK_GRAFT_AB", "score_fusedB")

    if (variant.startsWith("keys")) {
      val fused = variant == "keys_fused"
      for (r <- 1 to 2) timed(s"$variant r$r") {
        Blocking.docKeys(docs, Blocking.Cfg(fusedMinhash = fused))
          .write.mode("overwrite").parquet("/tmp/fab_keys")
      }
    } else {
      val candPath = "/tmp/fab_cand"
      if (!new java.io.File(candPath + "/_SUCCESS").exists())
        Blocking.candidates(docs, Blocking.Cfg()).write.mode("overwrite").parquet(candPath)
      val cand = spark.read.parquet(candPath)
      println("cand=" + cand.count())
      val txt = Scoring.textRep(docs).localCheckpoint(true)
      val med = Scoring.mediaRep(docs).localCheckpoint(true)
      val dict = Scoring.textDictDense(txt).localCheckpoint(true)
      val ids = Scoring.textIdsRep(txt, dict).localCheckpoint(true)
      val bc = Scoring.broadcastDict(dict)
      for (r <- 1 to 2) timed(s"$variant r$r") {
        (variant match {
          case "score_dict" => Scoring.scoreWithRepsDict(cand, ids, med, Scoring.Weights(), bc)
          case "score_fused" => Scoring.scoreWithRepsFused(cand, ids, med, Scoring.Weights(), bc)
          case _ => Scoring.scoreWithRepsFused(cand, ids, med, Scoring.Weights(), bc, bcastReps = true)
        }).write.mode("overwrite").parquet("/tmp/fab_scored")
      }
    }
    spark.stop()
  }
}
