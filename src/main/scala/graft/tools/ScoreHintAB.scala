package graft.tools

import org.apache.spark.sql.SparkSession
import graft.blocking.Blocking
import graft.scoring.Scoring

/** Interleaved A/B of the stage-S join strategy (round 6): the fused
  * scoring plan with SHUFFLE_HASH hints vs the planner default
  * (sort-merge + AQE), same JVM, same window, noop sink (guide §1.4)
  * so only the computation is timed. Prints wall + task CPU + GC per
  * repetition. Interleaving is the point — this host's bandwidth
  * fluctuates 2-4× across minutes, so only an A/B/A/B inside one
  * window is decisive (BASELINE.md round-5 lesson).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ScoreHintAB [reps]"
  */
object ScoreHintAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { cpuNs.addAndGet(m.executorCpuTime); gcMs.addAndGet(m.jvmGCTime) }
      }
    })

    val (docsPath, _) = graft.schema.Fixture.ensureWritten(spark, "bench")
    val docs = spark.read.parquet(docsPath)
      .withColumn("doc_id", org.apache.spark.sql.functions.xxhash64(org.apache.spark.sql.functions.col("doc_id")))
    val cand = Blocking.candidates(docs, Blocking.Cfg()).localCheckpoint(true)
    val w = Scoring.Weights()
    val txt = Scoring.textRep(docs).localCheckpoint(true)
    val dict = Scoring.textDictDense(txt).localCheckpoint(true)
    val txtIds = Scoring.textIdsRep(txt, dict).localCheckpoint(true)
    val med = Scoring.mediaRep(docs).localCheckpoint(true)
    val bc = Scoring.broadcastDict(dict)

    def once(hint: String): (Double, Double, Double) = {
      cpuNs.set(0); gcMs.set(0)
      val t0 = System.nanoTime()
      Scoring.scoreWithRepsFused(cand, txtIds, med, w, bc, bcastReps = false, joinHint = hint)
        .write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, cpuNs.get / 1e9, gcMs.get / 1e3)
    }

    // one untimed warmup of each variant (JIT + codegen)
    once("shuffle_hash"); once("none")
    for (r <- 1 to reps; h <- Seq("shuffle_hash", "none")) {
      val (wall, cpu, gc) = once(h)
      println(f"[ab] rep=$r variant=$h%-13s wall=$wall%7.2f s  cpu=$cpu%8.1f core-s  gc=$gc%6.1f s")
    }
    spark.stop()
  }
}
