package graft.tools
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong
import graft.schema.Fixture
import graft.blocking.Blocking
import graft.scoring.Scoring

object ScoreProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs = new AtomicLong; val gcMs = new AtomicLong; val runMs = new AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { cpuNs.addAndGet(m.executorCpuTime); gcMs.addAndGet(m.jvmGCTime); runMs.addAndGet(m.executorRunTime) }
      }
    })
    def timed(name: String)(b: => Any): Unit = {
      Thread.sleep(500)
      val (c0,g0,r0)=(cpuNs.get,gcMs.get,runMs.get); val t0=System.nanoTime(); b
      Thread.sleep(500)
      println(f"[sp] $name%-34s wall=${(System.nanoTime()-t0)/1e9}%6.1f cpu=${(cpuNs.get-c0)/1e9}%7.1f gc=${(gcMs.get-g0)/1e3}%5.1f run=${(runMs.get-r0)/1e3}%7.1f")
    }
    val (docsPath,_) = Fixture.ensureWritten(spark, "bench")
    val docs = spark.read.parquet(docsPath)
    // candidates checkpoint like the pipeline writes
    val candPath = "/tmp/sp_cand"
    if (!new java.io.File(candPath+"/_SUCCESS").exists())
      Blocking.candidates(docs, Blocking.Cfg()).write.mode("overwrite").parquet(candPath)
    val cand = spark.read.parquet(candPath)
    timed("score write parquet (sh=32) A") { Scoring.score(cand, docs).write.mode("overwrite").parquet("/tmp/sp_scored") }
    timed("score write parquet (sh=32) B") { Scoring.score(cand, docs).write.mode("overwrite").parquet("/tmp/sp_scored") }
    spark.conf.set("spark.sql.shuffle.partitions","128")
    timed("score write parquet (sh=128)") { Scoring.score(cand, docs).write.mode("overwrite").parquet("/tmp/sp_scored") }
    spark.stop()
  }
}
