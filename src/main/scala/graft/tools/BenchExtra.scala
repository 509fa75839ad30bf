package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerTaskEnd}

/** Per-job wall + task-CPU profiling of the bench pipeline (guide §1:
  * measure first). NOT part of the frozen bench contract — Bench.scala
  * times the official metric; this harness answers "which Spark jobs
  * eat the wall/CPU inside pir_e2e", with stage names, so optimization
  * targets are measured rather than guessed. Task CPU is robust to
  * host-noise windows in a way wall is not.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.BenchExtra"
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    final case class J(id: Int, t0: Long, name: String, phase: String)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val jobCpu = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Double, String, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val name = e.stageInfos.sortBy(_.stageId).lastOption.map(_.name).getOrElse("?")
        e.stageInfos.foreach(si => stageToJob.put(si.stageId, e.jobId))
        starts.put(e.jobId, J(e.jobId, System.nanoTime(), name.take(90), graft.util.PhaseTracker.get))
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.get(e.stageId)
        val m = e.taskMetrics
        if (m != null)
          jobCpu.computeIfAbsent(jid, _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(m.executorCpuTime)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = starts.remove(e.jobId)
        if (j != null) {
          val cpu = Option(jobCpu.get(e.jobId)).map(_.get / 1e9).getOrElse(0.0)
          rows.add((j.id, (System.nanoTime() - j.t0) / 1e9, cpu, j.name, j.phase))
        }
      }
    })

    val pipeCfg = graft.pipeline.Pipeline.Cfg()
    // warmup (JIT) at t2, untimed
    locally {
      val (wuDocs, _) = graft.schema.Fixture.ensureWritten(spark, "t2")
      val wuDir = "/tmp/graft_extra_warmup"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wuDir))
      graft.pipeline.Pipeline.run(spark, spark.read.parquet(wuDocs), wuDir, pipeCfg)
    }
    rows.clear()

    val scale = graft.queries.Resolution.scaleFor(sfDir)
    val (docsPath, _) = graft.schema.Fixture.ensureWritten(spark, scale)
    val docs = spark.read.parquet(docsPath)
    val runDir = s"/tmp/graft_extra_run_${scale}_$cpus"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(runDir))
    val t0 = System.nanoTime()
    graft.pipeline.Pipeline.run(spark, docs, runDir, pipeCfg)
    val e2e = (System.nanoTime() - t0) / 1e9

    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq.sortBy(_._1)
    println(f"== e2e ${e2e}%.1f s; ${all.size} jobs; sum-of-job walls ${all.map(_._2).sum}%.1f s; sum cpu ${all.map(_._3).sum}%.1f core-s ==")
    all.foreach { case (id, w, c, name, phase) =>
      println(f"job $id%4d  wall $w%7.2f s  cpu $c%8.1f  [$phase%-10s]  $name")
    }
    println("== top sites by summed task CPU ==")
    all.groupBy(r => (r._5, r._4)).view.mapValues(v => (v.map(_._2).sum, v.map(_._3).sum, v.size)).toSeq
      .sortBy(-_._2._2).take(40).foreach { case ((ph, name), (w, c, n)) =>
        println(f"cpu $c%8.1f  wall $w%8.2f s  n=$n%-3d [$ph%-10s] $name")
      }
    spark.stop()
  }
}
