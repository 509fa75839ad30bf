package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-ladder measurement (round 6; VERDICT r5 ask #1): run the full
  * pipeline at the bench point AND at 10× (~3.2M docs) in ONE session
  * (same window, so the ratio is meaningful even in imperfect weather)
  * and report docs/s, candidate-pairs/doc, dropped-block accounting and
  * peak heap per point. The thing being tested: candidate-pair growth
  * stays ~linear in docs under the block caps (the caps' raison
  * d'être) and no stage hits a memory cliff.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ScaleLadder [scales...]"
  * (default: bench x10). Appends one JSON line per scale to
  * bench_raw/scale_ladder_r06.jsonl.
  */
object ScaleLadder {
  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.toSeq else Seq("bench", "x10")
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
    var peakMem = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { cpuNs.addAndGet(m.executorCpuTime); gcMs.addAndGet(m.jvmGCTime) }
      }
    })

    val out = new StringBuilder
    scales.foreach { scale =>
      val (docsPath, _) = graft.schema.Fixture.ensureWritten(spark, scale)
      val docs = spark.read.parquet(docsPath)
      val nDocs = docs.count()
      val runDir = s"/tmp/graft_ladder_${scale}_$cpus"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(runDir))
      cpuNs.set(0); gcMs.set(0)
      System.gc()
      val t0 = System.nanoTime()
      graft.pipeline.Pipeline.run(spark, docs, runDir, graft.pipeline.Pipeline.Cfg())
      val e2e = (System.nanoTime() - t0) / 1e9
      val rt = Runtime.getRuntime
      peakMem = math.max(peakMem, rt.totalMemory() - rt.freeMemory())
      val metrics = spark.read.parquet(s"$runDir/metrics")
        .collect().map(r => (r.getString(0), r.getString(2)) -> r.getDouble(3)).toMap
      val pairs = metrics.getOrElse(("scored_pairs", "scored_pairs"), 0.0)
      val dropB = metrics.getOrElse(("candidates", "dropped_blocks"), 0.0)
      val dropP = metrics.getOrElse(("candidates", "dropped_pairs_est"), 0.0)
      val json =
        f"""{"scale":"$scale","docs":$nDocs,"e2e_s":$e2e%.1f,"docs_per_sec":${nDocs / e2e}%.0f,""" +
          f""""pairs":${pairs.toLong},"pairs_per_doc":${pairs / nDocs}%.2f,""" +
          f""""dropped_blocks":${dropB.toLong},"dropped_pairs_est":${dropP.toLong},""" +
          f""""wall_blocking_s":${metrics.getOrElse(("candidates", "wall_ms"), 0.0) / 1000}%.1f,""" +
          f""""wall_scoring_s":${metrics.getOrElse(("scored_pairs", "wall_ms"), 0.0) / 1000}%.1f,""" +
          f""""wall_clustering_s":${metrics.getOrElse(("clusters", "wall_ms"), 0.0) / 1000}%.1f,""" +
          f""""task_cpu_s":${cpuNs.get / 1e9}%.0f,"task_gc_s":${gcMs.get / 1e3}%.0f,""" +
          f""""heap_used_gb":${(rt.totalMemory() - rt.freeMemory()) / 1e9}%.1f}"""
      println(s"[ladder] $json")
      out ++= json += '\n'
    }
    val p = java.nio.file.Paths.get("bench_raw/scale_ladder_r06.jsonl")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, out.toString,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}
