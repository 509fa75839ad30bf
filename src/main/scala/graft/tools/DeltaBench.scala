package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-resolution benchmark: the cost of absorbing a small
  * increment via [[graft.pipeline.Pipeline.runDelta]] versus re-running
  * the full pipeline over the merged corpus — THE number that makes the
  * delta path a 100 TB story (a daily 1% increment should cost ~1% of a
  * full run, not 100%). Prints ONE JSON line and archives it.
  *
  * Protocol (fixture scale from SPARK_GRAFT_DELTA_SCALE, default
  * "bench" = 323k docs; increment = SPARK_GRAFT_DELTA_PCT % of docs by
  * doc_id hash, default 1):
  *   1. full run over the whole corpus (the cost a non-incremental
  *      deployment pays per refresh) — `full_e2e_s`;
  *   2. prior run over the other 99% with `persistForDelta = true`
  *      (pays the keys/media_df persistence the delta consumes) —
  *      `prior_e2e_s`;
  *   3. `runDelta` of the increment against the prior — `delta_e2e_s`.
  * `delta_over_full` is the headline ratio. The artifact also carries a
  * correctness readout: the count of docs whose cluster label differs
  * between the delta result and the full run (labels are min-member
  * canonical in both, so (doc_id, cluster_id) compares directly; the
  * PipelineDeltaSpec contract allows drift only where a media_ref's
  * rarity crossed maxDfFrac between snapshots). Window probes and
  * classification are the same instruments as [[graft.Bench]].
  */
object DeltaBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scale = sys.env.getOrElse("SPARK_GRAFT_DELTA_SCALE", "bench")
    val incPct = sys.env.getOrElse("SPARK_GRAFT_DELTA_PCT", "1").toInt
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

    def statParts(): Array[Long] = graft.util.HostProbe.statParts()
    val stat0 = scala.util.Try(statParts()).getOrElse(Array.empty[Long])
    val memBw0 = graft.util.MemBw.probeGBps()

    def freshDir(tag: String): String = {
      val d = s"/tmp/graft_deltabench_${scale}_$tag"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
      d
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    import graft.pipeline.Pipeline
    // JIT warmup: prime the full-run AND delta-path codegen at t2
    locally {
      val (p, _) = graft.schema.Fixture.ensureWritten(spark, "t2")
      val d = spark.read.parquet(p)
      val inc = pmod(xxhash64(col("doc_id")), lit(100)) < incPct
      val pd = freshDir("wu_prior")
      Pipeline.run(spark, d.where(!inc), pd, Pipeline.Cfg(persistForDelta = true))
      Pipeline.runDelta(spark, d.where(!inc), d.where(inc), pd, freshDir("wu_delta"))
      Pipeline.run(spark, d, freshDir("wu_full"))
    }

    val (docsPath, _) = graft.schema.Fixture.ensureWritten(spark, scale)
    val docs = spark.read.parquet(docsPath)
    val isNew = pmod(xxhash64(col("doc_id")), lit(100)) < incPct
    val priorDocs = docs.where(!isNew)
    val newDocs = docs.where(isNew)
    val nDocs = docs.count()
    val nNew = newDocs.count()

    val fullDir = freshDir("full")
    var fullRes: Pipeline.Result = null
    val fullS = timed { fullRes = Pipeline.run(spark, docs, fullDir) }

    val priorDir = freshDir("prior")
    val priorS = timed {
      Pipeline.run(spark, priorDocs, priorDir, Pipeline.Cfg(persistForDelta = true))
    }

    val deltaDir = freshDir("delta")
    var deltaRes: Pipeline.Result = null
    val deltaS = timed {
      deltaRes = Pipeline.runDelta(spark, priorDocs, newDocs, priorDir, deltaDir)
    }

    // correctness readout: docs whose cluster label differs vs the full
    // run (0 unless a media_ref's dffrac crossed maxDfFrac between the
    // prior and merged snapshots — the documented frozen-statistics
    // boundary)
    val full = fullRes.clusters.select(col("doc_id"), col("cluster_id").as("c_full"))
    val delta = deltaRes.clusters.select(col("doc_id"), col("cluster_id").as("c_delta"))
    val nDiff = full.join(delta, Seq("doc_id"), "full_outer")
      .where(not(col("c_full") <=> col("c_delta"))).count()
    val deltaPairs = spark.read.parquet(s"$deltaDir/scored_pairs").count()

    val memBw1 = graft.util.MemBw.probeGBps()
    val stat1 = scala.util.Try(statParts()).getOrElse(Array.empty[Long])
    def statDelta(idx: Int*): Double =
      if (stat0.length > idx.max && stat1.length > idx.max)
        idx.map(i => stat1(i) - stat0(i)).sum / 100.0
      else -1.0
    val windowReasons = Seq(
      (statDelta(7) > graft.util.HostProbe.StealRunMaxCoreS) -> "host_steal",
      (math.min(memBw0, memBw1) > 0 &&
        math.min(memBw0, memBw1) < graft.util.HostProbe.MemBwFloorGBps) -> "mem_bw"
    ).collect { case (true, r) => r }
    val window =
      if (windowReasons.isEmpty) """"window":"clean""""
      else s""""window":"degraded","window_reasons":${windowReasons.mkString("[\"", "\",\"", "\"]")}"""

    def r3(x: Double) = math.round(x * 1000) / 1000.0
    val json =
      s"""{"metric":"delta_over_full","value":${r3(deltaS / fullS)},"unit":"ratio",""" +
        s""""fixture_scale":"$scale","n_docs":$nDocs,"n_new":$nNew,"inc_frac":${r3(nNew.toDouble / nDocs)},""" +
        s""""full_e2e_s":${r3(fullS)},"prior_e2e_s":${r3(priorS)},"delta_e2e_s":${r3(deltaS)},""" +
        s""""delta_scored_pairs":$deltaPairs,"cluster_label_diffs":$nDiff,"cpus":$cpus,""" +
        s""""host_sys_cpu_s":${statDelta(2, 5, 6)},"host_steal_s":${statDelta(7)},""" +
        s""""mem_bw_gbps_start":${r3(memBw0)},"mem_bw_gbps_end":${r3(memBw1)},$window}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_DELTA_OUT", "bench_raw/delta_bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable => System.err.println(s"[deltabench] write failed: ${e.getMessage}") }
    spark.stop()
    println(json)
    System.out.flush()
  }
}
