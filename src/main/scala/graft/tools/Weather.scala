package graft.tools

/** Standalone host-weather probe — the Bench's window classifier
  * (BASELINE.md round-5 finding #6) extracted so a watcher can poll
  * the box cheaply (~8 s, no SparkSession) and catch a clean window
  * for re-recording the bench trio. Prints ONE JSON line.
  *
  * Probes (same instruments as Bench, same thresholds where they
  * transfer):
  *  - DRAM: 16-thread STREAM triad via [[graft.util.MemBw]]; degraded
  *    below 70 GB/s (healthy 98-113, bandwidth-mode floor 36).
  *  - Disk: 128 MB synced sequential write; degraded below 60 MB/s
  *    (healthy 160-310, kernel/IO-mode floor ~4).
  *  - Steal + foreign CPU, sampled ACROSS the DRAM sweep: at idle a
  *    starved guest shows no steal (steal accrues only when vCPUs are
  *    runnable), so /proc/stat is read around the 16-thread sweep —
  *    that load window exposes withheld CPU. Degraded above 0.3
  *    steal core-s/s or 2.0 system core-s/s while the probe (pure
  *    userland) is the only workload.
  */
object Weather {
  private def statParts(): Array[Long] =
    scala.io.Source.fromFile("/proc/stat").getLines().next()
      .split("\\s+").drop(1).map(_.toLong)

  private def diskWMBps(): Double = {
    val f = java.io.File.createTempFile("graft_diskprobe", ".bin")
    try {
      val buf = new Array[Byte](1 << 20)
      val out = new java.io.FileOutputStream(f)
      val t0 = System.nanoTime()
      var i = 0
      while (i < 128) { out.write(buf); i += 1 }
      out.getFD.sync()
      out.close()
      128.0 / ((System.nanoTime() - t0) / 1e9)
    } finally f.delete()
  }

  def main(args: Array[String]): Unit = {
    val s0 = statParts(); val t0 = System.nanoTime()
    val bw = graft.util.MemBw.probeGBps()
    val s1 = statParts(); val t1 = System.nanoTime()
    val wall = (t1 - t0) / 1e9
    // /proc/stat fields: user nice system idle iowait irq softirq steal
    def d(i: Int) = (s1(i) - s0(i)) / 100.0
    val sysRate = (d(2) + d(5) + d(6)) / wall // system+irq+softirq core-s/s
    val stealRate = (if (s0.length > 7) d(7) else 0.0) / wall
    val disk = scala.util.Try(diskWMBps()).getOrElse(-1.0)
    // Round-5 burn-ladder lesson: steal is LOAD-DEPENDENT on this host —
    // the short sweep above reads ~0 steal in windows where a sustained
    // all-core burn measures 1-2+ stolen cores (and a 32-thread Spark
    // run then drowns in lock-holder-preemption kernel spin). The
    // 20-s loaded probe is the one that certifies a window for an
    // all-core bench; skip with "fast" when only the idle read is
    // wanted.
    val (loadSteal, loadSys) =
      if (args.headOption.contains("fast")) (-1.0, -1.0)
      else graft.util.LoadProbe.stealUnderLoad()
    val reasons = Seq(
      (bw < 70.0) -> "mem_bw",
      (disk >= 0 && disk < 60.0) -> "disk_w",
      (stealRate > 0.3) -> "steal",
      (sysRate > 2.0) -> "host_sys",
      (loadSteal > 0.3) -> "steal_under_load"
    ).collect { case (true, r) => r }
    val window = if (reasons.isEmpty) "clean" else "degraded"
    println(
      f"""{"ts":${System.currentTimeMillis / 1000},"window":"$window","reasons":[${reasons.map("\"" + _ + "\"").mkString(",")}],""" +
        f""""mem_bw_gbps":$bw%.2f,"disk_w_mbps":$disk%.1f,"steal_cores":$stealRate%.2f,"sys_cores":$sysRate%.2f,""" +
        f""""load_steal_cores":$loadSteal%.2f,"load_sys_cores":$loadSys%.2f}"""
    )
  }
}
