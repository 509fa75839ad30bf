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
  import graft.util.HostProbe

  def main(args: Array[String]): Unit = {
    val s0 = HostProbe.statParts(); val t0 = System.nanoTime()
    val bw = graft.util.MemBw.probeGBps()
    val s1 = HostProbe.statParts(); val t1 = System.nanoTime()
    val wall = (t1 - t0) / 1e9
    // /proc/stat fields: user nice system idle iowait irq softirq steal
    def d(i: Int) =
      if (s0.length > i && s1.length > i) (s1(i) - s0(i)) / 100.0 else 0.0
    val sysRate = (d(2) + d(5) + d(6)) / wall // system+irq+softirq core-s/s
    val stealRate = d(7) / wall
    val disk = scala.util.Try(HostProbe.diskWMBps()).getOrElse(-1.0)
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
      (bw < HostProbe.MemBwFloorGBps) -> "mem_bw",
      (disk >= 0 && disk < HostProbe.DiskWFloorMBps) -> "disk_w",
      (stealRate > HostProbe.StealRateMax) -> "steal",
      (sysRate > HostProbe.SysRateMax) -> "host_sys",
      (loadSteal > HostProbe.StealRateMax) -> "steal_under_load"
    ).collect { case (true, r) => r }
    val window = if (reasons.isEmpty) "clean" else "degraded"
    println(
      f"""{"ts":${System.currentTimeMillis / 1000},"window":"$window","reasons":[${reasons.map("\"" + _ + "\"").mkString(",")}],""" +
        f""""mem_bw_gbps":$bw%.2f,"disk_w_mbps":$disk%.1f,"steal_cores":$stealRate%.2f,"sys_cores":$sysRate%.2f,""" +
        f""""load_steal_cores":$loadSteal%.2f,"load_sys_cores":$loadSys%.2f}"""
    )
  }
}
