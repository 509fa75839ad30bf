package graft.util

/** Direct DRAM-bandwidth probe (STREAM-triad style, McCalpin 1995).
  *
  * Why it exists: the bench's previous "weather canary" (q1, a small
  * cache-resident query) is provably unable to detect degraded host
  * windows — three archived slow runs carry healthy canaries
  * (bench_raw r5/r6, BENCH_r04). The one shared resource a noisy
  * neighbour VM contends for that in-VM CPU counters cannot see is
  * memory bandwidth, so the bench now measures it DIRECTLY, before and
  * after the pipeline, and emits both numbers in the artifact
  * (mem_bw_gbps_start/end). A run whose probes read far below the
  * machine's healthy figure is a degraded-window run by its own
  * artifact, independent of any cross-run comparison.
  *
  * Method: T threads, each with private a/b/c double arrays sized well
  * past LLC share, sweep a(i) = b(i) + s·c(i) for ~1.5 s; bandwidth =
  * completed passes × 24 B/element ÷ elapsed (the conventional STREAM
  * count: two reads + one write, write-allocate traffic not counted —
  * consistent across runs, which is all a detector needs).
  */
object MemBw {

  // JIT sink: array stores feed this volatile so the sweep can't be
  // dead-code-eliminated
  @volatile private var sink: Double = 0.0

  /** One probe; returns GB/s. ~(3 × 8 × perThreadDoubles × threads)
    * bytes of footprint (default: 16 threads × 48 MB = 768 MB). */
  def probeGBps(
      threads: Int = math.min(16, Runtime.getRuntime.availableProcessors),
      perThreadDoubles: Int = 2 << 20,
      sweepMillis: Long = 1500
  ): Double = {
    val passes = new java.util.concurrent.atomic.AtomicLong
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val barrier = new java.util.concurrent.CyclicBarrier(threads + 1)
    val ts = (0 until threads).map { _ =>
      val t = new Thread(() => {
        val n = perThreadDoubles
        val a = new Array[Double](n)
        val b = new Array[Double](n)
        val c = new Array[Double](n)
        java.util.Arrays.fill(b, 1.0)
        java.util.Arrays.fill(c, 2.0)
        // untimed pass: fault every page + JIT-compile the loop
        var i = 0
        while (i < n) { a(i) = b(i) + 0.5 * c(i); i += 1 }
        barrier.await()
        var p = 0L
        while (!stop.get()) {
          var j = 0
          while (j < n) { a(j) = b(j) + 0.5 * c(j); j += 1 }
          p += 1
        }
        passes.addAndGet(p)
        sink += a(n / 2)
      })
      t.setDaemon(true)
      t.start()
      t
    }
    barrier.await()
    val t0 = System.nanoTime()
    Thread.sleep(sweepMillis)
    stop.set(true)
    val elapsed = (System.nanoTime() - t0) / 1e9
    ts.foreach(_.join())
    passes.get() * perThreadDoubles.toLong * 24.0 / elapsed / 1e9
  }
}
