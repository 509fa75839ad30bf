package graft.tools

/** Standalone bandwidth probe for interleaved A/B bench sessions: the
  * driving script runs this between Bench invocations (including
  * benches of older commits whose Bench lacks the in-process probe)
  * so every run in the session gets a bandwidth reading next to it.
  * Prints one JSON line. No SparkSession — plain JVM.
  */
object MemBwProbe {
  def main(args: Array[String]): Unit = {
    val gbps = graft.util.MemBw.probeGBps()
    println(f"""{"mem_bw_gbps":$gbps%.2f}""")
  }
}
