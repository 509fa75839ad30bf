package graft.util

/** Coarse attribution of task metrics to pipeline phases: Pipeline.run
  * marks the current phase at each stage boundary; Bench's
  * SparkListener buckets every task's CPU/GC by the phase current at
  * task END. Phases run minutes while tasks run milliseconds, so
  * boundary misattribution is negligible — the point is making a
  * driver-captured bench artifact self-explanatory (which stage burned
  * the CPU, where the GC went) without rerunning anything. */
object PhaseTracker {
  private val cur = new java.util.concurrent.atomic.AtomicReference[String]("other")
  def set(phase: String): Unit = cur.set(phase)
  def get: String = cur.get()
}
