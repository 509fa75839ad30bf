package graft.tools

import org.apache.spark.unsafe.types.UTF8String
import graft.functions.JW

/** Dev: thread-scaling probe for the dict-kernel access pattern,
  * OUTSIDE Spark — isolates "does the JW kernel itself stop scaling at
  * 32 threads on this box" from Spark-machinery effects. Mimics stage
  * S: a shared ~1.6M-entry text dictionary; each simulated candidate
  * pair draws ~10 entries and scores the ~25 cross combinations
  * (consecutive calls reuse the pair's entries, like the real stream's
  * locality). Run: `sbt "runMain graft.tools.JwScale"`. */
object JwScale {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    val dictN = 1600000
    def word(): UTF8String = {
      val sb = new StringBuilder
      val words = 4 + rnd.nextInt(5)
      for (w <- 0 until words) {
        if (w > 0) sb += ' '
        (0 until 3 + rnd.nextInt(8)).foreach(_ => sb += ('a' + rnd.nextInt(26)).toChar)
      }
      UTF8String.fromString(sb.toString)
    }
    val dict = Array.fill(dictN)(word())
    val pairsPerThread = 400000 // ~25 kernel calls each => 10M calls/thread

    def work(seed: Int): Long = {
      val r = new java.util.Random(seed)
      var calls = 0L
      var s = 0.0
      var p = 0
      val idsA = new Array[Int](5)
      val idsB = new Array[Int](5)
      while (p < pairsPerThread) {
        var i = 0
        while (i < 5) { idsA(i) = r.nextInt(dictN); idsB(i) = r.nextInt(dictN); i += 1 }
        var a = 0
        while (a < 5) {
          var b = 0
          while (b < 5) { s += JW.jwGE(dict(idsA(a)), dict(idsB(b)), 0.75); calls += 1; b += 1 }
          a += 1
        }
        p += 1
      }
      if (s < -1) println("impossible " + s) // keep s live
      calls
    }

    for (t <- Seq(1, 8, 32); round <- 1 to 2) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(t)
      val t0 = System.nanoTime()
      val futs = (0 until t).map(i => pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = work(i + round * 100)
      }))
      val calls = futs.map(_.get()).sum
      val secs = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      println(f"threads=$t%2d round=$round calls=${calls / 1e6}%.0fM wall=$secs%.1fs rate=${calls / secs / 1e6}%.1fM/s perThread=${calls / secs / 1e6 / t}%.2fM/s")
    }
  }
}
