package graft.tools

import org.apache.spark.unsafe.types.UTF8String
import graft.functions.JW

/** Dev: microbenchmark the two JW kernels. */
object JwBench {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(5)
    def word(): String = (0 until 20 + rnd.nextInt(30)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val n = 200000
    val as = Array.fill(n)(word())
    val bs = Array.fill(n)(word())
    val ua = as.map(UTF8String.fromString)
    val ub = bs.map(UTF8String.fromString)

    for (round <- 1 to 3) {
      var t0 = System.nanoTime()
      var s1 = 0.0
      var i = 0
      while (i < n) { s1 += JW.jaroWinkler(as(i), bs(i)); i += 1 }
      val tChar = (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      var s2 = 0.0
      i = 0
      while (i < n) { s2 += JW.jw(ua(i), ub(i)); i += 1 }
      val tByte = (System.nanoTime() - t0) / 1e6
      // and the toString-then-char path as used before
      t0 = System.nanoTime()
      var s3 = 0.0
      i = 0
      while (i < n) { s3 += JW.jaroWinkler(ua(i).toString, ub(i).toString); i += 1 }
      val tOld = (System.nanoTime() - t0) / 1e6
      println(f"round $round: char=$tChar%.0fms bytePath=$tByte%.0fms toStringPath=$tOld%.0fms (sums $s1%.1f/$s2%.1f/$s3%.1f)")
    }
  }
}
