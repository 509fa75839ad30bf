package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev: time each SparkEntry query individually (find stragglers). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only = if (args.length > 1) Some(args(1).split(",").toSet) else None
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        val t0 = System.nanoTime()
        try {
          val n = fn(spark, sfDir).count()
          println(f"[tq] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s  rows=$n")
        } catch {
          case e: Throwable =>
            println(f"[tq] $name%-28s FAILED ${e.getMessage.take(120)}")
        }
      }
    }
    spark.stop()
  }
}
