package graft.tools
import org.apache.spark.sql.SparkSession
import graft.schema.Fixture
import graft.blocking.Blocking
import graft.scoring.Scoring

object ScoreOnly {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (docsPath, _) = Fixture.ensureWritten(spark, "bench")
    val docs = spark.read.parquet(docsPath)
    val cand = Blocking.candidates(docs, Blocking.Cfg()).persist()
    println("cand=" + cand.count())
    var t0 = System.nanoTime()
    val n = Scoring.score(cand, docs).count()
    println(f"scored=$n in ${(System.nanoTime()-t0)/1e9}%.1f s (no persist)")
    t0 = System.nanoTime()
    val sc = Scoring.score(cand, docs).localCheckpoint(true)
    println(f"scored=${sc.count()} in ${(System.nanoTime()-t0)/1e9}%.1f s (localCheckpoint)")
    spark.stop()
  }
}
