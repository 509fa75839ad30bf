package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.queries.{Analytics, Resolution}

/** Benchmark main. Times (1) the three resolution-pipeline stages on
  * the fixture scale mapped from SPARK_GRAFT_SF_DIR and (2) each
  * analytics query on the testdata tables. Emits exactly one JSON line.
  *
  * Throughput figures (candidate-pairs/sec in stage S — the metered
  * stage per BASELINE.md) are included under "queries" as pseudo
  * entries and also drive the N-vs-4N scaling-efficiency evidence
  * (run with SPARK_GRAFT_CPUS=8 then 32; see BASELINE.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try body
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val s = (System.nanoTime() - t0) / 1e9
      results(name) = s
      s
    }

    // --- resolution pipeline stages on the fixture ---
    val scale = Resolution.scaleFor(sfDir)
    val cfgScale = graft.schema.Fixture.scales(scale)
    val (docsPath, _) = graft.schema.Fixture.ensureWritten(spark, scale)
    val docs = spark.read.parquet(docsPath)
    val nDocs = docs.count()

    var nPairs = 0L
    val cand = graft.blocking.Blocking.candidates(docs, graft.blocking.Blocking.Cfg()).persist()
    timed("pir_blocking") { nPairs = cand.count() }
    val scored = graft.scoring.Scoring.score(cand, docs).persist()
    val tScore = timed("pir_scoring") { scored.count() }
    timed("pir_clustering") {
      val edges = scored.where(col("is_match")).select(col("doc_a").as("src"), col("doc_b").as("dst"))
      graft.cluster.ConnectedComponents.run(edges, docs.select("doc_id")).assignments.count()
    }
    val e2e = results.values.sum
    results("pir_pairs_per_sec") = if (tScore > 0) nPairs / tScore else 0.0
    results("pir_docs_per_sec") = if (e2e > 0) nDocs / e2e else 0.0

    // --- analytics queries on the testdata tables ---
    Analytics.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      timed(name) { fn(spark, sfDir).count() }
    }

    val total = results.filterNot(_._1.endsWith("per_sec")).values.sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","fixture_scale":"$scale","fixture_docs":$nDocs,"candidate_pairs":$nPairs,"cpus":$cpus}"""
    )
    spark.stop()
  }
}
