package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dumps `.explain("formatted")` for every pipeline path touched by the
  * round-6 optimization pass into plans/r06/<name>_<tag>.txt (tag =
  * before/after, arg 1). Session config mirrors Bench.scala so the
  * plans are the ones the bench actually executes. */
object PlanDumpR06 {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = java.nio.file.Paths.get("plans/r06")
    java.nio.file.Files.createDirectories(outDir)

    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
      val exchanges = "Exchange".r.findAllIn(plan).size
      println(f"$name%-28s exchanges≈$exchanges")
    }

    // t2-scale fixture: same plan shapes as bench scale, fast to build
    val (docsPath, _) = graft.schema.Fixture.ensureWritten(spark, "t2")
    val docs0 = spark.read.parquet(docsPath)
    val docs = docs0.withColumn("doc_id", xxhash64(col("doc_id")))

    val bcfg = graft.blocking.Blocking.Cfg()
    val keys = graft.blocking.Blocking.docKeys(docs, bcfg).localCheckpoint(true)
    dump("blocking_candidates", graft.blocking.Blocking.candidatesFromKeys(keys, bcfg))
    dump("blocking_dropmetrics", graft.blocking.Blocking.dropMetrics(keys, bcfg))

    val cand = graft.blocking.Blocking.candidatesFromKeys(keys, bcfg).localCheckpoint(true)
    val w = graft.scoring.Scoring.Weights()
    val txt = graft.scoring.Scoring.textRep(docs).localCheckpoint(true)
    dump("scoring_text_rep", graft.scoring.Scoring.textRep(docs))
    val dict = graft.scoring.Scoring.textDictDense(txt).localCheckpoint(true)
    dump("scoring_text_ids", graft.scoring.Scoring.textIdsRep(txt, dict))
    val txtIds = graft.scoring.Scoring.textIdsRep(txt, dict).localCheckpoint(true)
    val med = graft.scoring.Scoring.mediaRep(docs).localCheckpoint(true)
    dump("scoring_media_rep", graft.scoring.Scoring.mediaRep(docs))
    val bc = graft.scoring.Scoring.broadcastDict(dict)
    dump("scoring_fused_chunk",
      graft.scoring.Scoring.scoreWithRepsFused(cand, txtIds, med, w, bc))

    val scored = graft.scoring.Scoring.scoreWithRepsFused(cand, txtIds, med, w, bc)
      .localCheckpoint(true)
    val edges = scored.where(col("is_match")).select(col("doc_a").as("src"), col("doc_b").as("dst"))
    dump("cc_edge_dedup",
      edges.select(least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst"))
        .where(col("src") =!= col("dst")).distinct())
    val cc = graft.cluster.ConnectedComponents.run(edges, docs.select("doc_id"))
    val assign = cc.assignments.localCheckpoint(true)
    dump("attach_singletons", graft.cluster.Attach.attachSingletons(assign, scored))
    spark.stop()
  }
}
