package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.schema.{Doc, Fixture}
import graft.pipeline.Pipeline
import graft.streaming.StreamResolve
import java.nio.file.Files

/** Streaming incremental resolution (StreamResolve): two micro-batches
  * of new docs over a resolved base must leave the SAME clusters table
  * as one full run over everything (df-threshold-free weights — the
  * same exactness regime as PipelineDeltaSpec's chained test), and a
  * replayed micro-batch (foreachBatch's failure semantics) must resume
  * idempotently rather than recompute or double-count.
  */
class StreamResolveSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val docs = Fixture.docs(spark, Fixture.scales("t1")).cache()
  private def part(m: Int) = docs.where(pmod(xxhash64(col("doc_id")), lit(5)) === m)
  private lazy val docsA = docs.where(pmod(xxhash64(col("doc_id")), lit(5)) < 3)

  private def dir(tag: String) = Files.createTempDirectory(s"graft_stream_resolve_$tag").toString

  private val w = graft.scoring.Scoring.Weights(maxDfFrac = 1.0)
  private val cfg = Pipeline.Cfg(weights = w)

  private def assertSameRows(a: DataFrame, b: DataFrame, what: String): Unit = {
    val cols = a.columns.sorted.map(col).toSeq
    val (x, y) = (a.select(cols: _*), b.select(cols: _*))
    val extra = x.exceptAll(y).count()
    val missing = y.exceptAll(x).count()
    assert(extra == 0 && missing == 0, s"$what: extra=$extra missing=$missing")
  }

  test("two streamed increments == one full run; replayed batch resumes idempotently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val baseDir = dir("base")
    Pipeline.run(spark, docsA.toDF(), baseDir, Pipeline.Cfg(weights = w, persistForDelta = true))

    val chainDir = dir("chain")
    StreamResolve.seedCorpus(docsA.toDF(), chainDir)

    val in = MemoryStream[Doc]
    val q = StreamResolve
      .sink(in.toDF(), baseDir, chainDir, cfg)
      .option("checkpointLocation", dir("ckpt"))
      .start()
    try {
      in.addData(part(3).collect().toSeq) // batch 0
      q.processAllAvailable()
      in.addData(part(4).collect().toSeq) // batch 1
      q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamResolve.latestClusters(spark, chainDir, baseDir)
    val full = Pipeline.run(spark, docs.toDF(), dir("full"), cfg)
    assertSameRows(streamed, full.clusters, "streamed clusters")

    // replay the LAST batch (foreachBatch redelivers after a failure):
    // every stage is _SUCCESS-complete, so the replay must resume to an
    // identical clusters table without recomputation or upsert errors
    StreamResolve.resolveBatch(part(4).toDF(), 1L, baseDir, chainDir, cfg)
    assertSameRows(
      StreamResolve.latestClusters(spark, chainDir, baseDir),
      full.clusters,
      "replayed clusters")

    // a DIFFERENT batch arriving under an existing id (the signature of
    // a restart with a fresh checkpointLocation — batch ids reset to 0)
    // must fail loudly BEFORE touching the chain, not silently resume
    // the old batch's completed delta
    val ex = intercept[IllegalArgumentException] {
      StreamResolve.resolveBatch(part(3).toDF(), 1L, baseDir, chainDir, cfg)
    }
    assert(ex.getMessage.contains("different batch"), ex.getMessage)
    assertSameRows(
      spark.read.parquet(s"$chainDir/corpus/b1"), part(4).toDF(),
      "corpus b1 after pin mismatch")
    assertSameRows(
      StreamResolve.latestClusters(spark, chainDir, baseDir), full.clusters,
      "clusters after pin mismatch")

    // the chain did delta-sized work: batch-1 candidates all touch a
    // batch-1 doc
    val cand1 = spark.read.parquet(s"$chainDir/runs/b1/candidates")
    val b1ids = part(4).toDF().select(col("doc_id"))
    val nid = (c: String) => xxhash64(col(c)) // runDelta default hash id space
    val untouched = cand1
      .join(b1ids.select(nid("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
      .join(b1ids.select(nid("doc_id").as("doc_b")), Seq("doc_b"), "left_anti")
      .count()
    assert(untouched == 0, s"$untouched batch-1 candidate pairs touch no batch-1 doc")
  }

  test("rebaseline compacts the chain offline and the stream continues from the new base") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docsA2 = docs.where(pmod(xxhash64(col("doc_id")), lit(5)) < 2)
    val baseDir = dir("rb_base")
    Pipeline.run(spark, docsA2.toDF(), baseDir, Pipeline.Cfg(weights = w, persistForDelta = true))
    val chainDir = dir("rb_chain")
    StreamResolve.seedCorpus(docsA2.toDF(), chainDir)

    // first stream segment: one increment, then stop
    val in1 = MemoryStream[graft.schema.Doc]
    val q1 = StreamResolve.sink(in1.toDF(), baseDir, chainDir, cfg)
      .option("checkpointLocation", dir("rb_ck1")).start()
    try { in1.addData(part(2).collect().toSeq); q1.processAllAvailable() } finally q1.stop()

    // offline compaction: chain links archived, corpus compacted, and
    // the new base IS a full run over everything so far
    val newBase = StreamResolve.rebaseline(spark, chainDir, cfg)
    assert(!new java.io.File(s"$chainDir/runs").exists(), "runs/ not archived")
    val fullSoFar = Pipeline.run(
      spark, docsA2.unionByName(part(2)).toDF(), dir("rb_full1"), cfg)
    assertSameRows(
      spark.read.parquet(s"$newBase/clusters"), fullSoFar.clusters, "rebaselined clusters")

    // second stream segment chains from the new base
    val in2 = MemoryStream[graft.schema.Doc]
    val q2 = StreamResolve.sink(in2.toDF(), newBase, chainDir, cfg)
      .option("checkpointLocation", dir("rb_ck2")).start()
    try { in2.addData(part(3).collect().toSeq); q2.processAllAvailable() } finally q2.stop()

    val full = Pipeline.run(
      spark, docs.where(pmod(xxhash64(col("doc_id")), lit(5)) < 4).toDF(), dir("rb_full2"), cfg)
    assertSameRows(
      StreamResolve.latestClusters(spark, chainDir, newBase),
      full.clusters,
      "post-rebaseline streamed clusters")
  }
}
