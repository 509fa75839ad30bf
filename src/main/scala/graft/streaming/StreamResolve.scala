package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Streaming identity resolution — the online face of
  * [[graft.pipeline.Pipeline.runDelta]]: every micro-batch of new docs
  * is an increment resolved against the chain of all previous batches,
  * so the clusters table is continuously maintained without ever
  * re-blocking/re-scoring the corpus (reference analog: the realtime
  * assignment path layered over the batch resolver,
  * src/api/realtime_api.py — re-expressed as Structured Streaming over
  * the SAME batch operator rather than a separate serving engine).
  *
  * Layout under `chainDir`:
  *   - `corpus/b<batchId>/` — each batch's docs, appended idempotently
  *     (overwrite of the batch's own subdir), so the resolved corpus is
  *     the multi-path read of `corpus/ * /`;
  *   - `runs/b<batchId>/` — the increment's delta run dir; chains off
  *     `runs/b<batchId-1>` (or `baseRunDir` for the first batch).
  *   - `clusters` of the LATEST run dir is the continuously-maintained
  *     resolution result ([[latestClusters]]).
  *
  * Exactly-once story: foreachBatch may replay the last uncommitted
  * batch after a failure. Every piece of per-batch work is idempotent —
  * the corpus write overwrites the batch's own subdir, and the delta
  * run dir's stages are `_SUCCESS`-gated (a replayed batch RESUMES the
  * half-finished delta instead of recomputing or double-counting).
  * Empty batches are skipped (no chain link, no corpus dir). A replay
  * is only idempotent when it carries the SAME rows — batch ids restart
  * at 0 under a fresh `checkpointLocation`, so each chain link carries
  * a `_batch_pin` (count + doc_id hash fold) and a different batch
  * arriving under an existing id fails loudly instead of silently
  * resuming the old batch's result (see [[resolveBatch]]).
  *
  * The stream must deliver each doc exactly once across batches
  * (runDelta's upsert guard fails loudly otherwise — increments add
  * docs; retraction needs a re-baseline).
  */
object StreamResolve {

  /** Attach the resolving sink to a stream of docs (input-hint shape:
    * doc_id + spans). Caller starts/stops the returned writer. */
  def sink(
      docs: DataFrame,
      baseRunDir: String,
      chainDir: String,
      cfg: graft.pipeline.Pipeline.Cfg = graft.pipeline.Pipeline.Cfg()
  ): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        resolveBatch(batch, batchId, baseRunDir, chainDir, cfg)
      }

  /** One micro-batch = one chained increment. Public so a spec (or a
    * custom sink) can drive it directly. */
  def resolveBatch(
      batch: DataFrame,
      batchId: Long,
      baseRunDir: String,
      chainDir: String,
      cfg: graft.pipeline.Pipeline.Cfg
  ): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    // content pin: the _SUCCESS resume machinery makes a REPLAYED batch
    // idempotent, but batch ids restart at 0 when the stream is pointed
    // at a fresh checkpointLocation — and a different batch 0 against an
    // existing runs/b0 would first clobber corpus/b0, then resume b0's
    // completed delta and silently return the OLD batch's clusters. Pin
    // each chain link to its batch content (row count + order-free
    // xxhash64 fold of doc_id) and fail loudly on mismatch, the same
    // discipline as runDelta's _parents / run's _dictids markers. The
    // pin is checked BEFORE the corpus write so a mismatched restart
    // leaves the chain intact.
    val pinRow = batch.agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.bit_xor(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("doc_id")))).head()
    val pin = s"${pinRow.getLong(0)}:${pinRow.getLong(1)}"
    val runDir = s"$chainDir/runs/b$batchId"
    locally {
      val marker = java.nio.file.Paths.get(s"$runDir/_batch_pin")
      if (java.nio.file.Files.exists(marker)) {
        val prior = java.nio.file.Files.readString(marker).trim
        require(prior == pin,
          s"$runDir was built from a different batch $batchId (pin $prior, incoming $pin) — " +
            "the stream was restarted with a fresh checkpointLocation against an existing " +
            "chainDir; reuse the original checkpoint, or rebaseline() into a new chain")
      } else {
        java.nio.file.Files.createDirectories(marker.getParent)
        java.nio.file.Files.writeString(marker, pin)
      }
    }
    // idempotent corpus append: the batch owns its subdir
    val corpusDir = s"$chainDir/corpus/b$batchId"
    batch.write.mode("overwrite").parquet(corpusDir)

    // prior = the latest completed chain link below this batch id
    // (robust to skipped empty batches), else the base run
    val priorDir = latestRunBelow(chainDir, batchId).getOrElse(baseRunDir)
    // resolved corpus so far = every batch subdir below this one; the
    // base run's docs are read from its own persisted doc list via the
    // clusters table ONLY for ids, so the prior docs frame must come
    // from the caller-owned base corpus plus previous batches. We keep
    // the base corpus under chainDir too (seedCorpus) so the read is
    // one multi-path parquet scan.
    val priorPaths = corpusPathsBelow(chainDir, batchId)
    require(priorPaths.nonEmpty,
      s"$chainDir has no corpus below batch $batchId — call seedCorpus(baseDocs, chainDir) " +
        "with the base run's docs before starting the stream")
    val priorDocs = spark.read.parquet(priorPaths: _*)
    graft.pipeline.Pipeline.runDelta(spark, priorDocs, batch, priorDir, runDir, cfg)
  }

  /** Persist the base run's docs as the chain's corpus seed (subdir
    * `corpus/base`); call once before starting the stream. */
  def seedCorpus(baseDocs: DataFrame, chainDir: String): Unit =
    baseDocs.write.mode("overwrite").parquet(s"$chainDir/corpus/base")

  /** Re-baseline: compact the chain into a fresh full run — refreshes
    * the frozen prior-pair statistics, collapses the keys_new chain and
    * the attach evidence walk back to single tables, and bounds chain
    * length. An OFFLINE operation between stream restarts (stop the
    * query, rebaseline, restart the sink with the returned dir as
    * `baseRunDir`): the full run reads the whole corpus (`corpus/ * /`),
    * runs with `persistForDelta = true` into `chainDir/base_r<n>`,
    * archives `runs/` to `runs_before_r<n>/`, and re-seeds the corpus
    * as a single subdir. Returns the new base run dir. */
  def rebaseline(
      spark: SparkSession,
      chainDir: String,
      cfg: graft.pipeline.Pipeline.Cfg = graft.pipeline.Pipeline.Cfg()
  ): String = {
    val gen = Iterator.from(0)
      .map(n => new java.io.File(s"$chainDir/base_r$n"))
      .dropWhile(_.exists()).next()
    val corpus = spark.read.parquet(s"$chainDir/corpus/*")
    graft.pipeline.Pipeline.run(
      spark, corpus, gen.getAbsolutePath, cfg.copy(persistForDelta = true))
    // archive the superseded chain links; future batches chain from the
    // new base (pass it as baseRunDir when restarting the sink)
    val runs = new java.io.File(s"$chainDir/runs")
    if (runs.exists())
      require(runs.renameTo(new java.io.File(s"$chainDir/runs_before_${gen.getName.stripPrefix("base_")}")),
        s"could not archive $runs")
    // compact the corpus to one subdir (idempotent overwrite), so the
    // next rebaseline's multi-path read stays bounded
    val compact = corpus.localCheckpoint(true)
    val corpusRoot = new java.io.File(s"$chainDir/corpus")
    compact.write.mode("overwrite").parquet(s"$chainDir/corpus_next/base")
    org.apache.commons.io.FileUtils.deleteQuietly(corpusRoot)
    require(new java.io.File(s"$chainDir/corpus_next").renameTo(corpusRoot),
      "could not swap compacted corpus into place")
    gen.getAbsolutePath
  }

  /** The continuously-maintained clusters table (latest chain link). */
  def latestClusters(spark: SparkSession, chainDir: String, baseRunDir: String): DataFrame = {
    val dir = latestRunBelow(chainDir, Long.MaxValue).getOrElse(baseRunDir)
    spark.read.parquet(s"$dir/clusters")
  }

  private def latestRunBelow(chainDir: String, batchId: Long): Option[String] = {
    val runs = new java.io.File(s"$chainDir/runs")
    Option(runs.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("b"))
      .flatMap(f => scala.util.Try(f.getName.stripPrefix("b").toLong).toOption.map(_ -> f))
      .filter { case (id, f) => id < batchId && new java.io.File(f, "clusters/_SUCCESS").exists() }
      .sortBy(_._1).lastOption.map(_._2.getAbsolutePath)
  }

  private def corpusPathsBelow(chainDir: String, batchId: Long): Seq[String] = {
    val corpus = new java.io.File(s"$chainDir/corpus")
    Option(corpus.listFiles()).toSeq.flatten
      .filter(_.isDirectory)
      .filter { f =>
        f.getName == "base" ||
          scala.util.Try(f.getName.stripPrefix("b").toLong).toOption.exists(_ < batchId)
      }
      .map(_.getAbsolutePath)
  }
}
