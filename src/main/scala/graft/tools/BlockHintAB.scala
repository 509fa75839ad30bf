package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, xxhash64}
import graft.blocking.Blocking

/** Interleaved A/B of the stage-B join strategy and witness dedup
  * (round 6): candidatesFromKeys with SHUFFLE_HASH hints vs planner
  * default, same JVM/window, noop sink (guide §1.4). Also reports the
  * struct-min (pre-round-6 SortAggregate) formulation as a third
  * variant so the dedup change is measured in isolation.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.BlockHintAB [reps]"
  */
object BlockHintAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
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

    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { cpuNs.addAndGet(m.executorCpuTime); gcMs.addAndGet(m.jvmGCTime) }
      }
    })

    val (docsPath, _) = graft.schema.Fixture.ensureWritten(spark, "bench")
    val docs = spark.read.parquet(docsPath).withColumn("doc_id", xxhash64(col("doc_id")))
    val keys = Blocking.docKeys(docs, Blocking.Cfg()).localCheckpoint(true)

    /** struct-min reference (the pre-round-6 shape, for isolation). */
    def structMin(): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions._
      val cfg = Blocking.Cfg()
      val kept = keys
        .join(Blocking.blockSizes(keys).where(col("block_n") <= cfg.maxBlockSize), Seq("key_kind", "block_key"))
        .select("key_kind", "block_key", "doc_id")
      val a = kept.select(col("key_kind"), col("block_key"), col("doc_id").as("doc_a"))
      val b = kept.select(col("key_kind"), col("block_key"), col("doc_id").as("doc_b"))
      a.join(b, Seq("key_kind", "block_key"))
        .where(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(min(struct(col("key_kind"), col("block_key"))).as("w"))
        .select(col("doc_a"), col("doc_b"), col("w.key_kind").as("key_kind"),
          col("w.block_key").as("block_key"),
          pmod(xxhash64(col("doc_a"), col("doc_b")), lit(cfg.salts)).cast("int").as("salt"))
        .repartitionByRange(col("doc_a"), col("salt"))
    }

    def once(variant: String): (Double, Double, Double) = {
      cpuNs.set(0); gcMs.set(0)
      val t0 = System.nanoTime()
      (variant match {
        case "structmin" => structMin()
        case hint => Blocking.candidatesFromKeys(keys, Blocking.Cfg(joinHint = hint))
      }).write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, cpuNs.get / 1e9, gcMs.get / 1e3)
    }

    val variants = Seq("shuffle_hash", "none", "structmin")
    variants.foreach(once) // untimed warmup
    for (r <- 1 to reps; v <- variants) {
      val (wall, cpu, gc) = once(v)
      println(f"[ab] rep=$r variant=$v%-13s wall=$wall%7.2f s  cpu=$cpu%8.1f core-s  gc=$gc%6.1f s")
    }
    spark.stop()
  }
}
