package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.Doc
import java.sql.Timestamp

class StreamDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000)

  test("streaming exact dedup drops within-watermark duplicates, matches batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val docs = Seq(
      Doc("a", "the quick brown fox", ts(0)),
      Doc("b", "  The   QUICK brown fox ", ts(1)), // same after normalization
      Doc("c", "something else entirely", ts(2)),
      Doc("d", "the quick brown fox", ts(3))       // dup again
    )
    val mem = MemoryStream[Doc]
    val q = StreamDedup.exact(mem.toDF())
      .writeStream.format("memory").queryName("sd_exact").outputMode("append").start()
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val kept = spark.table("sd_exact").select("doc_id").collect().map(_.getString(0)).sorted
      assert(kept.toSeq == Seq("a", "c"), kept.mkString(","))
      // batch path: same contract on a static frame
      val batch = StreamDedup.exact(docs.toDF())
        .select("doc_id").collect().map(_.getString(0)).sorted
      assert(batch.toSeq == Seq("a", "c"))
      // adversarial layout: rows reversed and spread over partitions —
      // dropDuplicates would keep whichever row wins the shuffle race;
      // the first-arrival contract must still keep the (ts, doc_id) min
      val scrambled = StreamDedup.exact(docs.reverse.toDF().repartition(4))
        .select("doc_id").collect().map(_.getString(0)).sorted
      assert(scrambled.toSeq == Seq("a", "c"), scrambled.mkString(","))
    } finally q.stop()
  }

  test("near-dup band claims flag a lightly-edited copy across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // simhash needs many tokens for stable bit votes (vote margins are
    // O(√n)) — 300-token docs, same regime as the batch OpsSpec test
    val rnd = new scala.util.Random(3)
    def sentence() =
      (0 until 300).map(_ => s"w${rnd.nextInt(900000)}").mkString(" ")
    val original = sentence()
    val edited = original.split(" ").updated(5, "changedword").mkString(" ")
    val unrelated1 = sentence()
    val unrelated2 = sentence()

    val mem = MemoryStream[Doc]
    val q = StreamDedup.nearDupVerdicts(mem.toDS(), maxHamming = 16)
      .writeStream.format("memory").queryName("sd_near").outputMode("append").start()
    try {
      mem.addData(Doc("orig", original, ts(0)), Doc("u1", unrelated1, ts(1)))
      q.processAllAvailable()
      mem.addData(Doc("copy", edited, ts(5)), Doc("u2", unrelated2, ts(6)))
      q.processAllAvailable()
      val verdicts = spark.table("sd_near")
        .select("doc_id", "dup_of").distinct().collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(verdicts.contains(("copy", "orig")), verdicts.mkString(";"))
      val flagged = verdicts.map(_._1).toSet
      assert(!flagged.contains("u1") && !flagged.contains("u2"), verdicts.mkString(";"))
    } finally q.stop()
  }

  test("band claims expire with the event-time horizon — stale dups are not flagged") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(9)
    val original = (0 until 300).map(_ => s"w${rnd.nextInt(900000)}").mkString(" ")

    val mem = MemoryStream[Doc]
    // 60 s horizon: the claim from ts(0) must be gone once the
    // watermark (max event time − 60 s) passes ts(0) + 60 s
    val q = StreamDedup.nearDupVerdicts(mem.toDS(), maxHamming = 16, horizonSec = 60L)
      .writeStream.format("memory").queryName("sd_exp").outputMode("append").start()
    try {
      mem.addData(Doc("orig", original, ts(0)))
      q.processAllAvailable()
      mem.addData(Doc("mover", "advance the watermark only", ts(10)))
      q.processAllAvailable() // watermark -> ts(9 min); claim timed out
      mem.addData(Doc("copy", original, ts(9)))
      q.processAllAvailable()
      val flagged = spark.table("sd_exp").select("doc_id").collect().map(_.getString(0)).toSet
      assert(!flagged.contains("copy"), flagged.mkString(","))
    } finally q.stop()
  }
}
