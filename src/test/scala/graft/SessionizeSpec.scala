package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Sessionize
import graft.streaming.Sessionize.Event
import java.sql.Timestamp

class SessionizeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000)

  private val events = Seq(
    Event("a1", "d1", ts(0), 10.0),
    Event("a1", "d1", ts(10), 5.0),
    Event("a1", "d1", ts(20), 5.0),
    Event("a1", "d1", ts(60), 7.0),  // gap 40 min -> new session
    Event("a1", "d2", ts(0), 2.0),   // different device -> own session
    Event("a2", "d1", ts(5), 3.0)
  )

  test("batch session_window splits on the 30-minute gap per (account, device)") {
    import spark.implicits._
    val out = Sessionize.sessionWindows(events.toDF()).collect()
    assert(out.length == 4)
    val a1d1 = out.filter(r => r.getString(0) == "a1" && r.getString(1) == "d1").sortBy(_.getAs[Timestamp]("start_ts").getTime)
    assert(a1d1.length == 2)
    assert(a1d1(0).getAs[Long]("n_events") == 3)
    assert(a1d1(0).getAs[Double]("total_duration") == 20.0)
    assert(a1d1(1).getAs[Long]("n_events") == 1)
  }

  test("incremental flatMapGroupsWithState sessionizer matches batch semantics over a stream") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Sessionize.incremental(mem.toDS())
      .writeStream.format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      mem.addData(events.take(3): _*) // one open session
      q.processAllAvailable()
      mem.addData(events.drop(3): _*) // gap event closes first session
      q.processAllAvailable()
      val closed = spark.table("sessions_out").collect()
      // first a1/d1 session must have closed with 3 events, 20.0 duration
      val s = closed.filter(r => r.getString(0) == "a1" && r.getString(1) == "d1")
      assert(s.length == 1, s"expected exactly the first a1/d1 session closed, got ${closed.mkString(";")}")
      assert(s(0).getAs[Long]("n_events") == 3)
      assert(s(0).getAs[Double]("total_duration") == 20.0)
      assert(s(0).getAs[String]("session_id").length == 16)
    } finally q.stop()
  }

  test("streaming session_window + watermark emits a session once event time passes the gap") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Sessionize.sessionWindows(mem.toDF())
      .writeStream.format("memory").queryName("sw_out").outputMode("append").start()
    try {
      mem.addData(events.take(3): _*) // open session, watermark at ts(20) - 30min
      q.processAllAvailable()
      assert(spark.table("sw_out").isEmpty, "session must stay open before the watermark passes")
      // event an hour later moves the watermark past the first session's close
      mem.addData(Event("a9", "d9", ts(120), 1.0))
      q.processAllAvailable()
      val closed = spark.table("sw_out")
        .filter(col("account_id") === "a1" && col("device") === "d1").collect()
      assert(closed.length == 1 && closed(0).getAs[Long]("n_events") == 3
        && closed(0).getAs[Double]("total_duration") == 20.0)
    } finally q.stop()
  }

  test("stateful operators run on the RocksDB state store (the production spill-to-disk provider)") {
    // at 10^9 accounts the per-group state lives off-heap/on-disk in
    // RocksDB, not the default in-memory HDFS-backed store — prove the
    // operator works unchanged on that provider (rocksdbjni ships with
    // Spark; the provider is read from the session conf at query start)
    import spark.implicits._
    implicit val sql = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val q = Sessionize.incremental(mem.toDS())
      .writeStream.format("memory").queryName("sessions_rocks").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_rocks_ckpt").toString)
      .start()
    try {
      mem.addData(events.take(3): _*)
      q.processAllAvailable()
      mem.addData(events.drop(3): _*)
      q.processAllAvailable()
      val closed = spark.table("sessions_rocks")
        .filter(col("account_id") === "a1" && col("device") === "d1").collect()
      assert(closed.length == 1 && closed(0).getAs[Long]("n_events") == 3)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
