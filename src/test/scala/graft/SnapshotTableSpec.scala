package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable
import java.nio.file.Files

/** Snapshot-table semantics (the Iceberg-analog commit discipline):
  * data-first/manifest-last commits, time travel, metadata-only
  * rollback, loud optimistic-concurrency failure. */
class SnapshotTableSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def dir() = Files.createTempDirectory("graft_snap").toString

  test("write/read/time-travel/rollback round-trip; rollback copies no data") {
    import spark.implicits._
    val root = dir()
    val v0 = SnapshotTable.write(Seq((1, "a"), (2, "b")).toDF("id", "s"), root, "initial")
    val v1 = SnapshotTable.write(Seq((1, "a"), (2, "B"), (3, "c")).toDF("id", "s"), root, "update")
    assert(v0 == 0 && v1 == 1)

    assert(SnapshotTable.read(spark, root).count() == 3)
    assert(SnapshotTable.readAsOf(spark, root, 0).count() == 2)
    assert(SnapshotTable.readAsOf(spark, root, 0)
      .where(col("s") === "B").count() == 0, "time travel leaked the update")

    val v2 = SnapshotTable.rollback(root, 0)
    assert(v2 == 2)
    // latest now reads v0's rows...
    val latest = SnapshotTable.read(spark, root)
    assert(latest.count() == 2 && latest.where(col("s") === "B").count() == 0)
    // ...through v0's FILES (metadata-only: no new data dir appeared,
    // and the rollback manifest points at v0's exact dir)
    val dataDirs = new java.io.File(s"$root/data").listFiles().map(_.getName).toSet
    assert(dataDirs.size == 2, s"rollback copied data: $dataDirs")
    val dirByV = SnapshotTable.history(spark, root)
      .select("version", "data_dir").as[(Int, String)].collect().toMap
    assert(dirByV(2) == dirByV(0), "rollback manifest does not reuse v0's data dir")
    assert(dirByV(0) != dirByV(1), "snapshots must not share data dirs")
    // history intact: v1 still time-travels
    assert(SnapshotTable.readAsOf(spark, root, 1).count() == 3)
    assert(SnapshotTable.history(spark, root).count() == 3)
  }

  test("partition-spec evolution: new spec from this snapshot forward, old snapshots keep theirs, pruning works") {
    import spark.implicits._
    val root = dir()
    val rows = Seq((1, "us", "x"), (2, "us", "y"), (3, "de", "z")).toDF("id", "country", "s")
    // v0 unpartitioned; v1 evolves the spec; v2 INHERITS it silently
    SnapshotTable.write(rows, root, "initial")
    SnapshotTable.write(rows, root, "partitioned", partitionBy = Some(Seq("country")))
    SnapshotTable.write(rows.withColumn("s", upper(col("s"))), root, "inherit")
    assert(SnapshotTable.currentSpec(root) == Seq("country"))
    assert(SnapshotTable.history(spark, root).select("spec").as[String].collect().toSeq
      == Seq("", "country", "country"))

    // layout: v1/v2 have Hive partition dirs, v0 does not (data dirs
    // are unique per write attempt — resolve them through the manifest)
    val dataDirOf = SnapshotTable.history(spark, root)
      .select("version", "data_dir").as[(Int, String)].collect().toMap
    def dirs(v: Int) = new java.io.File(s"$root/${dataDirOf(v)}").listFiles().map(_.getName).toSet
    assert(!dirs(0).exists(_.startsWith("country=")))
    assert(dirs(1).filter(_.startsWith("country=")) == Set("country=us", "country=de"))

    // logical schema is layout-independent: same column order across specs
    assert(SnapshotTable.readAsOf(spark, root, 0).columns.toSeq == Seq("id", "country", "s"))
    assert(SnapshotTable.readAsOf(spark, root, 1).columns.toSeq == Seq("id", "country", "s"))

    // a partition filter prunes at planning time on the partitioned snapshot
    val pruned = SnapshotTable.read(spark, root).where(col("country") === "us")
    assert(pruned.as[(Int, String, String)].collect().map(_._3).sorted.toSeq == Seq("X", "Y"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("country"),
      s"partition filter did not reach the scan:\n$plan")
    // rollback to the unpartitioned snapshot carries ITS spec back
    SnapshotTable.rollback(root, 0)
    assert(SnapshotTable.currentSpec(root).isEmpty)
    assert(SnapshotTable.read(spark, root).columns.toSeq == Seq("id", "country", "s"))
  }

  test("schema evolution: added column appears from its snapshot forward, time travel keeps old schema") {
    import spark.implicits._
    val root = dir()
    SnapshotTable.write(Seq((1, "a")).toDF("id", "s"), root, "v0")
    SnapshotTable.write(Seq((1, "a", 0.5)).toDF("id", "s", "score"), root, "add score")
    assert(SnapshotTable.readAsOf(spark, root, 0).columns.toSeq == Seq("id", "s"))
    assert(SnapshotTable.read(spark, root).columns.toSeq == Seq("id", "s", "score"))
    // dropped column likewise: a later snapshot without `s`
    SnapshotTable.write(Seq((1, 0.7)).toDF("id", "score"), root, "drop s")
    assert(SnapshotTable.read(spark, root).columns.toSeq == Seq("id", "score"))
    assert(SnapshotTable.readAsOf(spark, root, 1).columns.toSeq == Seq("id", "s", "score"))
  }

  test("expireSnapshots keeps time travel to retained versions and refcounts shared data dirs") {
    import spark.implicits._
    val root = dir()
    SnapshotTable.write(Seq((1, "a")).toDF("id", "s"), root, "v0")       // v0
    SnapshotTable.write(Seq((1, "b")).toDF("id", "s"), root, "v1")       // v1
    SnapshotTable.rollback(root, 0)                                      // v2 -> shares v0's dataDir
    SnapshotTable.write(Seq((1, "c")).toDF("id", "s"), root, "v3")       // v3

    // keep v2,v3: v0's manifest expires but its DATA must survive —
    // the retained rollback snapshot v2 still reads those files
    val (expired, deleted) = SnapshotTable.expireSnapshots(root, keepLast = 2)
    assert(expired == Seq(0, 1))
    assert(deleted.length == 1, s"only v1's unshared dir should go: $deleted")
    assert(SnapshotTable.versions(root) == Seq(2, 3))
    assert(SnapshotTable.readAsOf(spark, root, 2).select("s").as[String].collect().toSeq == Seq("a"),
      "rollback snapshot lost its shared files")
    assert(SnapshotTable.read(spark, root).select("s").as[String].collect().toSeq == Seq("c"))
    intercept[IllegalArgumentException](SnapshotTable.readAsOf(spark, root, 0))
    // idempotent + tip always retained
    assert(SnapshotTable.expireSnapshots(root, keepLast = 2) == ((Nil, Nil)))
    intercept[IllegalArgumentException](SnapshotTable.expireSnapshots(root, keepLast = 0))
  }

  test("tags pin snapshots by name, survive expiry, and are immutable") {
    import spark.implicits._
    val root = dir()
    SnapshotTable.write(Seq((1, "a")).toDF("id", "s"), root, "v0")
    SnapshotTable.write(Seq((1, "b")).toDF("id", "s"), root, "v1")
    SnapshotTable.write(Seq((1, "c")).toDF("id", "s"), root, "v2")
    SnapshotTable.tag(root, "audited-2026q3", 0)

    assert(SnapshotTable.readTag(spark, root, "audited-2026q3")
      .select("s").as[String].collect().toSeq == Seq("a"))
    intercept[IllegalStateException](SnapshotTable.tag(root, "audited-2026q3", 1))
    intercept[IllegalArgumentException](SnapshotTable.tag(root, "ghost", 99))

    // keepLast=1 would expire v0 and v1 — the tag pins v0 (manifest AND
    // data), only v1 goes
    val (expired, _) = SnapshotTable.expireSnapshots(root, keepLast = 1)
    assert(expired == Seq(1))
    assert(SnapshotTable.versions(root) == Seq(0, 2))
    assert(SnapshotTable.readTag(spark, root, "audited-2026q3").count() == 1)

    // dropped tag releases the pin on the next expiry
    SnapshotTable.dropTag(root, "audited-2026q3")
    assert(SnapshotTable.expireSnapshots(root, keepLast = 1)._1 == Seq(0))
    assert(SnapshotTable.versions(root) == Seq(2))
  }

  test("compact rewrites the tip into fewer files with identical rows, as a new snapshot") {
    import spark.implicits._
    val root = dir()
    // a streaming writer's residue: 8 tasks -> 8 small files
    SnapshotTable.write(
      spark.range(100).repartition(8).select(col("id"), (col("id") % 7).as("k")), root, "frag")
    val before = new java.io.File(s"$root/data").listFiles().head
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(before == 8, s"fixture should fragment into 8 files, got $before")

    val v = SnapshotTable.compact(spark, root, targetFiles = 1)
    assert(v == 1)
    val dirByV = SnapshotTable.history(spark, root)
      .select("version", "data_dir").as[(Int, String)].collect().toMap
    val after = new java.io.File(s"$root/${dirByV(1)}")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == 1, s"compaction left $after files")
    // identical rows + schema; the un-compacted snapshot is still readable
    assert(SnapshotTable.read(spark, root).orderBy("id").collect().toSeq ==
      SnapshotTable.readAsOf(spark, root, 0).orderBy("id").collect().toSeq)
  }

  test("deleteWhere + expire + orphan sweep is the physical-erasure pipeline") {
    import spark.implicits._
    val root = dir()
    SnapshotTable.write(
      Seq(("u1", "keep"), ("u2", "erase-me"), ("u3", "keep"), (null, "keep-null"))
        .toDF("user", "payload"), root, "v0")

    // copy-on-write delete: tip loses the MATCHING rows only — SQL
    // DELETE removes rows where the predicate is TRUE, so the
    // NULL-user row (predicate evaluates to NULL) must survive
    val v1 = SnapshotTable.deleteWhere(spark, root, col("user") === "u2")
    assert(v1 == 1)
    assert(SnapshotTable.read(spark, root).where(col("user") === "u2").count() == 0)
    assert(SnapshotTable.read(spark, root).count() == 3,
      "a NULL-valued predicate row was silently deleted")
    assert(SnapshotTable.readAsOf(spark, root, 0).where(col("user") === "u2").count() == 1,
      "history must keep the row until expiry")

    // expiry + orphan sweep make the erasure physical: no parquet file
    // under the table still contains the erased value
    SnapshotTable.expireSnapshots(root, keepLast = 1)
    SnapshotTable.removeOrphanFiles(root)
    val remaining = spark.read.parquet(s"$root/data/*")
    assert(remaining.where(col("user") === "u2").count() == 0,
      "erased rows survived physically after expiry")
    assert(remaining.count() == 3)
  }

  test("removeOrphanFiles deletes only unreferenced dirs older than the threshold") {
    import spark.implicits._
    val root = dir()
    SnapshotTable.write(Seq(1).toDF("id"), root, "live")
    // a crashed writer's residue: data committed, manifest never linked
    Seq(2).toDF("id").write.parquet(s"$root/data/v9-deadbeef")

    // default 24 h threshold spares the young dir — it is
    // indistinguishable from an IN-FLIGHT writer's dir
    assert(SnapshotTable.removeOrphanFiles(root).isEmpty,
      "a young orphan must be spared (could be an in-flight writer)")

    // age the orphan past the cutoff; the live dir stays untouchable
    // whatever its age
    Files.setLastModifiedTime(java.nio.file.Paths.get(s"$root/data/v9-deadbeef"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 48L * 3600 * 1000))
    val gone = SnapshotTable.removeOrphanFiles(root)
    assert(gone == Seq("data/v9-deadbeef"))
    assert(SnapshotTable.read(spark, root).count() == 1, "orphan cleanup touched live data")
    assert(SnapshotTable.removeOrphanFiles(root, olderThanMillis = 0).isEmpty)
  }

  test("concurrent commit of the same version fails loudly; crashed writer leaves no snapshot") {
    import spark.implicits._
    val root = dir()
    SnapshotTable.write(Seq(1).toDF("id"), root)
    // simulate a concurrent committer that took v1 between our version
    // pick and our manifest rename: drive the commit step directly at a
    // version that just got taken
    val race = new java.io.File(s"$root/_manifests/v1.json")
    Files.writeString(race.toPath, """{"version":"1","dataDir":"data/v1","parent":"0","note":"racer"}""")
    val e = intercept[IllegalStateException] {
      SnapshotTable.commit(root, 1, "data/v1b", parent = 0, note = "loser")
    }
    assert(e.getMessage.contains("concurrent"))
    // the racer's manifest is untouched by the failed commit
    assert(Files.readString(race.toPath).contains("racer"))
    // a data dir without a manifest (crashed writer) is invisible
    val orphan = dir()
    Seq(1).toDF("id").write.parquet(s"$orphan/data/v0")
    assert(SnapshotTable.versions(orphan).isEmpty)
    intercept[IllegalArgumentException](SnapshotTable.read(spark, orphan))
  }
}
