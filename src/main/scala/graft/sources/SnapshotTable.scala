package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Snapshot-versioned parquet table — the honest stand-in for the
  * Iceberg runtime behaviors the north rule names (snapshot log,
  * time-travel reads, metadata-only rollback) in a sandbox that ships
  * no Iceberg jars. Same metadata discipline at miniature scale:
  *
  *   root/_manifests/v<N>.json   one line: version, dataDir, parent,
  *                               note — the snapshot log
  *   root/data/v<N>/             immutable parquet data files
  *
  * Iceberg semantics preserved:
  *   - a WRITER commits data first, manifest last, via atomic
  *     temp+hard-link of the manifest file — readers never observe a
  *     half-written snapshot, and a crashed writer leaves only an
  *     unreferenced data dir (Iceberg's orphan files);
  *   - optimistic concurrency: the link(2) create fails loudly if the
  *     version was taken by a concurrent committer;
  *   - ROLLBACK is metadata-only: a new snapshot whose dataDir points
  *     at the restored version's files — no data copy, history intact
  *     (Iceberg's `rollback_to_snapshot` creates a new metadata entry);
  *   - time travel: `readAsOf(version)` reads any retired snapshot.
  *
  * (reference analog: src/db/schema.sql versioned model tables +
  * the checkpoint/rollback flow in the model registry; Pipeline's
  * `_SUCCESS`-gated stage dirs are the same commit discipline one
  * level down.)
  */
object SnapshotTable {

  private def manifestDir(root: String) = Paths.get(root, "_manifests")

  /** Child names of `dir` (empty if absent). Files.list must be closed
    * (javadoc: try-with-resources) — every directory listing in this
    * object funnels through here, so a leak would be one dangling
    * directory fd per table operation. */
  private def listNames(dir: java.nio.file.Path): Seq[String] = {
    if (!Files.exists(dir)) Seq.empty
    else {
      val stream = Files.list(dir)
      try {
        val it = stream.iterator()
        Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
          .map(_.getFileName.toString).toSeq
      } finally stream.close()
    }
  }

  /** Committed versions, ascending. */
  def versions(root: String): Seq[Int] =
    listNames(manifestDir(root))
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt
      }.sorted

  private def manifest(root: String, v: Int): Map[String, String] = {
    val txt = Files.readString(manifestDir(root).resolve(s"v$v.json")).trim
    // flat single-level JSON of string/number fields — parsed without a
    // JSON lib dependency (written by `commit` below, shape is ours)
    txt.stripPrefix("{").stripSuffix("}").split(",(?=\")").map { kv =>
      val Array(k, value) = kv.split(":", 2)
      k.trim.stripPrefix("\"").stripSuffix("\"") ->
        value.trim.stripPrefix("\"").stripSuffix("\"")
    }.toMap
  }

  /** Atomically commit a manifest for `v`; fails loudly if a concurrent
    * committer took the version (optimistic concurrency).
    * Package-private so the spec can drive the collision path directly
    * (the version-pick-to-rename race window is not reachable from the
    * public API without a scheduler hook). */
  private[graft] def commit(root: String, v: Int, dataDir: String, parent: Int, note: String,
      spec: Seq[String] = Nil, cols: Seq[String] = Nil): Unit = {
    Files.createDirectories(manifestDir(root))
    val json =
      s"""{"version":"$v","dataDir":"$dataDir","parent":"$parent","spec":"${spec.mkString(",")}","cols":"${cols.mkString(",")}","note":"${note.replace("\"", "'")}"}"""
    val tmp = manifestDir(root).resolve(s".v$v.json.tmp${System.nanoTime()}")
    Files.writeString(tmp, json)
    val target = manifestDir(root).resolve(s"v$v.json")
    // hard-link, not rename: rename(2) silently REPLACES an existing
    // target, which would let a slow committer clobber the winner's
    // manifest; link(2) is atomic create-or-EEXIST — exactly the
    // optimistic-concurrency primitive a snapshot log needs
    try Files.createLink(target, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"snapshot v$v of $root was committed concurrently — retry against the new tip")
    } finally Files.deleteIfExists(tmp)
  }

  /** The partition spec future writes inherit (Iceberg: the table's
    * CURRENT spec; every snapshot keeps the spec it was written under). */
  def currentSpec(root: String): Seq[String] =
    versions(root).lastOption.toSeq
      .flatMap(v => manifest(root, v).getOrElse("spec", "").split(",").filter(_.nonEmpty))

  /** Write `df` as the next snapshot. Data first, manifest last.
    *
    * `partitionBy = None` inherits the table's current partition spec
    * (the common write path); `Some(cols)` EVOLVES the spec from this
    * snapshot forward — Iceberg's `ALTER TABLE ... PARTITIONED BY`:
    * earlier snapshots keep their own spec and layout, time travel
    * reads each under the spec it was written with (`Some(Nil)` drops
    * partitioning). The manifest also records the logical column order
    * so reads present the schema independent of the physical layout
    * (Hive-style partition dirs move partition columns last on disk).
    * Schema evolution needs no DDL here: each snapshot is a full
    * rewrite carrying its own parquet schema, so added/dropped columns
    * simply appear from this snapshot forward while time travel keeps
    * returning each snapshot's own schema. */
  def write(df: DataFrame, root: String, note: String = "",
      partitionBy: Option[Seq[String]] = None): Int = {
    val v = versions(root).lastOption.map(_ + 1).getOrElse(0)
    val spec = partitionBy.getOrElse(currentSpec(root))
    val missing = spec.filterNot(df.columns.contains)
    require(missing.isEmpty, s"partition spec columns absent from data: ${missing.mkString(",")}")
    // the data dir is UNIQUE per write attempt, not just per version:
    // two writers racing on the same v would otherwise both target
    // data/v<N>, and the loser's mode("overwrite") would clobber the
    // winner's ALREADY-COMMITTED files before its own manifest link
    // failed — the manifest's dataDir field makes uniqueness free, and
    // the loser's dir becomes exactly the documented orphan
    val dataDir = s"data/v$v-${java.util.UUID.randomUUID().toString.take(8)}"
    val w = df.write.mode("overwrite")
    (if (spec.nonEmpty) w.partitionBy(spec: _*) else w).parquet(s"$root/$dataDir")
    commit(root, v, dataDir, parent = v - 1, note = note, spec = spec, cols = df.columns.toSeq)
    v
  }

  /** Latest snapshot. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val vs = versions(root)
    require(vs.nonEmpty, s"$root has no committed snapshots")
    readAsOf(spark, root, vs.last)
  }

  /** Time travel: read snapshot `v` (current or retired) under the
    * spec and logical column order it was committed with. Partition
    * columns come back from the directory names (Hive layout), so
    * filters on them prune directories at planning time. */
  def readAsOf(spark: SparkSession, root: String, v: Int): DataFrame = {
    require(versions(root).contains(v), s"$root has no snapshot v$v")
    val m = manifest(root, v)
    val df = spark.read.parquet(s"$root/${m("dataDir")}")
    val cols = m.getOrElse("cols", "").split(",").filter(_.nonEmpty)
    if (cols.nonEmpty && cols.forall(df.columns.contains))
      df.select(cols.map(org.apache.spark.sql.functions.col).toSeq: _*)
    else df
  }

  /** Metadata-only rollback: commit a NEW snapshot pointing at
    * `toVersion`'s data files. No data copy; history stays intact. */
  def rollback(root: String, toVersion: Int): Int = {
    val vs = versions(root)
    require(vs.contains(toVersion), s"$root has no snapshot v$toVersion to roll back to")
    val v = vs.last + 1
    val m = manifest(root, toVersion)
    commit(root, v, m("dataDir"), parent = vs.last, note = s"rollback to v$toVersion",
      spec = m.getOrElse("spec", "").split(",").filter(_.nonEmpty).toSeq,
      cols = m.getOrElse("cols", "").split(",").filter(_.nonEmpty).toSeq)
    v
  }

  private def refsDir(root: String) = Paths.get(root, "_refs")

  /** Named refs (tags): name → pinned version. A ref dropped between
    * the listing and the read (concurrent [[dropTag]]) is skipped, not
    * an error. */
  def tags(root: String): Map[String, Int] =
    listNames(refsDir(root))
      .collect { case s if s.endsWith(".json") => s.stripSuffix(".json") }
      .flatMap { n =>
        scala.util.Try(Files.readString(refsDir(root).resolve(s"$n.json")).trim.toInt)
          .toOption.map(n -> _)
      }.toMap

  /** Pin `version` under an immutable named ref — Iceberg's snapshot
    * TAG. Same atomic create-or-fail discipline as a manifest commit:
    * a tag can be created once and never re-pointed (drop + re-create
    * is the explicit escape hatch). Tagged snapshots survive
    * [[expireSnapshots]] regardless of age. */
  def tag(root: String, name: String, version: Int): Unit = {
    require(versions(root).contains(version), s"$root has no snapshot v$version to tag")
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"tag name must be [A-Za-z0-9_-]+: '$name'")
    Files.createDirectories(refsDir(root))
    val tmp = refsDir(root).resolve(s".$name.tmp${System.nanoTime()}")
    Files.writeString(tmp, version.toString)
    try Files.createLink(refsDir(root).resolve(s"$name.json"), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"tag '$name' already exists on $root (tags are immutable — dropTag first)")
    } finally Files.deleteIfExists(tmp)
  }

  def dropTag(root: String, name: String): Unit =
    Files.deleteIfExists(refsDir(root).resolve(s"$name.json"))

  /** Time travel by name: read the snapshot a tag pins. */
  def readTag(spark: SparkSession, root: String, name: String): DataFrame = {
    val t = tags(root)
    require(t.contains(name), s"$root has no tag '$name' (tags: ${t.keys.toSeq.sorted.mkString(",")})")
    readAsOf(spark, root, t(name))
  }

  /** Expire snapshots, keeping the newest `keepLast` — Iceberg's
    * `expire_snapshots` maintenance procedure. Metadata first: drop the
    * expired manifests; then delete every data dir no RETAINED manifest
    * references. Reference counting matters because rollback snapshots
    * share their target's dataDir — expiring the original must not
    * delete files a live rollback snapshot still reads. Snapshots
    * pinned by a [[tag]] are retained whatever their age (Iceberg:
    * expire never removes ref'd snapshots). Time travel to retained
    * versions is untouched; `readAsOf` of an expired version fails
    * loudly (its manifest is gone). NOT safe to run concurrently with
    * commits: a rollback committed after the live set is computed could
    * reference a dir this call is deleting — real Iceberg serializes
    * maintenance against commits through the catalog; this miniature
    * has no catalog, so the caller owns that exclusion (the pipeline
    * runs maintenance from the single writer). Returns
    * (expired versions, deleted data dirs). */
  def expireSnapshots(root: String, keepLast: Int): (Seq[Int], Seq[String]) = {
    require(keepLast >= 1, "keepLast must be >= 1 (a table always retains its tip)")
    val vs = versions(root)
    val pinned = tags(root).values.toSet
    val expired = vs.dropRight(keepLast).filterNot(pinned)
    if (expired.isEmpty) return (Nil, Nil)
    val retained = vs.filterNot(expired.contains)
    val live = retained.map(v => manifest(root, v)("dataDir")).toSet
    val dead = expired.map(v => manifest(root, v)("dataDir")).distinct.filterNot(live)
    // manifests first: a reader that races this sees either a complete
    // snapshot (manifest + data) or no snapshot — never a manifest
    // whose data files are already gone
    expired.foreach(v => Files.deleteIfExists(manifestDir(root).resolve(s"v$v.json")))
    dead.foreach(d => deleteRecursively(Paths.get(root, d)))
    (expired, dead)
  }

  /** Delete data dirs no manifest references — Iceberg's
    * `remove_orphan_files`. Orphans are the documented residue of a
    * crashed or racing writer (data committed, manifest link lost) and
    * of [[expireSnapshots]] interrupted between manifest and data
    * deletion. `olderThanMillis` spares young unreferenced dirs: an
    * IN-FLIGHT writer's dir is also unreferenced until its manifest
    * links, and sweeping it mid-write would fail the writer or, worse,
    * let it commit a manifest over half-deleted files — the reason
    * Iceberg's procedure defaults to `older_than = 3 days`. Age is the
    * dir's last-modified time (bumped by every file the writer lands).
    * Returns the deleted dirs. */
  def removeOrphanFiles(root: String,
      olderThanMillis: Long = 24L * 3600 * 1000): Seq[String] = {
    val live = versions(root).map(v => manifest(root, v)("dataDir")).toSet
    val cutoff = System.currentTimeMillis() - olderThanMillis
    val orphans = listNames(Paths.get(root, "data"))
      .map(n => s"data/$n")
      .filterNot(live)
      .filter { d =>
        scala.util.Try(Files.getLastModifiedTime(Paths.get(root, d)).toMillis)
          .toOption.exists(_ <= cutoff)
      }
    orphans.foreach(d => deleteRecursively(Paths.get(root, d)))
    orphans
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val stream = Files.list(p)
      try {
        val it = stream.iterator()
        while (it.hasNext) deleteRecursively(it.next())
      } finally stream.close()
    }
    Files.deleteIfExists(p)
  }

  /** Copy-on-write row-level delete — Iceberg's `DELETE FROM` in COW
    * mode: rewrite the tip WITHOUT the matching rows and commit it as a
    * new snapshot. Deleted rows remain time-travelable in history until
    * [[expireSnapshots]] retires their snapshots; the erasure becomes
    * PHYSICAL only after expiry + [[removeOrphanFiles]] — exactly the
    * deletion pipeline a GDPR cascade runs on an Iceberg table
    * (SURVEY §7.4's parity note; reference analog: the privacy
    * module's user-scoped purge). Returns the new version. */
  def deleteWhere(spark: SparkSession, root: String,
      condition: org.apache.spark.sql.Column): Int = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    val df = read(spark, root)
    // SQL DELETE semantics: remove rows where the predicate is TRUE.
    // A bare where(!condition) would ALSO drop NULL-valued predicates
    // (three-valued logic: !NULL is NULL, and where() drops NULL) —
    // silently erasing rows the user never matched.
    write(df.where(not(coalesce(condition, lit(false)))), root,
      note = s"delete where $condition")
  }

  /** Small-file compaction — Iceberg's `rewrite_data_files`: rewrite
    * the CURRENT snapshot's rows into `targetFiles` output tasks (per
    * partition-spec directory when the table is partitioned) and commit
    * the rewrite as a new snapshot. Rows and schema are identical by
    * construction; history stays intact, so time travel to the
    * un-compacted version still works until it is expired. The common
    * producer of the small files this sweeps is a high-frequency
    * streaming/delta writer (StreamResolve's per-batch appends are the
    * in-repo analog). Returns the new version. */
  def compact(spark: SparkSession, root: String, targetFiles: Int = 1): Int = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val df = read(spark, root)
    // coalesce, not repartition: compaction must not pay a shuffle —
    // it only narrows the task count of the rewrite scan
    write(df.coalesce(targetFiles), root, note = "compact")
  }

  /** The snapshot log as a DataFrame (version, parent, dataDir, spec, note). */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    versions(root)
      .map { v =>
        val m = manifest(root, v)
        (v, m("parent").toInt, m("dataDir"), m.getOrElse("spec", ""), m.getOrElse("note", ""))
      }
      .toDF("version", "parent", "data_dir", "spec", "note")
  }
}
