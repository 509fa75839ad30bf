package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes EVERY driver-contract query end-to-end at sf0.001 with a
  * real parquet write (a count() would let Catalyst prune the very
  * expressions under test). Catches runtime failures — e.g. driver-side
  * row accessor type errors — that no per-operator spec covers, before
  * the driver's Verify does. */
class QuerySmokeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val outDir = java.nio.file.Files.createTempDirectory("graft_smoke").toString

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracled query has a query implementation and vice-versa names align") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  private val counts = scala.collection.concurrent.TrieMap.empty[String, Long]

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes and writes at sf0.001") {
      fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
      val n = spark.read.parquet(s"$outDir/$name").count()
      counts(name) = n
      assert(n >= 0)
    }
  }

  // Round-2 lesson (stale-parquet q19): a silently-shrunk result should
  // fail HERE, before the driver's Verify sees it. Expected counts are
  // committed; regenerate deliberately with SPARK_GRAFT_UPDATE_EXPECTED=1
  // after an intentional semantics change.
  test("row counts match committed expectations (sf0.001)") {
    val path = java.nio.file.Paths.get("src/test/resources/expected_rows_sf0.001.txt")
    val lines = counts.toSeq.sorted.map { case (k, v) => s"$k $v" }.mkString("", "\n", "\n")
    if (sys.env.contains("SPARK_GRAFT_UPDATE_EXPECTED") || !java.nio.file.Files.exists(path)) {
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.writeString(path, lines)
      info(s"expectations (re)generated at $path — commit the file")
    } else {
      val expected = scala.io.Source.fromFile(path.toFile).getLines().filter(_.nonEmpty)
        .map { l => val Array(k, v) = l.split(" "); k -> v.toLong }.toMap
      val diffs = (expected.keySet ++ counts.keySet).toSeq.sorted.flatMap { k =>
        (expected.get(k), counts.get(k)) match {
          case (Some(e), Some(a)) if e != a => Some(s"$k: expected $e rows, got $a")
          case (None, Some(a)) => Some(s"$k: NEW query ($a rows) — regenerate expectations")
          case (Some(_), None) => Some(s"$k: query disappeared")
          case _ => None
        }
      }
      assert(diffs.isEmpty, diffs.mkString("\n"))
    }
  }

  // The pir_* family has no DuckDB oracle (the driver testdata lacks a
  // span-schema table), so a silent QUALITY regression would reach the
  // driver as plausible rows. Pin the full cluster-size histogram —
  // the most regression-sensitive projection of the whole pipeline
  // (every blocking/scoring/clustering change moves it) — to committed
  // content, not just a row count.
  // The assign_digest column (bit_xor of xxhash64(doc_id, cluster_id))
  // is the driver-visible fingerprint of the FULL cluster assignment —
  // pin it at two scales so any quality drift fails here first, and so
  // the driver's rows-only pir rows carry a value diffable across
  // rounds. Regenerate with SPARK_GRAFT_UPDATE_EXPECTED=1 after an
  // intentional semantics change.
  test("pir assignment digest matches committed values at two scales (t1, t2)") {
    import org.apache.spark.sql.functions._
    def digest(scale: String): Long = queries.Resolution.staged(spark, scale).clusters
      .agg(coalesce(bit_xor(xxhash64(col("doc_id"), col("cluster_id"))), lit(0L)))
      .head().getLong(0)
    val actual = Seq("t1", "t2").map(sc => s"$sc ${digest(sc)}").mkString("", "\n", "\n")
    val path = java.nio.file.Paths.get("src/test/resources/expected_assign_digests.txt")
    if (sys.env.contains("SPARK_GRAFT_UPDATE_EXPECTED") || !java.nio.file.Files.exists(path)) {
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.writeString(path, actual)
      info(s"digests (re)generated at $path — commit the file")
    } else {
      val expected = java.nio.file.Files.readString(path)
      assert(actual == expected, s"assignment digest drifted:\nexpected:\n$expected\nactual:\n$actual")
    }
    // and the driver-facing query carries the same t1 digest on every row
    val df = spark.read.parquet(s"$outDir/pir_cluster_sizes")
    val inQuery = df.select("assign_digest").distinct().collect().map(_.getLong(0)).toSeq
    assert(inQuery == Seq(digest("t1")))
  }

  test("pir_cluster_sizes content matches the committed histogram (sf0.001)") {
    val df = spark.read.parquet(s"$outDir/pir_cluster_sizes")
    val actual = df.collect()
      .map(r => s"${r.getAs[Long]("n_docs")} ${r.getAs[Long]("n_clusters")}")
      .sorted.mkString("", "\n", "\n")
    val path = java.nio.file.Paths.get("src/test/resources/expected_cluster_sizes_sf0.001.txt")
    if (sys.env.contains("SPARK_GRAFT_UPDATE_EXPECTED") || !java.nio.file.Files.exists(path)) {
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.writeString(path, actual)
      info(s"histogram (re)generated at $path — commit the file")
    } else {
      val expected = java.nio.file.Files.readString(path)
      assert(actual == expected,
        s"cluster-size histogram drifted:\nexpected:\n$expected\nactual:\n$actual")
    }
  }
}
