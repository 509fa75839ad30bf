package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.functions.{JaroWinklerExpr, MinHashBands, SimHashSig}

/** SQL-surface spec: the SparkSessionExtensions injection path and the
  * live-session registration must expose every kernel under its SQL
  * name, resolving to the SAME Catalyst expression as the Column API
  * (value-identity checked per function, through codegen — the SQL
  * calls run inside a DataFrame over a real table, not constant-folded
  * one-row selects only). */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def registered(): Unit = GraftFunctions.register(spark)

  test("GraftExtensions injection applies to a session registry (the spark.sql.extensions path)") {
    // Drive the REAL injection mechanics: apply the extensions class to
    // a SparkSessionExtensions instance, then let IT register into the
    // live session's registry — exactly what SparkSession.Builder does
    // when spark.sql.extensions=graft.GraftExtensions is set.
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftShim.registerInto(ext, spark.sessionState.functionRegistry)
    val names = GraftFunctions.descriptions.map(_._1.funcName)
    assert(names.nonEmpty)
    names.foreach { n =>
      assert(
        spark.sessionState.functionRegistry.functionExists(new org.apache.spark.sql.catalyst.FunctionIdentifier(n)),
        s"function $n not registered")
      // DESCRIBE FUNCTION resolves and carries the usage text
      val d = spark.sql(s"DESCRIBE FUNCTION $n").collect().map(_.getString(0)).mkString("\n")
      assert(d.contains(n))
    }
  }

  test("graft_jaro_winkler / graft_jaro_winkler_ge match the Column API value-for-value") {
    registered()
    import spark.implicits._
    val pairs = Seq(
      ("martha", "marhta"), ("dixon", "dicksonx"), ("abc", "abc"),
      ("", "abc"), ("a", "b"), ("jellyfish", "smellyfish")
    ).toDF("a", "b")
    val viaSql = pairs
      .selectExpr("a", "b", "graft_jaro_winkler(a, b) AS jw", "graft_jaro_winkler_ge(a, b, 0.7) AS jwg")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    val viaCol = pairs
      .select(col("a"), col("b"),
        JaroWinklerExpr.jaroWinkler(col("a"), col("b")),
        JaroWinklerExpr.jaroWinklerGE(col("a"), col("b"), 0.7))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(viaSql.sorted.toSeq == viaCol.sorted.toSeq)
    // the gate actually gates
    val gated = viaSql.find(t => t._1 == "a" && t._2 == "b").get
    assert(gated._4 == 0.0)
  }

  test("graft_simhash64 and graft_minhash_band_keys match the kernel Column API") {
    registered()
    import spark.implicits._
    val docs = Seq(
      ("d1", "the quick brown fox jumps over the lazy dog"),
      ("d2", "the quick brown fox jumped over the lazy dog"),
      ("d3", ""),
      ("d4", "completely different text with other words entirely")
    ).toDF("id", "text")
    val viaSql = docs
      .selectExpr("id", "graft_simhash64(text) AS sh", "graft_minhash_band_keys(text, 5, 64, 16) AS mh")
      .collect()
      .map(r => (r.getString(0), Option(r.get(1)), r.getSeq[Long](2)))
    val viaCol = docs
      .select(col("id"), SimHashSig.simhash64(col("text")), MinHashBands.bandKeys(col("text"), 5, 64, 16, 42L))
      .collect()
      .map(r => (r.getString(0), Option(r.get(1)), r.getSeq[Long](2)))
    assert(viaSql.sortBy(_._1).toSeq == viaCol.sortBy(_._1).toSeq)
    // explicit seed argument changes the keys; same seed reproduces
    val s7 = docs.selectExpr("graft_minhash_band_keys(text, 5, 64, 16, 7) AS mh").collect().map(_.getSeq[Long](0))
    val s7b = docs.selectExpr("graft_minhash_band_keys(text, 5, 64, 16, 7) AS mh").collect().map(_.getSeq[Long](0))
    val s42 = viaSql.sortBy(_._1).map(_._3)
    assert(s7.toSeq == s7b.toSeq)
    assert(s7.toSeq != s42.toSeq)
  }

  test("graft_cosine and graft_norm_text match their Column combinators") {
    registered()
    import spark.implicits._
    val vecs = Seq(
      (Array(1.0f, 0.0f, 2.0f), Array(1.0f, 0.0f, 2.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
    ).toDF("a", "b")
    val viaSql = vecs.selectExpr("graft_cosine(a, b) AS c").collect().map(_.getDouble(0))
    val viaCol = vecs
      .select(graft.ops.Similarity.cosine(transform(col("a"), _.cast("double")), transform(col("b"), _.cast("double"))))
      .collect().map(_.getDouble(0))
    assert(viaSql.toSeq == viaCol.toSeq)
    // identical vectors: 1.0 up to IEEE rounding (sqrt(5)*sqrt(5) != 5 exactly)
    assert(math.abs(viaSql(0) - 1.0) < 1e-12 && viaSql(1) == 0.0 && viaSql(2) == 0.0)

    val texts = Seq("Hello,  WORLD!!", "a-b_c", "").toDF("t")
    val sqlNorm = texts.selectExpr("graft_norm_text(t) AS n").collect().map(_.getString(0))
    val colNorm = texts.select(graft.text.TextOps.normText(col("t"))).collect().map(_.getString(0))
    assert(sqlNorm.toSeq == colNorm.toSeq)
    assert(sqlNorm(0) == "hello world")
  }

  test("SQL-name kernels stay inside WholeStageCodegen (no interpreted fallback)") {
    registered()
    // over a real parquet scan (a local relation would constant-fold the
    // whole projection into a LocalTableScan and prove nothing)
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr(
        "graft_jaro_winkler(lang, substring(text, 1, 8)) AS jw",
        "graft_simhash64(text) AS sh",
        "graft_minhash_band_keys(text, 5, 64, 16) AS mh",
        "graft_norm_text(text) AS n")
    val plan = df.queryExecution.executedPlan.toString
    // the executed plan renders WholeStageCodegen spans as a `*(n)`
    // prefix; the Project holding all four kernels must carry one
    val proj = plan.linesIterator.find(_.contains("Project")).getOrElse("")
    assert(proj.trim.startsWith("*("), plan.take(2000))
    Seq("jaro_winkler(", "simhash64(", "minhash_band_keys(").foreach { k =>
      assert(proj.contains(k), s"$k not in codegen'd Project: ${plan.take(2000)}")
    }
    // and column pruning reached the scan: only the two referenced columns
    assert(plan.contains("ReadSchema: struct<text:string,lang:string>"), plan.take(2000))
    // execute THROUGH the codegen'd path, consuming every kernel column —
    // a bare count() would let the optimizer prune the whole Project
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.isNullAt(0) && r.getSeq[Long](2).length == 16))
  }

  test("graft_snapshot table function: latest / time travel / tag, via both registration paths") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ext_snap").toString
    val v0 = sources.SnapshotTable.write(
      Seq((1, "a", "p1"), (2, "b", "p2")).toDF("id", "s", "part"), root,
      note = "v0", partitionBy = Some(Seq("part")))
    sources.SnapshotTable.tag(root, "first", v0)
    sources.SnapshotTable.write(
      Seq((1, "a", "p1"), (3, "c", "p2")).toDF("id", "s", "part"), root, note = "v1")

    // injection path (what spark.sql.extensions does for TVFs)
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftShim.registerTableInto(ext, spark.sessionState.tableFunctionRegistry)

    val latest = spark.sql(s"SELECT id FROM graft_snapshot('$root') ORDER BY id").collect().map(_.getInt(0))
    assert(latest.toSeq == Seq(1, 3))
    val v0ByInt = spark.sql(s"SELECT id FROM graft_snapshot('$root', $v0) ORDER BY id").collect().map(_.getInt(0))
    val v0ByTag = spark.sql(s"SELECT id FROM graft_snapshot('$root', 'first') ORDER BY id").collect().map(_.getInt(0))
    assert(v0ByInt.toSeq == Seq(1, 2) && v0ByTag.toSeq == Seq(1, 2))

    // live-session registration path exposes the same function
    registered()
    assert(spark.sql(s"SELECT count(*) AS c FROM graft_snapshot('$root')").collect().head.getLong(0) == 2L)

    // the TVF resolves to the snapshot's parquet scan: a filter on the
    // partition column reaches planning as a PartitionFilter (pruned
    // directories, no data read from the other partition)
    val pruned = spark.sql(s"SELECT id FROM graft_snapshot('$root', $v0) WHERE part = 'p2'")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part"), plan.take(2000))
    assert(pruned.collect().map(_.getInt(0)).toSeq == Seq(2))

    // unknown tag and empty-table errors are loud and name the problem
    val e1 = intercept[Exception] { spark.sql(s"SELECT * FROM graft_snapshot('$root', 'nope')").collect() }
    assert(e1.getMessage.contains("no tag"))
    val e2 = intercept[Exception] { spark.sql(s"SELECT * FROM graft_snapshot('$root/absent')").collect() }
    assert(e2.getMessage.contains("no committed snapshots"))
  }

  test("config arguments must be constants; arity is enforced") {
    registered()
    import spark.implicits._
    val docs = Seq(("x", 3)).toDF("t", "n")
    // non-constant nBands
    val e1 = intercept[Exception] {
      docs.selectExpr("graft_minhash_band_keys(t, 5, 64, n)").collect()
    }
    assert(e1.getMessage.contains("constant") || e1.getMessage.toLowerCase.contains("foldable"))
    // wrong arity
    val e2 = intercept[Exception] { docs.selectExpr("graft_jaro_winkler(t)").collect() }
    assert(e2.getMessage.contains("argument"))
    // non-numeric cutoff
    val e3 = intercept[Exception] { docs.selectExpr("graft_jaro_winkler_ge(t, t, 'x')").collect() }
    assert(e3.getMessage.contains("numeric"))
  }
}
