package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Planted-ground-truth specs for the training-data operators. */
class OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // fully random words — no shared positional suffixes that would
    // give unrelated docs artificial shingle overlap
    def sentence(i: Int) =
      (0 until 12).map(_ => s"w${rnd.nextInt(900000)}q${rnd.nextInt(900000)}").mkString(" ")
    val base = (0 until 200).map(i => (f"d$i%03d", sentence(i)))
    // planted near-duplicates: copies of d000/d001 with small edits
    val dups = Seq(
      ("dupA", base(0)._2.replaceFirst("q", "qz")),
      ("dupB", base(0)._2 + " extra"),
      ("dupC", base(1)._2.replaceFirst("w", "v"))
    )
    (base ++ dups).toDF("id", "text")
  }

  test("minhash near-dup finds planted duplicates and groups them transitively") {
    val groups = Dedup.nearDupGroups(corpus, Dedup.MinHashCfg(jaccardThreshold = 0.5))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(groups("dupA") == groups("d000"))
    assert(groups("dupB") == groups("d000"))
    assert(groups("dupC") == groups("d001"))
    assert(groups("d000") != groups("d001"))
    // non-dups stay singletons
    assert(groups("d005") == "d005")
  }

  test("ngram Jaccard: planted near-dups found, analytic value exact, df cap silences stop-shingles") {
    import spark.implicits._
    // planted near-dups from the shared corpus fixture
    val pairs = Dedup.ngramJaccardPairs(corpus, n = 5, dfCap = 50, threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(pairs.contains(("d000", "dupA")))
    assert(pairs.contains(("d000", "dupB")))
    assert(pairs.contains(("d001", "dupC")))
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b) == Set("d000", "d001") })
    // analytic: "abcdef" vs "abcdeg" share 1 of 3 distinct 5-grams
    val tiny = Seq(("x", "abcdef"), ("y", "abcdeg")).toDF("id", "text")
    val j = Dedup.ngramJaccardPairs(tiny, n = 5, dfCap = 50, threshold = 0.3).collect()
    assert(j.length == 1 && j(0).getDouble(5) == 1.0 / 3.0 && j(0).getLong(2) == 1L)
    // a gram in more docs than dfCap contributes nothing
    val hot = (0 until 6).map(i => (s"h$i", "zzzzz")).toDF("id", "text")
    assert(Dedup.ngramJaccardPairs(hot, n = 5, dfCap = 3, threshold = 0.1).isEmpty)
  }

  test("simhash: planted near-identical LONG docs collide within hamming budget") {
    // simhash needs many tokens for stable bit votes — short docs flip
    // bits on any edit (vote margins are O(√n)); use 300-token docs
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    def longDoc() = (0 until 300).map(_ => s"t${rnd.nextInt(900000)}").mkString(" ")
    val base = (0 until 50).map(i => (f"L$i%02d", longDoc()))
    val d0 = base(0)._2
    val docs = (base ++ Seq(
      ("exact", d0), // identical text, different id → hamming 0
      ("near", d0.split(" ").updated(5, "changedtoken").mkString(" ")) // 1 of 300 tokens changed
    )).toDF("id", "text")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 16)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getAs[Number](2).longValue)).toMap
    assert(pairs.contains(("L00", "exact")) && pairs(("L00", "exact")) == 0L)
    assert(pairs.contains(("L00", "near")), s"near-dup not found; pairs=$pairs")
    // unrelated long docs must not appear at this budget
    assert(!pairs.keySet.exists { case (a, b) => a.startsWith("L") && b.startsWith("L") && a != "L00" && b != "L00" })
  }

  test("simhash is deterministic across partitionings") {
    val a = Dedup.simhash(corpus.repartition(2)).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Dedup.simhash(corpus.repartition(11)).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("language-ID picks the stopword-dominant language") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat sat of the mat and that is that"),
      ("es", "el perro y la casa de los campos por la noche"),
      ("de", "der hund und die katze ist von den feldern"),
      ("fr", "le chien est dans les champs pour une nuit"),
      ("und", "zzz qqq www")
    ).toDF("expected", "text")
    val got = samples.withColumn("guess", TextAnalysis.langId(col("text")))
      .where(col("expected") =!= col("guess")).count()
    assert(got == 0)
  }

  test("quality score separates real-ish text from junk") {
    import spark.implicits._
    val df = Seq(
      ("good", "the quick brown fox jumps over the lazy dog and runs away with it"),
      ("junk_digits", "123 456 789 000 111 222 333 444 555 666 777 888"),
      ("junk_short", "hi")
    ).toDF("id", "text").withColumn("q", TextAnalysis.qualityScore(col("text")))
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m("good") >= 0.8, s"good=${m("good")}")
    assert(m("junk_digits") < 0.8)
    assert(m("junk_short") < 0.8)
  }

  test("winnowing fingerprints overlap heavily for near-dups, little for unrelated") {
    import spark.implicits._
    val df = corpus.select(col("id"), TextAnalysis.fingerprints(col("text")).as("fp"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    val overlapDup = (m("d000") intersect m("dupA")).size.toDouble / m("d000").size
    val overlapRnd = (m("d000") intersect m("d005")).size.toDouble / m("d000").size
    assert(overlapDup > 0.5, s"dup overlap $overlapDup")
    assert(overlapRnd < 0.2, s"random overlap $overlapRnd")
  }

  test("fingerprintRows (window-min form) agrees with the array-combinator form") {
    import spark.implicits._
    val df = corpus
    val colForm = df.select(col("id"), TextAnalysis.fingerprints(col("text")).as("fps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    val rowForm = TextAnalysis.fingerprintRows(df)
      .collect().groupBy(_.getString(0)).map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    assert(rowForm == colForm)
  }

  test("brute-force cosine: identical planted vector is the top neighbor") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 50).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))) :+
      (999L, Array.fill(16)(0f))
    val planted = vecs(3)._2.clone()
    val df = (vecs :+ (1000L, planted)).toDF("id", "vec")
    val top = Similarity.bruteForceTopK(df, 1)
      .where(col("id_a") === 1000L).head()
    assert(top.getLong(1) == 3L)
    assert(math.abs(top.getDouble(3) - 1.0) < 1e-9)
  }

  test("LSH cosine pairs: same-bucket recall on planted duplicate, big candidate reduction") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val base = (0 until 300).map(i => (i.toLong, Array.fill(32)(rnd.nextFloat() * 2 - 1)))
    val df = (base :+ (9999L, base(7)._2.clone())).toDF("id", "vec")
    val pairs = Similarity.lshCosinePairs(df, threshold = 0.95, nPlanes = 8, dim = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((7L, 9999L)))
  }

  test("multimodal codecs: PNG parses (and javax.imageio agrees), JPEG/WAV headers roundtrip") {
    // PNG: our parser vs a real decoder on our real encoding
    val png = Multimodal.MediaGen.png(seed = 99L, width = 7, height = 11)
    assert(Multimodal.MediaCodec.decode(png) == (("png", 7, 11)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth == 7 && img.getHeight == 11, "javax.imageio must read our PNG")
    // JPEG marker walk
    assert(Multimodal.MediaCodec.decode(Multimodal.MediaGen.jpeg(640, 480)) == (("jpeg", 640, 480)))
    // WAV fmt chunk
    assert(Multimodal.MediaCodec.decode(Multimodal.MediaGen.wav(5L, 44100, 2)) == (("wav", 44100, 2)))
    // garbage → reject path
    assert(Multimodal.MediaCodec.decode(Array[Byte](1, 2, 3, 4)) == (("unknown", 0, 0)))
    // byte histogram is a distribution
    val h = Multimodal.MediaCodec.byteHistogram(png)
    assert(h.length == 16 && math.abs(h.map(_.toDouble).sum - 1.0) < 1e-5)
  }

  test("multimodal pipeline: deterministic real decode over synthesized payloads") {
    val docs = graft.schema.Fixture.docs(spark, graft.schema.Fixture.scales("t1")).toDF()
    val media = Multimodal.mediaTable(spark, docs)
    val decoded = Multimodal.decodeAll(media).cache()
    val n = media.count()
    assert(decoded.count() == n)
    val r = decoded.head()
    assert(r.features.length == 16)
    assert(Set("jpeg", "png", "wav").contains(r.format))
    assert(decoded.filter(_.format == "unknown").count() == 0, "every synthesized payload must parse")
    assert(decoded.filter(d => d.width <= 0 || d.height <= 0).count() == 0)
    // determinism
    val h1 = Multimodal.decodeAll(media).toDF()
      .select(bit_xor(xxhash64(col("media_ref"), col("format"), col("width"), col("height"))).as("h"))
      .head().getLong(0)
    val h2 = Multimodal.decodeAll(media.repartition(7)).toDF()
      .select(bit_xor(xxhash64(col("media_ref"), col("format"), col("width"), col("height"))).as("h"))
      .head().getLong(0)
    assert(h1 == h2)
  }

  test("multimodal roundTrip: analytic parameter prediction matches the real encode->parse") {
    import spark.implicits._
    // planted params covering all three formats and the wav rate/channel arms
    val params = Seq(
      Multimodal.MediaParam("a", 0L, 30L, 5L),   // png 4+30%29=5 x 4+5%29=9
      Multimodal.MediaParam("b", 1L, 2000L, 70L), // jpeg 16+2000%1904=112 x 16+70%1064=86
      Multimodal.MediaParam("c", 2L, 4L, 3L),    // wav rate [8000,16000,44100][4%3=1] ch 1+3%2=2
      Multimodal.MediaParam("d", 2L, 3L, 2L)     // wav 8000 Hz, 1 ch
    ).toDS()
    val got = Multimodal.roundTrip(params)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("a", "png", 5L, 9L),
      ("b", "jpeg", 112L, 86L),
      ("c", "wav", 16000L, 2L),
      ("d", "wav", 8000L, 1L)))
  }
}
