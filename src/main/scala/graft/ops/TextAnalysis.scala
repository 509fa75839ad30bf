package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Column trees (whole-stage codegen; no UDFs).
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword-voting language
    * heuristic. Tiny on purpose: the operator shape (per-language vote
    * columns → greatest/argmax) is what matters; profiles are
    * swappable. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "des", "est", "dans", "et", "une", "que", "pour"),
    "it" -> Seq("il", "di", "che", "la", "per", "una", "sono", "con", "del", "non")
  )

  private def words(text: Column): Column =
    filter(split(TextOps.normText(text), " "), w => length(w) > 0)

  /** Count of words from `set` appearing in `text` (with multiplicity). */
  def stopwordHits(text: Column, set: Seq[String]): Column = {
    val arr = array(set.map(lit): _*)
    size(filter(words(text), w => array_contains(arr, w)))
  }

  /** Language-ID: argmax of stopword votes; 'und' (undetermined) when
    * no profile scores a hit. Deterministic tie-break by profile order. */
  def langId(text: Column): Column = {
    val ordered = stopwords.toSeq.sortBy(_._1)
    val scored = ordered.map { case (lang, set) => (lang, stopwordHits(text, set)) }
    val best = scored
      .map { case (lang, s) => struct(s.as("hits"), lit(lang).as("lang")) }
      .reduce((a, b) => when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Per-doc quality metrics: counts are exact ints; ratios are
    * single divisions of ints (engine-deterministic). */
  def qualityMetrics(text: Column): Column = {
    val ws = words(text)
    val nTokens = size(ws)
    val nChars = length(text)
    val alpha = length(regexp_replace(text, "[^A-Za-z]", ""))
    val digits = length(regexp_replace(text, "[^0-9]", ""))
    val punct = length(regexp_replace(text, "[^.,;:!?'\"()]", ""))
    val stopsAll = stopwords.values.flatten.toSeq.distinct
    val stops = stopwordHits(text, stopsAll)
    struct(
      nTokens.as("n_tokens"),
      nChars.as("n_chars"),
      when(nChars > 0, alpha.cast("double") / nChars).otherwise(0.0).as("alpha_ratio"),
      when(nChars > 0, digits.cast("double") / nChars).otherwise(0.0).as("digit_ratio"),
      when(nChars > 0, punct.cast("double") / nChars).otherwise(0.0).as("punct_ratio"),
      when(nTokens > 0, stops.cast("double") / nTokens).otherwise(0.0).as("stopword_ratio"),
      when(nTokens > 0, (nChars - nTokens + 1).cast("double") / nTokens).otherwise(0.0).as("mean_token_len")
    )
  }

  /** Composite quality gate in the C4/Gopher style: enough tokens,
    * mostly alphabetic, some stopwords, sane token length. */
  def qualityScore(text: Column): Column = {
    val m = qualityMetrics(text)
    val checks = Seq(
      (m.getField("n_tokens") >= 5).cast("int"),
      (m.getField("alpha_ratio") >= 0.6).cast("int"),
      (m.getField("stopword_ratio") >= 0.01).cast("int"),
      (m.getField("mean_token_len") >= 2 && m.getField("mean_token_len") <= 12).cast("int"),
      (m.getField("digit_ratio") <= 0.3).cast("int")
    )
    checks.reduce(_ + _).cast("double") / checks.size
  }

  /** Whitespace token count (exact, cross-engine-safe form). */
  def tokenCountWhitespace(text: Column): Column = size(words(text))

  /** BPE-ish subword count via regex token classes: runs of letters,
    * runs of digits, single other non-space chars. */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** k-gram hashes in DOCUMENT ORDER (duplicates retained): winnowing
    * windows slide over the original shingle sequence per Schleimer et
    * al. 2003 — deduplication happens on the output fingerprints, not
    * the input hashes (a pre-dedup would both deviate from the paper
    * and make window content depend on engine-specific set ordering,
    * which breaks cross-engine verification). */
  private def orderedHashes(text: Column, k: Int, md5: Boolean): Column = {
    val sh = TextOps.charShingles(TextOps.normText(text), k)
    if (md5) transform(sh, s => conv(substring(org.apache.spark.sql.functions.md5(s), 1, 15), 16, 10).cast("long"))
    else transform(sh, s => xxhash64(s))
  }

  /** Winnowing document fingerprints (Schleimer et al. 2003): k-gram
    * rolling hashes in document order, minimum per sliding window of w,
    * distinct mins. Per-row array-combinator form — fine for short
    * strings, but the `slice(hashes, …)` inside the lambda re-evaluates
    * the whole hash array per window (O(n²·w) per doc). For corpora use
    * [[fingerprintRows]], the explode + window-min formulation. */
  def fingerprints(text: Column, k: Int = 5, w: Int = 8): Column = {
    val hashes = orderedHashes(text, k, md5 = false)
    val n = size(hashes)
    when(n <= w, array_distinct(when(n > 0, array(array_min(hashes))).otherwise(array().cast("array<long>"))))
      .otherwise(array_distinct(transform(sequence(lit(0), n - w), j => array_min(slice(hashes, j + 1, lit(w))))))
  }

  /** Scalable winnowing: one (id, fingerprint) row per distinct
    * window-min. Explode shingle hashes once, sliding min via a window
    * frame — hash computation runs exactly once per shingle and the
    * work distributes across the cluster (one shuffle on id). */
  def fingerprintRows(docs0: org.apache.spark.sql.DataFrame, k: Int = 5, w: Int = 8): org.apache.spark.sql.DataFrame =
    fingerprintRowsWith(docs0, k, w, md5 = false)

  /** Cross-engine-verifiable winnowing: md5-derived shingle hashes so a
    * DuckDB oracle can recompute the identical fingerprint set
    * (Analytics5.q33). Same windowing semantics as [[fingerprintRows]]. */
  def fingerprintRowsMd5(docs0: org.apache.spark.sql.DataFrame, k: Int = 5, w: Int = 8): org.apache.spark.sql.DataFrame =
    fingerprintRowsWith(docs0, k, w, md5 = true)

  private def fingerprintRowsWith(docs0: org.apache.spark.sql.DataFrame, k: Int, w: Int, md5: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.util.Parallelism.ensure(docs0)
    val hashes = orderedHashes(col("text"), k, md5)
    val ex = docs.select(col("id"), posexplode(hashes).as(Seq("pos", "h")))
    val frame = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    ex
      .withColumn("wmin", min("h").over(frame))
      .withColumn("wcnt", count("h").over(frame))
      .withColumn("total", count("h").over(Window.partitionBy("id")))
      // complete windows only; short docs (< w shingles) keep their one global min
      .where(col("wcnt") === w || (col("total") < w && col("pos") === 0))
      .select(col("id"), col("wmin").as("fp"))
      .distinct()
  }
}
