package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.JaroWinklerExpr.jaroWinkler
import graft.text.TextOps.normText

/** Stage S — pairwise Fellegi-Sunter-style probabilistic scoring.
  *
  * Generalizes the reference's multi-signal link probability — a
  * weighted mean of per-signal similarities squashed by a sigmoid
  * (reference: src/core/cross_device_linker.py:143-216) — into a
  * log-likelihood sum over field-agreement outcomes (Fellegi & Sunter
  * 1969). Two fields, each with leveled outcomes:
  *
  *  - text: number of *distinct span instances on the weaker side*
  *    that strongly match (Jaro-Winkler ≥ jwStrong or gated
  *    Levenshtein). Using min(strong_a, strong_b) makes a single
  *    borrowed span (the generator's cross-entity contamination, the
  *    reference's shared-device noise,
  *    src/validation/synthetic_households.py:47) contribute at most
  *    level 1 — never the ≥2 level.
  *  - media_ref: per-shared-asset log-likelihood with a document-
  *    frequency cutoff: a rare shared asset is strong evidence
  *    (u ∝ (df/N)²), an asset present in > maxDfFrac of docs (the
  *    deliberately hot key) carries almost none (m ≈ u). This is the
  *    unsupervised analog of per-value u-probabilities in FS.
  *
  * The decision gate requires ≈2 independent evidence units, so any
  * single contaminated span (text OR media) cannot create a false
  * edge — critical because stage C closes transitively and one false
  * edge merges two whole entities.
  *
  * Everything is one Column tree over exploded span pairs: the JW
  * kernel is a codegen'd Catalyst expression, `levenshtein` is built-in
  * and gated behind the cheap JW pre-check, the FS terms are
  * constant-folded literals. One hash-aggregate shuffle brings
  * span-pair rows back to pair granularity.
  */
object Scoring {

  final case class Weights(
      jwStrong: Double = 0.84,
      levStrong: Double = 0.80,
      // text field levels: log(m/u) for strong_min ≥2 / ==1 / ==0
      wText2: Double = 9.0,
      wText1: Double = 4.0,
      wText0: Double = -2.0,
      // media: per shared asset, by document frequency
      maxDfFrac: Double = 0.02,
      wMediaRare: Double = 4.5,
      wMediaCommon: Double = 0.3,
      // both sides have media but share none
      wMediaNone: Double = -1.0,
      threshold: Double = 6.5
  )

  /** Per-doc normalized text spans, truncated to 64 entries: the
    * strong-span masks are 64-bit (`shiftleft(1L, ia)` wraps mod 64),
    * so untruncated span indexes would silently alias. The fixture has
    * ≤ ~9 spans; the cap only bites on pathological inputs. */
  def textRep(docs0: DataFrame): DataFrame = {
    val docs = graft.util.Parallelism.ensure(docs0)
    docs.select(
      col("doc_id"),
      slice(
        transform(
          filter(col("spans"), s => s.getField("kind") === lit("text")),
          s => normText(s.getField("text"))
        ),
        1, 64
      ).as("texts")
    )
  }

  /** Distinct media refs per doc annotated with their global document-
    * frequency fraction. Only docs WITH media appear (join left +
    * coalesce at the use site). The total doc count folds in as a
    * 1-row cross join — no separate driver action (a `docs.count()`
    * here would be a full extra input pass before scoring starts).
    * The media-df dictionary join is a shuffle join on media_ref (at
    * planet scale the dictionary is itself large); at test scale AQE
    * turns it into a broadcast join automatically. */
  def mediaRep(docs0: DataFrame): DataFrame = {
    val docs = graft.util.Parallelism.ensure(docs0)
    val medias = docMediaRefs(docs)
    val total = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val mediaDf = mediaDfCounts(docs)
      .crossJoin(total)
      .select(col("media_ref"), (col("df") / col("n_docs")).as("dffrac"))
    mediaRepWithDf(medias, mediaDf)
  }

  /** (doc_id, media_ref) — one row per distinct media ref per doc. */
  def docMediaRefs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      explode(
        array_distinct(
          transform(
            filter(col("spans"), s => s.getField("kind") === lit("media")),
            s => s.getField("media_ref")
          )
        )
      ).as("media_ref")
    )

  /** Raw media document-frequency COUNTS (media_ref, df) — the
    * mergeable corpus statistic behind [[mediaRep]]'s dffrac. An
    * incremental run adds its increment's counts to the persisted
    * table and bumps n_docs (Pipeline.runDelta); full-outer sum of
    * counts over a partition of the corpus equals the combined run's
    * counts exactly, which dffrac (a ratio of floats) does not. */
  def mediaDfCounts(docs: DataFrame): DataFrame =
    docMediaRefs(docs).groupBy("media_ref").agg(count(lit(1)).as("df"))

  /** Per-doc media arrays from an EXPLICIT df-fraction table
    * (media_ref, dffrac) — the statistics are an input, not derived
    * from the docs at hand, so an incremental run scoring only the
    * touched slice of the corpus sees the same rarity as a full run
    * over the whole corpus. `mediasOrDocs` accepts either the exploded
    * (doc_id, media_ref) frame or raw docs. */
  def mediaRepWithDf(mediasOrDocs: DataFrame, dfFrac: DataFrame): DataFrame = {
    val medias =
      if (mediasOrDocs.columns.contains("media_ref")) mediasOrDocs
      else docMediaRefs(graft.util.Parallelism.ensure(mediasOrDocs))
    medias
      .join(dfFrac, "media_ref")
      .groupBy("doc_id")
      // sort_array: collect_list order is nondeterministic and the
      // rare/common double sum in mediaScore is order-sensitive at ulp
      // level — sorted arrays keep resumed checkpoints byte-stable
      .agg(sort_array(collect_list(struct(col("media_ref"), col("dffrac")))).as("medias"))
  }

  private val emptyMedias = array().cast("array<struct<media_ref:string,dffrac:double>>")

  private def mediaScore(w: Weights): Column = {
    val shared = array_intersect(col("medias_a"), col("medias_b"))
    val sumShared = aggregate(
      shared,
      lit(0.0),
      (acc, x) =>
        acc + when(x.getField("dffrac") <= lit(w.maxDfFrac), lit(w.wMediaRare))
          .otherwise(lit(w.wMediaCommon))
    )
    when(size(col("medias_a")) > 0 && size(col("medias_b")) > 0 && size(shared) === 0, lit(w.wMediaNone))
      .otherwise(sumShared)
  }

  /** Score candidate pairs. `candidates`: (doc_a, doc_b, ...);
    * `docs`: input-hint shape. Output: ScoredPair schema.
    *
    * Convenience wrapper that builds the doc representations inline and
    * delegates to [[scoreWithRepsFused]]: the whole per-pair text score
    * (best JW, rescue-Levenshtein, strong-span masks) is ONE codegen'd
    * expression over dict-id arrays — no Generate, no aggregate, one
    * row per pair end to end (see scoreWithRepsFused's doc for the
    * plan shape). The pipeline instead checkpoints the reps and calls
    * scoreWithRepsFused directly so resume-able chunks share them. */
  def score(candidates: DataFrame, docs: DataFrame, w: Weights = Weights()): DataFrame = {
    val txt = textRep(docs).localCheckpoint(true)
    val dict = textDictDense(txt).localCheckpoint(true)
    scoreWithRepsFused(candidates, textIdsRep(txt, dict), mediaRep(docs), w, broadcastDict(dict))
  }

  /** Anti-join resume: the candidate pairs NOT yet present in a
    * (possibly partial) scored checkpoint — the reference's cache
    * semantics, where cached results are removed from the work set
    * (reference: src/api/optimized_api_server.py:673-700). Use with a
    * partial `scored_pairs` table to recompute only missing pairs. */
  def unscored(candidates: DataFrame, scoredCheckpoint: DataFrame): DataFrame =
    candidates.join(
      scoredCheckpoint.select("doc_a", "doc_b"),
      Seq("doc_a", "doc_b"),
      "left_anti"
    )

  /** Score against precomputed doc representations (the pipeline
    * checkpoints them once and reuses them across resume-able scoring
    * chunks — recomputing reps per chunk would re-scan the input).
    *
    * PRECONDITION: `candidates` must be distinct on (doc_a, doc_b).
    * The text branch's terminal aggregate dedups, but the media branch
    * joins back at candidate-row grain, so duplicate input pairs yield
    * duplicate scored rows. Blocking.candidatesFromKeys guarantees
    * distinctness (terminal groupBy(doc_a, doc_b)); callers feeding
    * hand-built pair sets must dropDuplicates first — deliberately NOT
    * done here, it would add a full extra shuffle of the candidate set
    * to every scoring chunk.
    *
    * Default path is the distinct-text-pair factorization (see
    * [[textPairScores]]): the exploded span-pair stream carries only
    * fixed-width longs and the JW kernel runs once per DISTINCT
    * normalized text pair instead of once per span-pair row. Output is
    * value-identical to [[scoreWithRepsDirect]] (same kernel, same
    * strings, symmetric JW/Levenshtein) — ScoringDedupSpec asserts
    * exact equality. Pass a precomputed `pairScores` (the pipeline
    * checkpoints one for all chunks) to avoid rebuilding it per call. */
  def scoreWithReps(
      candidates: DataFrame,
      txt: DataFrame,
      med: DataFrame,
      w: Weights = Weights(),
      pairScores: Option[DataFrame] = None
  ): DataFrame = {
    val ps = pairScores.getOrElse(textPairScores(candidates, txt, w))
    val slim = slimSpanPairs(candidates, txt)
    // left join against the (small) similar-pair score table: AQE picks
    // a broadcast-hash join when it fits; eq rows (tia == tib) bypass
    // the table entirely — exact equality is jw 1.0 by definition of
    // the kernel (incl. the empty-empty case). Rows with no similarity
    // signal are dropped BEFORE the aggregate; pairs whose rows all
    // drop reappear with zero defaults via the media left join below.
    val contrib = slim
      .join(ps, Seq("lt", "gt"), "left")
      .select(
        col("doc_a"), col("doc_b"), col("ia"), col("ib"),
        when(col("tia") === col("tib"), lit(1.0))
          .otherwise(coalesce(col("jw"), lit(0.0))).as("jw"),
        when(col("tia") === col("tib"), lit(0.0))
          .otherwise(coalesce(col("lev_sim"), lit(0.0))).as("lev_sim")
      )
      .where(col("jw") > lit(0.0))
    aggAndFinish(contrib, mediaPairScores(candidates, med, w), w)
  }

  /** Pair-grain aggregation of contributing span-pair rows + media
    * join + FS combination, shared by the factorized and dict paths.
    * `contrib`: (doc_a, doc_b, ia, ib, jw, lev_sim) with jw > 0 only —
    * pairs whose rows all dropped reappear with zero defaults via the
    * media LEFT join (mediaPair covers every candidate pair). */
  private def aggAndFinish(contrib: DataFrame, mediaPair: DataFrame, w: Weights): DataFrame = {
    val agg = contrib
      .withColumn("strong", col("jw") >= lit(w.jwStrong) || col("lev_sim") >= lit(w.levStrong))
      .groupBy("doc_a", "doc_b")
      .agg(
        max(col("jw")).as("jw_best0"),
        max(col("lev_sim")).as("lev_best0"),
        bit_or(when(col("strong"), expr("shiftleft(1L, ia)")).otherwise(0L)).as("mask_a0"),
        bit_or(when(col("strong"), expr("shiftleft(1L, ib)")).otherwise(0L)).as("mask_b0")
      )
    val joined = mediaPair
      .join(agg, Seq("doc_a", "doc_b"), "left")
      .select(
        col("doc_a"), col("doc_b"), col("m_score"), col("media_jaccard"),
        coalesce(col("jw_best0"), lit(0.0)).as("jw_best"),
        coalesce(col("lev_best0"), lit(0.0)).as("lev_best"),
        coalesce(col("mask_a0"), lit(0L)).as("mask_a"),
        coalesce(col("mask_b0"), lit(0L)).as("mask_b")
      )
      .withColumn("strong_a", bit_count(col("mask_a")).cast("long"))
      .withColumn("strong_b", bit_count(col("mask_b")).cast("long"))
      .withColumn("strong_min", least(col("strong_a"), col("strong_b")))
    finishScore(joined, w)
  }

  /** Dense dictionary of the distinct normalized span texts:
    * (t, tid:int), ids assigned in text sort order (range-sort +
    * zipWithIndex — no single-partition global sort; the pipeline
    * checkpoints the result so the assignment is stable for the run). */
  def textDictDense(txt: DataFrame): DataFrame = {
    val spark = txt.sparkSession
    import spark.implicits._
    txt.select(explode(col("texts")).as("t")).where(col("t").isNotNull).distinct()
      .repartitionByRange(col("t"))
      .sortWithinPartitions("t")
      .rdd.zipWithIndex
      .map { case (r, i) => (r.getString(0), i.toInt) }
      .toDF("t", "tid")
  }

  /** Per-doc span-text ids: (doc_id, tids:array<int>), index-aligned
    * with textRep's texts array (one shuffle join of the exploded rep
    * against the dictionary; empty-texts docs keep an empty array). */
  def textIdsRep(txt: DataFrame, dict: DataFrame): DataFrame =
    txt.select(col("doc_id"), posexplode_outer(col("texts")).as(Seq("ia", "t")))
      // shuffle-hash build on the dictionary side: unhinted this is a
      // SortMergeJoin that sorts the exploded span rows AND the
      // dictionary by the text column (string sort) — the most
      // expensive possible key (guide §3.1)
      .join(dict.hint("shuffle_hash"), Seq("t"), "left")
      .groupBy("doc_id")
      .agg(
        sort_array(collect_list(when(col("ia").isNotNull, struct(col("ia"), col("tid")))))
          .as("ps")
      )
      .select(col("doc_id"), transform(col("ps"), s => s.getField("tid")).as("tids"))

  /** Collect + broadcast the dictionary as a tid-indexed flat UTF-8
    * blob ([[graft.functions.PackedDict]]: one byte array + one offset
    * table). Two primitive arrays deserialize per executor instead of
    * millions of per-entry byte arrays — per-executor fixed cost and
    * GC-scan load drop with executor count held constant. */
  def broadcastDict(dict: DataFrame): org.apache.spark.broadcast.Broadcast[graft.functions.PackedDict] = {
    val rows = dict.select(col("tid"), col("t")).collect()
    val n = rows.length
    val bytes = new Array[Array[Byte]](n)
    var total = 0L
    rows.foreach { r =>
      val b = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      bytes(r.getInt(0)) = b
      total += b.length
    }
    require(total <= Int.MaxValue, s"span-text dictionary blob $total B exceeds a single array; raise dictMaxBytes gating")
    val flat = new Array[Byte](total.toInt)
    val offs = new Array[Int](n + 1)
    var i = 0
    var off = 0
    while (i < n) {
      val b = bytes(i)
      System.arraycopy(b, 0, flat, off, b.length)
      off += b.length
      offs(i + 1) = off
      i += 1
    }
    dict.sparkSession.sparkContext.broadcast(new graft.functions.PackedDict(flat, offs))
  }

  /** Dict-kernel scoring path (round-4 default): the exploded span-pair
    * stream carries only fixed-width ints — text bytes never enter a
    * join shuffle or a Generate copy — and the JW/Levenshtein kernels
    * read the broadcast dictionary, where a candidate pair's ~10 texts
    * stay cache-hot across its whole row burst. Value-identical to
    * [[scoreWithRepsDirect]] (same kernels, same strings; asserted by
    * ScoringDedupSpec). `txtIds` from [[textIdsRep]], `bc` from
    * [[broadcastDict]] — both derived from the same textRep. */
  def scoreWithRepsDict(
      candidates: DataFrame,
      txtIds: DataFrame,
      med: DataFrame,
      w: Weights,
      bc: org.apache.spark.broadcast.Broadcast[graft.functions.PackedDict]
  ): DataFrame = {
    val pairs = candidates.select("doc_a", "doc_b")
    val paired = pairs
      .join(txtIds.select(col("doc_id").as("doc_a"), col("tids").as("tids_a")), "doc_a")
      .join(txtIds.select(col("doc_id").as("doc_b"), col("tids").as("tids_b")), "doc_b")
    val exA = paired.select(
      col("doc_a"), col("doc_b"), col("tids_b"),
      posexplode_outer(col("tids_a")).as(Seq("ia", "tia"))
    )
    val slim = exA.select(
      col("doc_a"), col("doc_b"), col("ia"), col("tia"),
      posexplode_outer(col("tids_b")).as(Seq("ib", "tib"))
    )
    val contrib = slim
      .withColumn("jw", graft.functions.JwDictExpr.jwGE(col("tia"), col("tib"), 0.75, bc))
      .where(col("jw") > lit(0.0))
      .withColumn(
        "lev_sim",
        when(
          col("jw") >= lit(0.75) && col("jw") < lit(w.jwStrong),
          graft.functions.JwDictExpr.levSim(col("tia"), col("tib"), bc)
        ).otherwise(lit(0.0))
      )
      .select("doc_a", "doc_b", "ia", "ib", "jw", "lev_sim")
    aggAndFinish(contrib, mediaPairScores(candidates, med, w), w)
  }

  /** Fused scoring path (round-4 final default): one row per candidate
    * pair end to end. The text kernel — best JW, rescue-Levenshtein,
    * strong-span bit masks — runs as a single codegen'd expression over
    * the two dict-id arrays ([[graft.functions.FusedSpanKernel]]), and
    * the media branch is folded into the SAME row (medias join on the
    * same doc_a/doc_b keys as the id arrays, reusing their hash
    * partitioning), so stage S has no Generate, no aggregate, and no
    * pair-grain re-join: two join chains → one map → write. At planet
    * scale the only shuffles are the two rep joins, both on doc id.
    * Value-identical to [[scoreWithRepsDirect]] (ScoringDedupSpec). */
  def scoreWithRepsFused(
      candidates: DataFrame,
      txtIds: DataFrame,
      med: DataFrame,
      w: Weights,
      bc: org.apache.spark.broadcast.Broadcast[graft.functions.PackedDict],
      // broadcast the per-doc rep frames into the pair stream: stage S
      // then has NO shuffle exchange at all (pairs stream off the
      // candidate checkpoint through map-side hash joins). A cluster-
      // shape knob: worth two network shuffles of the pair stream on a
      // multi-node deployment, but a measured net LOSS on one box
      // (broadcast hash-relation builds cost more than local memcpy
      // exchanges: 557 vs 469 stage-S CPU core-s, FusedAB) — so the
      // pipeline defaults it off (Cfg.broadcastRepsMaxDocs = 0) and
      // gates it on a doc-count/executor-memory threshold when on.
      bcastReps: Boolean = false,
      // stage-S join strategy: "none" (default: planner sort-merge +
      // AQE runtime conversion) or "shuffle_hash". MEASURED NEUTRAL on
      // this box (tools/ScoreHintAB, interleaved noop-sink A/B ×3:
      // SHJ 467-504 core-s vs SMJ 447-495 — the SMJ sorts are radix
      // sorts over long keys and cost about what the hash-relation
      // builds do), so the default stays with the planner, which AQE
      // can still upgrade to broadcast at runtime. The knob remains
      // the cluster-deployment A/B surface; results identical.
      joinHint: String = "none"
  ): DataFrame = {
    // Two independent pair-grain branches joined on (doc_a, doc_b) —
    // deliberately NOT one join chain: a single chain would carry the
    // tids_a/medias_a array payloads through the two later sort-merge
    // joins, and sorting var-length rows ×8 concurrent chunk jobs was
    // a measured in-pipeline LOSS (scoring stage 1,333 vs the dict
    // path's 923 CPU core-s) despite the kernel itself being cheaper.
    // In this shape each array rides exactly ONE join — the same plan
    // as the exploded paths minus their Generate + hash aggregate.
    //
    // Join strategy (round 6, guide §3.1): `joinHint` can force
    // SHUFFLE_HASH on every build side, eliminating the SMJ sorts of
    // the pair stream (3 per branch). Measured NEUTRAL at bench scale
    // (see the joinHint doc) — the sorts are radix sorts over long
    // keys — so the planner default stays; the knob is the A/B
    // surface for deployments where the trade differs.
    val hint: DataFrame => DataFrame =
      if (bcastReps) broadcast
      else if (joinHint == "none") identity
      else (df: DataFrame) => df.hint(joinHint)
    val pairs = candidates.select("doc_a", "doc_b")
    val textPair = pairs
      .join(hint(txtIds.select(col("doc_id").as("doc_a"), col("tids").as("tids_a"))), "doc_a")
      .join(hint(txtIds.select(col("doc_id").as("doc_b"), col("tids").as("tids_b"))), "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        graft.functions.FusedSpanScore.score(
          col("tids_a"), col("tids_b"), 0.75, w.jwStrong, w.levStrong, bc).as("r")
      )
      .select(
        col("doc_a"), col("doc_b"),
        col("r.jw_best").as("jw_best"),
        col("r.lev_best").as("lev_best"),
        col("r.mask_a").as("mask_a"),
        col("r.mask_b").as("mask_b")
      )
    // branch-merge join: both branches end hash-partitioned on
    // (doc_a, doc_b); hinting the (narrower) media branch as the hash
    // build side avoids sorting both pair-grain streams. Left as-is
    // under bcastReps (that mode's branches are broadcast-join chains).
    val mediaPair0 = mediaPairScores(candidates, med, w, hint)
    val mediaPair =
      if (bcastReps || joinHint == "none") mediaPair0 else mediaPair0.hint(joinHint)
    val joined = mediaPair
      .join(textPair, Seq("doc_a", "doc_b"))
      .withColumn("strong_a", bit_count(col("mask_a")).cast("long"))
      .withColumn("strong_b", bit_count(col("mask_b")).cast("long"))
      .withColumn("strong_min", least(col("strong_a"), col("strong_b")))
    finishScore(joined, w)
  }

  /** The slim exploded span-pair stream: every span pair of every
    * candidate doc pair, texts dictionary-encoded to xxhash64 longs
    * BEFORE the pair joins — neither the two join shuffles nor the
    * Generate output carry a byte of text (span text was the measured
    * stage-S memory-bandwidth ceiling at 32 threads). (lt, gt) is the
    * order-canonicalized tid pair (JW and Levenshtein are symmetric). */
  private def slimSpanPairs(candidates: DataFrame, txt: DataFrame): DataFrame = {
    val tids = txt.select(col("doc_id"), transform(col("texts"), t => xxhash64(t)).as("tids"))
    val pairs = candidates.select("doc_a", "doc_b")
    val paired = pairs
      .join(tids.select(col("doc_id").as("doc_a"), col("tids").as("tids_a")), "doc_a")
      .join(tids.select(col("doc_id").as("doc_b"), col("tids").as("tids_b")), "doc_b")
    val exA = paired.select(
      col("doc_a"), col("doc_b"), col("tids_b"),
      posexplode_outer(col("tids_a")).as(Seq("ia", "tia"))
    )
    exA
      .select(
        col("doc_a"), col("doc_b"), col("ia"), col("tia"),
        posexplode_outer(col("tids_b")).as(Seq("ib", "tib"))
      )
      .withColumn("lt", least(col("tia"), col("tib")))
      .withColumn("gt", greatest(col("tia"), col("tib")))
  }

  /** Dictionary of distinct normalized span texts with xxhash64 ids. */
  def textDict(txt: DataFrame): DataFrame =
    txt
      .select(explode(col("texts")).as("t"))
      .distinct()
      .select(xxhash64(col("t")).as("tid"), col("t"))

  /** Similarity scores for the DISTINCT unequal text pairs reachable
    * from `candidates` — the factorized stage-S kernel table. The
    * fixture's (and any real corpus') span texts repeat heavily across
    * docs, so the candidate span-pair stream probes the same (ta, tb)
    * combinations over and over; scoring each distinct pair once turns
    * the JW/Levenshtein kernel cost from O(span-pair rows) into
    * O(distinct text pairs). Only pairs clearing the kernel cutoff
    * survive (everything else contributes exactly nothing to the
    * aggregate), so the table stays small and broadcast-able. */
  def textPairScores(
      candidates: DataFrame,
      txt: DataFrame,
      w: Weights = Weights(),
      dict0: Option[DataFrame] = None
  ): DataFrame = {
    val dict = dict0.getOrElse(textDict(txt))
    // loud guard: a tid collision would silently alias two different
    // texts (wrong eq-fast-path AND a fan-out in the dict joins). One
    // tiny aggregate over the distinct-text dictionary.
    locally {
      val g = dict.agg(count(lit(1)).as("n"), countDistinct(col("tid")).as("nh")).head()
      require(g.getLong(0) == g.getLong(1),
        s"xxhash64 span-text collision (${g.getLong(0)} texts -> ${g.getLong(1)} tids); " +
          "use scoreWithRepsDirect")
    }
    slimSpanPairs(candidates, txt)
      .where(col("tia") =!= col("tib"))
      .select("lt", "gt")
      .distinct()
      .join(dict.select(col("tid").as("lt"), col("t").as("ta")), "lt")
      .join(dict.select(col("tid").as("gt"), col("t").as("tb")), "gt")
      .withColumn("jw", graft.functions.JaroWinklerExpr.jaroWinklerGE(col("ta"), col("tb"), 0.75))
      .withColumn(
        "lev_sim",
        when(
          col("jw") >= lit(0.75) && col("jw") < lit(w.jwStrong),
          lit(1.0) - levenshtein(col("ta"), col("tb")).cast("double") /
            greatest(length(col("ta")), length(col("tb")), lit(1))
        ).otherwise(lit(0.0))
      )
      .where(col("jw") > lit(0.0))
      .select("lt", "gt", "jw", "lev_sim")
  }

  /** Media branch at pair grain (shared by both scoring paths). */
  private def mediaPairScores(
      candidates: DataFrame,
      med: DataFrame,
      w: Weights,
      hint: DataFrame => DataFrame = identity
  ): DataFrame = {
    val pairs = candidates.select("doc_a", "doc_b")
    val medA = hint(med.select(col("doc_id").as("doc_a"), col("medias").as("medias_a")))
    val medB = hint(med.select(col("doc_id").as("doc_b"), col("medias").as("medias_b")))
    pairs
      .join(medA, Seq("doc_a"), "left")
      .join(medB, Seq("doc_b"), "left")
      .withColumn("medias_a", coalesce(col("medias_a"), emptyMedias))
      .withColumn("medias_b", coalesce(col("medias_b"), emptyMedias))
      .select(
        col("doc_a"), col("doc_b"),
        mediaScore(w).as("m_score"),
        when(
          size(array_union(col("medias_a"), col("medias_b"))) > 0,
          size(array_intersect(col("medias_a"), col("medias_b"))).cast("double") /
            size(array_union(col("medias_a"), col("medias_b")))
        ).otherwise(lit(0.0)).as("media_jaccard")
      )
  }

  /** Final FS combination + decision gate (shared by both paths). */
  private def finishScore(df: DataFrame, w: Weights): DataFrame = {
    val textTerm = when(col("strong_min") >= 2, lit(w.wText2))
      .when(col("strong_min") === 1, lit(w.wText1))
      .otherwise(lit(w.wText0))
    df.withColumn("score", textTerm + col("m_score"))
      .withColumn("is_match", col("score") >= lit(w.threshold))
      .select(
        "doc_a", "doc_b", "score", "jw_best", "lev_best", "media_jaccard",
        "strong_min", "mask_a", "mask_b", "is_match"
      )
  }

  /** The pre-round-4 single-pass path: JW kernel inline over the
    * text-carrying exploded span-pair stream. Kept as the A/B baseline
    * and as the fallback for corpora with xxhash64 span-text collisions
    * (see the guard in [[textPairScores]]). */
  def scoreWithRepsDirect(candidates: DataFrame, txt: DataFrame, med: DataFrame, w: Weights = Weights()): DataFrame = {
    val pairs = candidates.select("doc_a", "doc_b")
    val medA = med.select(col("doc_id").as("doc_a"), col("medias").as("medias_a"))
    val medB = med.select(col("doc_id").as("doc_b"), col("medias").as("medias_b"))
    val mediaPair = pairs
      .join(medA, Seq("doc_a"), "left")
      .join(medB, Seq("doc_b"), "left")
      .withColumn("medias_a", coalesce(col("medias_a"), emptyMedias))
      .withColumn("medias_b", coalesce(col("medias_b"), emptyMedias))
      .select(
        col("doc_a"), col("doc_b"),
        mediaScore(w).as("m_score"),
        when(
          size(array_union(col("medias_a"), col("medias_b"))) > 0,
          size(array_intersect(col("medias_a"), col("medias_b"))).cast("double") /
            size(array_union(col("medias_a"), col("medias_b")))
        ).otherwise(lit(0.0)).as("media_jaccard")
      )

    // --- text branch: slim exploded span pairs ---
    val txtA = txt.select(col("doc_id").as("doc_a"), col("texts").as("texts_a"))
    val txtB = txt.select(col("doc_id").as("doc_b"), col("texts").as("texts_b"))
    val paired = pairs.join(txtA, "doc_a").join(txtB, "doc_b")

    val exA = paired.select(
      col("doc_a"), col("doc_b"), col("texts_b"),
      posexplode_outer(col("texts_a")).as(Seq("ia", "ta"))
    )
    val spanPairs = exA.select(
      col("doc_a"), col("doc_b"), col("ia"), col("ta"),
      posexplode_outer(col("texts_b")).as(Seq("ib", "tb"))
    )

    // Thresholded JW kernel: exact when ≥ 0.75 (the rescue-band floor,
    // the lowest threshold scoring consults), 0.0 otherwise. The kernel
    // short-circuits on a length bound and aborts the match scan once
    // the remaining-characters bound falls below the cutoff — ~80% of
    // span pairs are dissimilar and exit early, allocation-free.
    val sims = spanPairs
      .withColumn("jw", graft.functions.JaroWinklerExpr.jaroWinklerGE(col("ta"), col("tb"), 0.75))
      .withColumn(
        "lev_sim",
        // Levenshtein is O(len²) and only matters as a RESCUE for the
        // band jw ∈ [0.75, jwStrong): below it can't reach levStrong,
        // at/above JW already decides. Profiling: unconditional lev at
        // jw ≥ 0.70 was ~25% of stage-S CPU.
        when(
          col("jw") >= lit(0.75) && col("jw") < lit(w.jwStrong),
          lit(1.0) - levenshtein(col("ta"), col("tb")).cast("double") /
            greatest(length(col("ta")), length(col("tb")), lit(1))
        ).otherwise(lit(0.0))
      )
      .withColumn("strong", col("jw") >= lit(w.jwStrong) || col("lev_sim") >= lit(w.levStrong))

    // distinct-matched-span counts as bit_or masks over the span index
    // (na, nb ≤ 12 « 64): two count_distinct on different columns would
    // force an Expand ×3 over the exploded span-pair stream — the bit
    // masks keep this a single plain hash aggregate.
    val agg = sims
      .groupBy("doc_a", "doc_b")
      .agg(
        coalesce(max(col("jw")), lit(0.0)).as("jw_best"),
        coalesce(max(col("lev_sim")), lit(0.0)).as("lev_best"),
        coalesce(bit_or(when(col("strong"), expr("shiftleft(1L, ia)")).otherwise(0L)), lit(0L)).as("mask_a"),
        coalesce(bit_or(when(col("strong"), expr("shiftleft(1L, ib)")).otherwise(0L)), lit(0L)).as("mask_b")
      )
      .withColumn("strong_a", bit_count(col("mask_a")).cast("long"))
      .withColumn("strong_b", bit_count(col("mask_b")).cast("long"))
      .withColumn("strong_min", least(col("strong_a"), col("strong_b")))

    val textTerm = when(col("strong_min") >= 2, lit(w.wText2))
      .when(col("strong_min") === 1, lit(w.wText1))
      .otherwise(lit(w.wText0))

    agg
      .join(mediaPair, Seq("doc_a", "doc_b"))
      .withColumn("score", textTerm + col("m_score"))
      .withColumn("is_match", col("score") >= lit(w.threshold))
      .select(
        "doc_a", "doc_b", "score", "jw_best", "lev_best", "media_jaccard",
        "strong_min", "mask_a", "mask_b", "is_match"
      )
  }
}
