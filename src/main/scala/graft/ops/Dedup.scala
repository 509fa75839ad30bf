// (md5-simhash variant at the bottom of this file is DuckDB-oracled)
package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.cluster.ConnectedComponents

/** Near-duplicate detection for large text corpora — the operators a
  * training-data pipeline runs before anything else. Exact dedup is a
  * plain hash-groupBy (Analytics.q5); these cover the fuzzy family:
  *
  *  - MinHash + LSH banding (shingle → signature → band → bucket
  *    self-join → exact-Jaccard verify → connected components), the
  *    same machinery as resolution stage B but tuned for the
  *    near-dup regime (J ≥ ~0.5, r=2 bands for high recall).
  *  - SimHash (Charikar): 64-bit per-doc sketch via per-bit vote
  *    aggregation, candidates from 16-bit band equality (any equal
  *    band catches Hamming distance ≤ 3 pairs), verified by
  *    bit_count(xor).
  *
  * Both are explode→aggregate shapes (no per-row nested loops in the
  * plan), shuffle volume O(docs × sketch size), and both reuse the
  * stage-C CC operator for transitive grouping — at 10^12 docs the
  * band self-join is the only quadratic-risk step and is capped the
  * same way as blocking (maxBucket).
  */
object Dedup {

  final case class MinHashCfg(
      shingleN: Int = 5,
      k: Int = 32,
      bands: Int = 16,
      seed: Long = 42L,
      jaccardThreshold: Double = 0.5,
      maxBucket: Int = 300
  ) { def rows: Int = k / bands }

  /** Per-doc shingle-hash sets + MinHash band keys.
    * Input: (id, text); output: (id, hashes, band, band_key).
    * `md5` switches shingle hashing to md5-derived values and band keys
    * to positional arithmetic — both exactly reproducible by any engine
    * (the cross-engine oracle path); default is the faster xxhash64. */
  private def bandedSigs(docs0: DataFrame, cfg: MinHashCfg, md5: Boolean = false): DataFrame = {
    val docs = graft.util.Parallelism.ensure(docs0)
    val shingles = TextOps.charShingles(TextOps.normText(col("text")), cfg.shingleN)
    val hashExpr = if (md5) TextOps.shingleHashesMd5(shingles) else TextOps.shingleHashes(shingles)
    val hashes = docs.select(col("id"), hashExpr.as("hashes")).localCheckpoint(true)
    val exploded = hashes.select(col("id"), explode(col("hashes")).as("h"))
    val aggs = TextOps.minhashAggExprs(col("h"), cfg.k, cfg.seed)
    val sig = exploded.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), TextOps.minhashSigFromAgg(cfg.k).as("sig"))
    val bk =
      if (md5) TextOps.bandKeysArith(col("sig"), cfg.bands, cfg.rows)
      else TextOps.bandKeys(col("sig"), cfg.bands, cfg.rows)
    hashes
      .join(sig, "id")
      .select(col("id"), col("hashes"), posexplode(bk).as(Seq("band", "band_key")))
  }

  /** Candidate pairs from LSH buckets, verified with exact Jaccard over
    * the shingle-hash sets. Output: (id_a, id_b, jaccard). */
  def nearDupPairs(docs: DataFrame, cfg: MinHashCfg = MinHashCfg()): DataFrame =
    nearDupPairsFrom(bandedSigs(docs, cfg), cfg)

  /** Cross-engine-verifiable variant: md5 shingle hashes + arithmetic
    * band keys (a DuckDB oracle reimplements the identical pipeline —
    * see Analytics5.q32). Same banding/verify semantics as
    * [[nearDupPairs]]. */
  def nearDupPairsMd5(docs: DataFrame, cfg: MinHashCfg = MinHashCfg()): DataFrame =
    nearDupPairsFrom(bandedSigs(docs, cfg, md5 = true), cfg)

  private def nearDupPairsFrom(keyed: DataFrame, cfg: MinHashCfg): DataFrame = {
    val sizes = keyed.groupBy("band", "band_key").agg(count(lit(1)).as("n"))
    val kept = keyed.join(sizes.where(col("n") <= cfg.maxBucket), Seq("band", "band_key"))
    val a = kept.select(col("band"), col("band_key"), col("id").as("id_a"), col("hashes").as("h_a"))
    val b = kept.select(col("band"), col("band_key"), col("id").as("id_b"), col("hashes").as("h_b"))
    a.join(b, Seq("band", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn(
        "jaccard",
        size(array_intersect(col("h_a"), col("h_b"))).cast("double") /
          size(array_union(col("h_a"), col("h_b")))
      )
      .where(col("jaccard") >= cfg.jaccardThreshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** md5-arith band keys in [[graft.blocking.Blocking]]'s key-table
    * shape (doc_id, key_kind, block_key) — key_kind = "b<band>" zero-
    * padded so string order equals numeric band order in every engine.
    * Feeds the PRODUCTION candidatesFromKeys (census, cap, witness
    * dedup) for its cross-engine oracle (Analytics5.q38). */
  def blockingKeysMd5(docs: DataFrame, cfg: MinHashCfg = MinHashCfg()): DataFrame =
    bandedSigs(docs, cfg, md5 = true)
      .select(
        col("id").as("doc_id"),
        format_string("b%02d", col("band")).as("key_kind"),
        col("band_key").as("block_key")
      )

  /** Transitive near-dup groups: (id, group_id = min member id). */
  def nearDupGroups(docs: DataFrame, cfg: MinHashCfg = MinHashCfg()): DataFrame = {
    val edges = nearDupPairs(docs, cfg).select(col("id_a").as("src"), col("id_b").as("dst"))
    ConnectedComponents.run(edges, docs.select(col("id").as("doc_id")))
      .assignments
      .select(col("doc_id").as("id"), col("cluster_id").as("group_id"))
  }

  /** Exact n-gram Jaccard near-dup pairs via an inverted shingle index
    * (the dedup family's exact member, reference analog: the verify
    * half of `src/core/cross_device_linker.py`'s similarity gate).
    * Pairs sharing at least one RARE character n-gram (document
    * frequency ≤ `dfCap`) are scored with the exact Jaccard of their
    * rare-gram sets — pure relational shape (explode → distinct →
    * df-filter → gram self-join → count), every step a hash
    * shuffle/aggregate on gram or id, no arrays carried through the
    * join. The df cap bounds the per-gram fanout at C(dfCap, 2), the
    * same hot-key discipline as winnowing/blocking — without it a
    * stop-shingle would go quadratic at corpus scale. For 10^12-doc
    * scale prefer [[nearDupPairs]] (MinHash sketches, O(k) per doc);
    * this operator is the exact verifier and is fully cross-engine
    * reproducible (DuckDB oracle q43 replays it verbatim — grams are
    * plain strings, the Jaccard a single exact int division).
    * Output: (id_a, id_b, inter, na, nb, jaccard). */
  def ngramJaccardPairs(
      docs0: DataFrame,
      n: Int = 5,
      dfCap: Int = 50,
      threshold: Double = 0.5
  ): DataFrame = {
    val docs = graft.util.Parallelism.ensure(docs0)
    val g = docs
      .select(
        col("id"),
        explode(array_distinct(TextOps.charShingles(TextOps.normText(col("text")), n))).as("gram")
      )
      .localCheckpoint(true)
    val rare = g.groupBy("gram").agg(count(lit(1)).as("df"))
      .where(col("df") <= dfCap).select("gram")
    val kept = g.join(rare, "gram")
    val cnt = kept.groupBy("id").agg(count(lit(1)).as("ng"))
    val inter = kept.select(col("gram"), col("id").as("id_a"))
      .join(kept.select(col("gram"), col("id").as("id_b")), "gram")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.select(col("id").as("id_a"), col("ng").as("na")), "id_a")
      .join(cnt.select(col("id").as("id_b"), col("ng").as("nb")), "id_b")
      .withColumn(
        "jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double")
      )
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "na", "nb", "jaccard")
  }

  /** Tokenized (id, word) rows from normalized text. */
  private def tokens(docs0: DataFrame): DataFrame = {
    val docs = graft.util.Parallelism.ensure(docs0)
    docs.select(
      col("id"),
      explode(split(TextOps.normText(col("text")), " ")).as("w")
    ).where(length(col("w")) > 0)
  }

  /** SimHash sketch from per-token hash rows (id, h): per-bit vote sums
    * via `bits` aggregate expressions (same plan shape as MinHash).
    * `strictSign`: bit set when vote > 0 (xxhash64 variant) or ≥ 0
    * (md5 cross-engine variant — ties included so the DuckDB oracle's
    * CASE matches exactly). */
  private def simhashFromHashes(tok: DataFrame, bits: Int, strictSign: Boolean): DataFrame = {
    val bitAggs = (0 until bits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b_$i")
    }
    val votes = tok.groupBy("id").agg(bitAggs.head, bitAggs.tail: _*)
    val sh = (0 until bits)
      .map { i =>
        val set = if (strictSign) col(s"b_$i") > 0 else col(s"b_$i") >= 0
        when(set, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }
      .reduce(_.bitwiseOR(_))
    votes.select(col("id"), sh.as("simhash"))
  }

  /** 64-bit SimHash per doc from whitespace tokens (xxhash64 word
    * hashes — the fast production path). Output: (id, simhash).
    * `fused` (default): one compiled pass per doc
    * (functions/SimHashSig.scala) — token scan, word hashes and the
    * 64 vote counters in registers instead of 64 aggregate
    * expressions per exploded token row. Bit-identical (integer
    * votes are order-independent; SimHashFusedSpec differential). */
  def simhash(docs0: DataFrame, fused: Boolean = true): DataFrame =
    if (fused)
      graft.util.Parallelism.ensure(docs0)
        .select(col("id"), graft.functions.SimHashSig.simhash64(TextOps.normText(col("text"))).as("simhash"))
        .where(col("simhash").isNotNull)
    else
      simhashFromHashes(tokens(docs0).select(col("id"), xxhash64(col("w")).as("h")), 64, strictSign = true)

  /** 60-bit SimHash with md5-derived word hashes — md5 is available in
    * every engine, so this variant is cross-engine verifiable (the
    * DuckDB oracle recomputes the identical sketch). ~2× the hash cost
    * of xxhash64; use [[simhash]] when no external verification is
    * needed. */
  def simhashMd5(docs0: DataFrame): DataFrame =
    simhashFromHashes(
      tokens(docs0).select(col("id"), conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h")),
      60, strictSign = false
    )

  /** Banded near-dup pairs over any (id, simhash) sketch table:
    * candidates via `nBands` equal-width band equality — complete for
    * hamming ≤ nBands − 1 by pigeonhole. */
  def sketchPairs(sh: DataFrame, bits: Int, nBands: Int, maxHamming: Int, maxBucket: Int): DataFrame = {
    val bandBits = bits / nBands
    val mask = (1L << bandBits) - 1
    val banded0 = sh.select(
      col("id"), col("simhash"),
      posexplode(array((0 until nBands).map(i =>
        shiftright(col("simhash"), i * bandBits).bitwiseAND(mask)): _*)).as(Seq("band", "bk"))
    ).localCheckpoint(true)
    // cap pathological buckets (homogeneous corpora collapse many docs
    // onto the same band value) — bounded fan-out, same policy as
    // blocking's block-size cap. A disabled cap (Int.MaxValue — the
    // oracle-twin configuration) skips the census aggregate + join
    // entirely: it would drop nothing and cost a full extra shuffle.
    val banded =
      if (maxBucket == Int.MaxValue) banded0
      else {
        val sizes = banded0.groupBy("band", "bk").agg(count(lit(1)).as("n"))
        banded0.join(sizes.where(col("n") <= maxBucket), Seq("band", "bk"))
      }
    val a = banded.select(col("band"), col("bk"), col("id").as("id_a"), col("simhash").as("s_a"))
    val b = banded.select(col("band"), col("bk"), col("id").as("id_b"), col("simhash").as("s_b"))
    a.join(b, Seq("band", "bk"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("s_a").bitwiseXOR(col("s_b"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming,
    * candidates via 4×16-bit band equality (complete for ≤3). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame =
    sketchPairs(simhash(docs), bits = 64, nBands = 4, maxHamming = maxHamming, maxBucket = maxBucket)

  /** Cross-engine-verifiable SimHash pairs (md5 word hashes, 60-bit
    * sketch, 4×15-bit bands — complete for hamming ≤ 3). */
  def simhashMd5Pairs(docs: DataFrame, maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame =
    sketchPairs(simhashMd5(docs), bits = 60, nBands = 4, maxHamming = maxHamming, maxBucket = maxBucket)
}
