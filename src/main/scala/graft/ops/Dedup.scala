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
    * Input: (id, text); output: (id, hashes, band, band_key). */
  private def bandedSigs(docs0: DataFrame, cfg: MinHashCfg): DataFrame = {
    val docs = graft.util.Parallelism.ensure(docs0)
    val hashes = docs.select(
      col("id"),
      TextOps.shingleHashes(TextOps.charShingles(TextOps.normText(col("text")), cfg.shingleN)).as("hashes")
    ).localCheckpoint(true)
    val exploded = hashes.select(col("id"), explode(col("hashes")).as("h"))
    val aggs = TextOps.minhashAggExprs(col("h"), cfg.k, cfg.seed)
    val sig = exploded.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), TextOps.minhashSigFromAgg(cfg.k).as("sig"))
    hashes
      .join(sig, "id")
      .select(col("id"), col("hashes"), posexplode(TextOps.bandKeys(col("sig"), cfg.bands, cfg.rows)).as(Seq("band", "band_key")))
  }

  /** Candidate pairs from LSH buckets, verified with exact Jaccard over
    * the shingle-hash sets. Output: (id_a, id_b, jaccard). */
  def nearDupPairs(docs: DataFrame, cfg: MinHashCfg = MinHashCfg()): DataFrame = {
    val keyed = bandedSigs(docs, cfg)
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

  /** Transitive near-dup groups: (id, group_id = min member id). */
  def nearDupGroups(docs: DataFrame, cfg: MinHashCfg = MinHashCfg()): DataFrame = {
    val edges = nearDupPairs(docs, cfg).select(col("id_a").as("src"), col("id_b").as("dst"))
    ConnectedComponents.run(edges, docs.select(col("id").as("doc_id")))
      .assignments
      .select(col("doc_id").as("id"), col("cluster_id").as("group_id"))
  }

  /** 64-bit SimHash per doc from whitespace tokens: per-bit vote sums
    * via 64 aggregate expressions (same plan shape as MinHash).
    * Output: (id, simhash). */
  def simhash(docs0: DataFrame): DataFrame = {
    val docs = graft.util.Parallelism.ensure(docs0)
    val tok = docs.select(
      col("id"),
      explode(split(TextOps.normText(col("text")), " ")).as("w")
    ).where(length(col("w")) > 0)
      .select(col("id"), xxhash64(col("w")).as("h"))
    val bitAggs = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b_$i")
    }
    val votes = tok.groupBy("id").agg(bitAggs.head, bitAggs.tail: _*)
    val sh = (0 until 64)
      .map(i => when(col(s"b_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    votes.select(col("id"), sh.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming,
    * candidates via 4×16-bit band equality (complete for ≤3). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sh = simhash(docs)
    val banded0 = sh.select(
      col("id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(0xffffL)): _*)).as(Seq("band", "bk"))
    ).localCheckpoint(true)
    // cap pathological buckets (homogeneous corpora collapse many docs
    // onto the same band value) — bounded fan-out, same policy as
    // blocking's block-size cap
    val sizes = banded0.groupBy("band", "bk").agg(count(lit(1)).as("n"))
    val banded = banded0.join(sizes.where(col("n") <= maxBucket), Seq("band", "bk"))
    val a = banded.select(col("band"), col("bk"), col("id").as("id_a"), col("simhash").as("s_a"))
    val b = banded.select(col("band"), col("bk"), col("id").as("id_b"), col("simhash").as("s_b"))
    a.join(b, Seq("band", "bk"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("s_a").bitwiseXOR(col("s_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
