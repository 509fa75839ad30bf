package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.schema.Rng

/** Text normalization, character shingles, MinHash signatures and LSH
  * band keys — all pure `Column` combinators (`transform`, `xxhash64`,
  * `slice`, higher-order `array_min`) so the whole pipeline stays inside
  * whole-stage codegen; no UDFs, no custom expressions needed here
  * (SURVEY.md §2.13, §7.2).
  *
  * The reference has no text-similarity blocking (it blocks on exact
  * device/account keys, reference: src/core/cross_device_linker.py:114-128);
  * MinHash/LSH is required by the north rule for normalized-text keys.
  */
object TextOps {

  /** Lowercase, strip non-alphanumerics to spaces, collapse whitespace. */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9]+", " "), " +", " "))

  /** Character n-gram shingles of a (already normalized) string.
    * Non-empty strings shorter than n yield the whole string as one
    * shingle; empty/null text yields NO shingles (otherwise every
    * empty doc would share one degenerate MinHash signature and form a
    * giant all-pairs block). */
  def charShingles(c: Column, n: Int): Column =
    when(length(c) === 0, array().cast("array<string>"))
      .when(length(c) < n, array(c))
      .otherwise(transform(sequence(lit(0), length(c) - n), i => c.substr(i + 1, lit(n))))

  /** One 64-bit hash per shingle (xxhash64, codegen'd). */
  def shingleHashes(shingles: Column): Column =
    array_distinct(transform(shingles, s => xxhash64(s)))

  /** md5-derived 60-bit shingle hashes — ~2× the cost of xxhash64 but
    * available in every engine, so pipelines built on these are
    * cross-engine verifiable (a DuckDB oracle recomputes the identical
    * values via `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`). */
  def shingleHashesMd5(shingles: Column): Column =
    array_distinct(transform(shingles, s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))

  /** Mersenne prime 2^31 − 1: the universal-hash modulus. Products
    * (a_i < P) · (x < P) stay under 2^62, so the arithmetic is exact
    * under ANSI mode (no Long overflow). */
  private val P = 2147483647L

  /** Deterministic multipliers/offsets for the k affine MinHash
    * "permutations" h_i(x) = (a_i·x + b_i) mod P, a_i ∈ [1,P), b_i ∈ [0,P). */
  private def affine(k: Int, seed: Long): Array[(Long, Long)] =
    Array.tabulate(k) { i =>
      (1L + math.floorMod(Rng.h(seed, 0x1111L, i.toLong), P - 1), math.floorMod(Rng.h(seed, 0x2222L, i.toLong), P))
    }

  /** The k MinHash aggregate expressions over an exploded shingle-hash
    * column `h`: min((a_i·(h mod P) + b_i) mod P) for i < k.
    *
    * Deliberately an explode→aggregate shape, NOT k nested `array_min(
    * transform(...))` combinators: the nested form inlines the whole
    * text pipeline k×bands times (a multi-MB expression tree per task,
    * measured 5.5 MiB at k=48/b=12), while this form is one
    * WholeStageCodegen hash-aggregate with k tiny exprs and map-side
    * partial aggregation — shuffle volume is k longs per doc. */
  def minhashAggExprs(h: Column, k: Int, seed: Long = 42L): Seq[Column] = {
    val ab = affine(k, seed)
    ab.toIndexedSeq.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(pmod(h, lit(P)) * lit(a) + lit(b), lit(P))).as(s"mh_$i")
    }
  }

  /** Assemble the signature array from the k aggregated min columns. */
  def minhashSigFromAgg(k: Int): Column =
    array((0 until k).map(i => col(s"mh_$i")): _*)

  /** LSH band keys: hash each of the `bands` contiguous r-row slices of
    * the signature (r = k / bands). Returns array<long> of length
    * `bands`; band index is mixed in so identical slices in different
    * bands don't collide. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column = {
    val ks = (0 until bands).map(j => xxhash64(lit(j), slice(sig, j * rows + 1, rows)))
    when(sig.isNotNull, array(ks: _*))
  }

  /** Arithmetic band keys for the cross-engine-verifiable path: the r
    * signature values of a band combined positionally as Σ v·P^i — pure
    * BIGINT arithmetic any engine reproduces exactly (each v < P, so
    * r ≤ 2 stays under 2^62; xxhash64 band mixing is Spark-only).
    * Band identity downstream is (band index, key). */
  def bandKeysArith(sig: Column, bands: Int, rows: Int): Column = {
    require(rows <= 2, "arithmetic band keys overflow Long beyond 2 rows per band")
    val ks = (0 until bands).map { j =>
      (0 until rows)
        .map(r => element_at(sig, j * rows + r + 1))
        .reduce((a, b) => a * lit(P) + b)
    }
    when(sig.isNotNull, array(ks: _*))
  }

  /** The Mersenne modulus and affine constants, exposed so oracle SQL
    * can be generated with the exact same "permutations". */
  val mersennePrime: Long = P
  def affineConsts(k: Int, seed: Long = 42L): Seq[(Long, Long)] = affine(k, seed).toSeq
}
