package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.schema.Rng

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k (block nested-loop self-join with
  * the dot product as a higher-order-function fold — stays in
  * whole-stage codegen). Scale path: random-hyperplane LSH bucketing —
  * each vector hashes to a sign-bit bucket; only same-bucket (and
  * optionally 1-bit-flip neighbor bucket) pairs are scored, turning the
  * O(n²) join into an equi-join on bucket id. At 10^12 rows the bucket
  * join shuffles on bucket id and AQE handles residual skew.
  */
object Similarity {

  /** Cosine similarity of two double arrays (index-ordered fold —
    * deterministic summation order). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0), (acc, v) => acc + v * v)
    val nb = aggregate(b, lit(0.0), (acc, v) => acc + v * v)
    // zero vectors → similarity 0 (and no ANSI divide-by-zero)
    when(na > 0 && nb > 0, dot / (sqrt(na) * sqrt(nb))).otherwise(lit(0.0))
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Brute-force all-pairs cosine ≥ threshold. Input: (id, vec). */
  def cosinePairs(vecs: DataFrame, threshold: Double): DataFrame = {
    val a = vecs.select(col("id").as("id_a"), asDouble(col("vec")).as("v_a"))
    val b = vecs.select(col("id").as("id_b"), asDouble(col("vec")).as("v_b"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Brute-force top-k neighbors per query vector. */
  def bruteForceTopK(vecs: DataFrame, k: Int): DataFrame = {
    val a = vecs.select(col("id").as("id_a"), asDouble(col("vec")).as("v_a"))
    val b = vecs.select(col("id").as("id_b"), asDouble(col("vec")).as("v_b"))
    val scored = a.crossJoin(b)
      .where(col("id_a") =!= col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id_a", "id_b", "rank", "cos")
  }

  /** Deterministic random hyperplanes: nPlanes × dim doubles. */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes)(p =>
      Array.tabulate(dim)(d => Rng.double(seed, 0x51a0L, p.toLong, d.toLong) * 2.0 - 1.0))

  /** Sign-bit LSH bucket id for each vector.
    *
    * The plane is a constant-folded literal array and the dot product
    * an index-ordered zip_with/aggregate fold: the earlier explicit
    * 64-term sum chain inlined dim × planes × tables multiply-adds into
    * one generated method — past janino's 64 KB cap, knocking the whole
    * stage out of codegen. The fold keeps the generated method tiny and
    * the summation order identical (left-to-right), so bucket ids are
    * unchanged and deterministic. */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column =
    lshBucketPlanes(vec, planes(nPlanes, dim, seed))

  /** Bucket id from explicit plane weights (shared by the xxhash64-Rng
    * production path and the md5-derived oracle path). */
  def lshBucketPlanes(vec: Column, ps: Array[Array[Double]]): Column = {
    val vd = transform(vec, _.cast("double"))
    val bits = ps.toIndexedSeq.zipWithIndex.map { case (plane, i) =>
      val pArr = array(plane.toIndexedSeq.map(lit): _*)
      val dot = aggregate(zip_with(vd, pArr, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** md5-derived hyperplanes, bit-identical to the SQL derivation
    * `cast('0x'||substr(md5('pl:<t>:<i>:<j>'),1,15) as bigint)` mapped
    * to [-1, 1) — h/2⁶⁰ is a power-of-two division, so the double is
    * exact and a DuckDB oracle recomputes the identical weights (the
    * q28/q32 md5-twin pattern applied to plane GENERATION, closing the
    * op_ann_lsh oracle-visibility gap). */
  def md5Planes(table: Int, nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes) { i =>
      Array.tabulate(dim) { j =>
        val hex = md.digest(s"pl:$table:$i:$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        java.lang.Long.parseLong(hex, 16) / 1152921504606846976.0 * 2.0 - 1.0
      }
    }
  }

  /** [[lshCosinePairs]] with md5-derived planes — the cross-engine
    * oracle twin of the production LSH path; identical plan shape
    * (bucket equi-join, no cross join), only the plane source differs. */
  def lshCosinePairsMd5(
      vecs: DataFrame,
      threshold: Double,
      nPlanes: Int = 8,
      dim: Int = 64,
      tables: Int = 2
  ): DataFrame = {
    val withBuckets = vecs.select(
      col("id"),
      asDouble(col("vec")).as("v"),
      posexplode(array((0 until tables).map(t => lshBucketPlanes(col("vec"), md5Planes(t, nPlanes, dim))): _*))
        .as(Seq("table", "bucket"))
    )
    val a = withBuckets.select(col("table"), col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withBuckets.select(col("table"), col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("table", "bucket"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** LSH-bucketed near-neighbor pairs: only same-bucket pairs are
    * scored (approximate; recall grows with fewer planes / multiple
    * tables). Input: (id, vec).
    *
    * Parameter regimes (collision prob per plane p = 1 − θ/π):
    *  - near-dup mining, cos ≥ 0.8 (θ ≤ 37°, p ≥ 0.8): defaults
    *    (8 planes × 4 tables) → recall ≈ 1 − (1 − 0.8^8)^4 ≈ 0.53 at
    *    the boundary and ≫ 0.9 above cos 0.9, pruning ≳ 99% of random
    *    pairs — the intended 10^12-scale configuration.
    *  - weak-similarity mining, cos ≥ 0.3 (θ ≈ 72°, p ≈ 0.6): use
    *    nPlanes = 2, tables = 6 → recall ≈ 0.93 at the boundary, but
    *    the filter only prunes ~18% of random pairs. That is not an
    *    implementation defect: at p₁ ≈ 0.6 vs p₂ = 0.5 the LSH
    *    exponent ρ = ln p₁ / ln p₂ ≈ 0.75 → near-linear candidate
    *    sets; no hash family prunes aggressively this close to random.
    *    op_ann_recall reports recall AND candidate_frac so regressions
    *    in either direction are visible. */
  def lshCosinePairs(
      vecs: DataFrame,
      threshold: Double,
      nPlanes: Int = 8,
      dim: Int = 64,
      tables: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val withBuckets = vecs.select(
      col("id"),
      asDouble(col("vec")).as("v"),
      posexplode(array((0 until tables).map(t => lshBucket(col("vec"), nPlanes, dim, seed + t)): _*))
        .as(Seq("table", "bucket"))
    )
    val a = withBuckets.select(col("table"), col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withBuckets.select(col("table"), col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("table", "bucket"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
