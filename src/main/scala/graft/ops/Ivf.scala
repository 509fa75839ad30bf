package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF-flat approximate nearest neighbour over an embedding column —
  * the inverted-file complement to the random-hyperplane LSH path in
  * [[Similarity]] (the two standard scale paths for ANN; IVF wins when
  * vectors cluster, LSH when they are spread).
  *
  * Index = a coarse k-means quantizer: every vector is assigned to its
  * nearest of `nlist` centroids ("cells"). A query scores ONLY the
  * vectors in its `nprobe` nearest cells. Plan shape: the trained
  * centroid table is collected (nlist rows — a bounded config-sized
  * reduction, same class as the attribution matrices) and folded into
  * ONE constant literal, so cell assignment and probe ranking are
  * NARROW per-row expressions (array_sort over nlist (dist, cell)
  * structs) — zero shuffle until the single cell-id equi-join that
  * replaces the O(n²) cross join. Residual cell skew is AQE's
  * skew-join case; cells are bounded by the quantizer's balance,
  * unlike LSH buckets which follow the data's own collision law.
  *
  * The quantizer is [[graft.cluster.KMeans.lloydDeterministicParts]] —
  * fixed k, fixed iterations, lowest-id init, order-fixed fp folds —
  * so a DuckDB oracle (q41, via [[graft.queries.LloydSql]].chain)
  * recomputes identical cells, probes, and cosines bit-exactly: the
  * q35 twin recipe applied to a whole ANN operator. At index-build
  * scale, train on a deterministic hash-sample (`trainFraction`) —
  * quantizer quality needs a sample, not the corpus; assignment cost
  * is unchanged either way because it never joins the training set.
  *
  * Reference scope: the reference's similarity search is embedding
  * cosine over identity feature vectors (src/models/
  * probabilistic_clustering.py); IVF is the scale path the brief asks
  * for beyond the reference's own operators.
  */
object Ivf {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  private def sqd(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Self top-k: for every vector in `vecs` (id, vec), its k nearest
    * OTHER vectors by cosine among those sharing one of its nprobe
    * nearest cells. Output: (id_a, id_b, rank, cos) — rank 1 = nearest,
    * ties broken by id_b; deterministic end to end.
    *
    * `trainFraction` < 1 trains the quantizer on a deterministic
    * xxhash64 sample of the input (production path); 1.0 trains on
    * everything (the oracle-twin configuration, where the final Lloyd
    * assignment and the argmin below provably coincide). */
  def topK(
      vecs: DataFrame,
      nlist: Int = 8,
      nprobe: Int = 3,
      k: Int = 5,
      iters: Int = 2,
      trainFraction: Double = 1.0
  ): DataFrame = {
    val (members, probes) = index(vecs, nlist, nprobe, iters, trainFraction)
    topKFrom(members, probes, k)
  }

  /** Top-k over a prebuilt index — callers that also instrument the
    * candidate surface (op_ivf_recall) build [[index]] ONCE and consume
    * both from it, instead of paying the quantizer training (the eager
    * Lloyd iterations + centroid collect inside index()) twice. */
  def topKFrom(members: DataFrame, probes: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 1)
    val wTop = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    probes
      .join(members, "cell")
      .where(col("id_a") =!= col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select("id_a", "id_b", "rank", "cos")
  }

  /** The trained index surfaces: (members, probes) —
    * members = (cell, id_b, v_b): each vector in its nearest cell;
    * probes = (cell, id_a, v_a): each query × its nprobe nearest cells.
    * `probes ⋈ members ON cell` is the candidate set every IVF
    * consumer scores; exposed so instrumentation (op_ivf_recall's
    * candidate_frac) measures the REAL candidate volume rather than
    * re-deriving it. */
  def index(
      vecs: DataFrame,
      nlist: Int = 8,
      nprobe: Int = 3,
      iters: Int = 2,
      trainFraction: Double = 1.0
  ): (DataFrame, DataFrame) = {
    // nprobe >= 1 matters: slice(.., 1, 0) would yield an EMPTY probe
    // array and a silently empty result instead of failing fast
    require(nlist >= 1 && nprobe >= 1 && nprobe <= nlist &&
      trainFraction > 0 && trainFraction <= 1)
    val base = vecs.select(
      lit(0L).as("group_id"),
      col("id").as("item_id"),
      asDouble(col("vec")).as("features")
    )
    val pts =
      if (trainFraction >= 1.0) base
      else base.where(
        pmod(xxhash64(lit("ivf"), col("item_id")), lit(1000000L)) <
          lit((trainFraction * 1000000).toLong))
    val (_, cents) =
      graft.cluster.KMeans.lloydDeterministicParts(pts, nlist, iters)

    // nlist rows -> one constant-folded literal, in cluster order (the
    // fold order is the tiebreak order, matching ORDER BY d, cluster)
    val centRows = cents.select("cluster", "cent").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(centRows.nonEmpty, "quantizer produced no centroids — input empty?")
    val centLit = array(centRows.toIndexedSeq.map { case (cl, cent) =>
      struct(lit(cl).as("cell"), array(cent.map(lit): _*).as("cent"))
    }: _*)

    // per-row: all nlist (dist, cell) pairs sorted — struct ordering is
    // lexicographic, so equal distances break toward the lower cell id,
    // identical to the Lloyd argmin and the oracle's row_number order
    def rankedCells(v: Column): Column =
      array_sort(transform(centLit, c =>
        struct(sqd(v, c.getField("cent")).as("d"), c.getField("cell").as("cell"))))

    // inverted file: vector -> its nearest cell (narrow, no shuffle)
    val members = vecs.select(
      col("id").as("id_b"),
      asDouble(col("vec")).as("v_b")
    ).withColumn("cell", element_at(rankedCells(col("v_b")), 1).getField("cell"))

    // probe list: each query's nprobe nearest cells (narrow explode)
    val probes = vecs.select(
      col("id").as("id_a"),
      asDouble(col("vec")).as("v_a")
    ).select(
      col("id_a"), col("v_a"),
      explode(transform(slice(rankedCells(col("v_a")), 1, nprobe), _.getField("cell"))).as("cell")
    )

    (members, probes)
  }
}
