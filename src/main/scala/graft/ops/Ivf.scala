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
  * vectors in its `nprobe` nearest cells, replacing the O(n²) cross
  * join with (a) one broadcast of nlist·dim doubles for cell probing
  * and (b) one equi-join on cell id. At 10^12 rows the members table
  * shuffles once on cell id; residual cell skew is AQE's skew-join
  * case (cells are bounded by the quantizer's balance, unlike LSH
  * buckets which follow the data's own collision law).
  *
  * The quantizer is [[graft.cluster.KMeans.lloydDeterministicParts]] —
  * fixed k, fixed iterations, lowest-id init, order-fixed fp folds —
  * so a DuckDB oracle (q41, via [[graft.queries.LloydSql]].chain)
  * recomputes identical cells, probes, and cosines bit-exactly: the
  * q35 twin recipe applied to a whole ANN operator. A production
  * deployment would swap in the silhouette-selected k-means++
  * quantizer unchanged — only the centroid source differs.
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
    * `iters` Lloyd rounds train the quantizer on the full input (at
    * index-build scale one would train on a sample; the assignment
    * join below is the same either way). */
  def topK(
      vecs: DataFrame,
      nlist: Int = 8,
      nprobe: Int = 3,
      k: Int = 5,
      iters: Int = 2
  ): DataFrame = {
    require(nprobe <= nlist && k >= 1)
    val pts = vecs.select(
      lit(0L).as("group_id"),
      col("id").as("item_id"),
      asDouble(col("vec")).as("features")
    )
    val (assigned, cents) =
      graft.cluster.KMeans.lloydDeterministicParts(pts, nlist, iters)

    // inverted file: vector → its cell (one row each, shuffled on cell)
    val members = vecs
      .select(col("id").as("id_b"), asDouble(col("vec")).as("v_b"))
      .join(
        assigned.select(col("item_id").as("id_b"), col("cluster").as("cell")),
        "id_b"
      )

    // probe list: each query's nprobe nearest cells. The centroid table
    // is nlist rows — broadcast; the rank window is per-query.
    val wProbe = Window.partitionBy("id_a").orderBy(col("cdist"), col("cell"))
    val probes = vecs
      .select(col("id").as("id_a"), asDouble(col("vec")).as("v_a"))
      .crossJoin(broadcast(cents.select(col("cluster").as("cell"), col("cent"))))
      .withColumn("cdist", sqd(col("v_a"), col("cent")))
      .withColumn("crk", row_number().over(wProbe))
      .where(col("crk") <= nprobe)
      .select("id_a", "v_a", "cell")

    val wTop = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    probes
      .join(members, "cell")
      .where(col("id_a") =!= col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select("id_a", "id_b", "rank", "cos")
  }
}
