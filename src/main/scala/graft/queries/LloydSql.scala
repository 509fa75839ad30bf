package graft.queries

/** DuckDB CTE generator for the deterministic distributed Lloyd
  * (cross-engine twin of [[graft.cluster.KMeans.lloydDeterministic]]):
  * c0 init = the k lowest-item_id points per group, then alternating
  * assignment (argmin with cluster tiebreak) and member-mean update
  * CTEs with the SAME order-fixed floating-point folds as the Spark
  * operator (item_id order per dimension, pos order for the rebuilt
  * centroid array). Shared by the q35 per-item oracle and the
  * op_kmeans_* per-group summaries (Analytics4).
  *
  * The caller prepends `WITH pts AS (...)` providing
  * (group_id, item_id, v: DOUBLE[]) and appends a final SELECT over
  * `a<iters>` (group_id, item_id, cluster, d).
  */
private[queries] object LloydSql {

  def chain(k: Int, iters: Int, dim: Int): String = {
    // mirror the Spark twin's contract (KMeans.lloydDeterministicParts
    // requires iters >= 1); iters = 0 would emit SQL referencing
    // nonexistent CTEs and die with a confusing binder error instead
    require(iters >= 1, s"LloydSql.chain requires iters >= 1 (got $iters)")
    require(k >= 1 && dim >= 1, s"LloydSql.chain: k=$k dim=$dim must be >= 1")
    def assignCte(i: Int): String =
      s"""a$i AS (
         SELECT group_id, item_id, cluster, d FROM (
           SELECT p.group_id, p.item_id, c.cluster,
             list_reduce(list_transform(list_zip(p.v, c.cent), z -> (z[1] - z[2]) * (z[1] - z[2])), (a, b) -> a + b) AS d,
             row_number() OVER (PARTITION BY p.group_id, p.item_id ORDER BY
               list_reduce(list_transform(list_zip(p.v, c.cent), z -> (z[1] - z[2]) * (z[1] - z[2])), (a, b) -> a + b),
               c.cluster) AS rk
           FROM pts p JOIN c${i - 1} c USING (group_id))
         WHERE rk = 1)"""
    def updateCte(i: Int): String =
      s"""c$i AS (
         SELECT group_id, cluster, list(m ORDER BY pos) AS cent FROM (
           SELECT e.group_id, e.cluster, e.pos,
             list_reduce(list(e.x ORDER BY e.item_id), (a, b) -> a + b) / count(*) AS m
           FROM (
             SELECT p.group_id, a.cluster, p.item_id, g.pos,
               p.v[CAST(g.pos + 1 AS INTEGER)] AS x
             FROM pts p
             JOIN a$i a USING (group_id, item_id),
             (SELECT unnest(range($dim)) AS pos) g) e
           GROUP BY 1, 2, 3)
         GROUP BY 1, 2)"""
    val ctes = (1 until iters).flatMap(i => Seq(assignCte(i), updateCte(i))) :+ assignCte(iters)
    s"""c0 AS (
       SELECT group_id, CAST(rn - 1 AS BIGINT) AS cluster, v AS cent FROM (
         SELECT group_id, v, row_number() OVER (PARTITION BY group_id ORDER BY item_id) AS rn
         FROM pts)
       WHERE rn <= $k),
     ${ctes.mkString(",\n     ")}"""
  }
}
