package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pair-counting agreement between two clusterings of the same ids —
  * Rand index and Adjusted Rand Index (Hubert–Arabie). The run-over-run
  * cluster-stability metric the delta/CDC path needs: the cluster CDC
  * feed says WHICH labels changed; agreement says HOW MUCH of the
  * pairwise structure moved (reference analog: the drift detector's
  * composition checks, `src/core/drift_detection.py`, applied to the
  * clustering itself).
  *
  * Everything is exact integer arithmetic so the result is
  * cross-engine verifiable (q47): with doubled pair counts
  * (x·(x−1) = 2·C(x,2)) no intermediate ever divides —
  *   P  = n·(n−1)            (2× total pairs)
  *   S2 = Σ nij·(nij−1)      (2× agreeing-in-both pairs, contingency)
  *   A2 = Σ ai·(ai−1),  B2 = Σ bj·(bj−1)   (marginals)
  *   rand    = (P + 2·S2 − A2 − B2) / P
  *   ari     = (P·S2 − A2·B2) / (T·(A2+B2) − A2·B2),  T = P/2
  * Each emitted double is ONE correctly-rounded IEEE division of exact
  * Longs — bit-stable across engines. Long bound: P·S2 < n⁴, so the
  * scaled products stay in Long for n ≤ ~55k rows; above that emit the
  * components (n, S2, A2, B2 — safe to n ≈ 3·10⁹) and divide in double.
  *
  * Distribution: one shuffle to the contingency cells (≤ |A|·|B| rows),
  * marginals re-aggregated FROM the cells (no second pass over the
  * input), then a 3-way scalar crossJoin of 1-row aggregates.
  */
object ClusterAgreement {

  /** Input: (id, ca, cb) — one row per id with its label in each
    * clustering. Output: one row
    * (n, t_pairs, s2_both, a2, b2, rand, ari); ari is null when the
    * index is undefined (both clusterings trivial: all-singleton or
    * single-cluster).
    *
    * `longSafeMax`: above this n the bit-stable Long products would
    * overflow (ANSI throw), so the indexes switch to double arithmetic
    * over the still-exact Long components — a documented precision
    * step-down, not a crash, on 10⁹+-row universes. The branch is a
    * per-row CASE, so the untaken arm never evaluates. */
  def agreement(assign: DataFrame, longSafeMax: Long = 55000L): DataFrame = {
    val cells = assign.groupBy("ca", "cb").agg(count(lit(1)).as("nij"))
    val core = cells.agg(
      sum(col("nij")).as("n"),
      sum(col("nij") * (col("nij") - 1)).as("s2_both")
    )
    val aMarg = cells.groupBy("ca").agg(sum(col("nij")).as("ai"))
      .agg(sum(col("ai") * (col("ai") - 1)).as("a2"))
    val bMarg = cells.groupBy("cb").agg(sum(col("nij")).as("bj"))
      .agg(sum(col("bj") * (col("bj") - 1)).as("b2"))
    val longSafe = col("n") <= lit(longSafeMax)
    // double twins of every term, for the big-n arm
    val (nd, s2d, a2d, b2d) =
      (col("n").cast("double"), col("s2_both").cast("double"),
        col("a2").cast("double"), col("b2").cast("double"))
    val pd = nd * (nd - 1.0)
    val ariDenD = pd / 2.0 * (a2d + b2d) - a2d * b2d
    core.crossJoin(aMarg).crossJoin(bMarg)
      .withColumn("t_pairs", expr("n * (n - 1) div 2"))
      .select(
        col("n"), col("t_pairs"), col("s2_both"), col("a2"), col("b2"),
        // n <= 1 has zero pairs: P = 0 and both arms would emit 0/0 =
        // NaN, which Spark orders ABOVE every double — a ">= threshold"
        // stability gate would read a pairless comparison as perfect.
        // Null (like ari's undefined case) is the honest value.
        when(col("n") > 1,
          when(longSafe,
            (col("n") * (col("n") - 1) + lit(2L) * col("s2_both") - col("a2") - col("b2")).cast("double")
              / (col("n") * (col("n") - 1)).cast("double")
          ).otherwise((pd + s2d * 2.0 - a2d - b2d) / pd)).as("rand"),
        when(longSafe && col("t_pairs") * (col("a2") + col("b2")) - col("a2") * col("b2") =!= 0L,
          (col("n") * (col("n") - 1) * col("s2_both") - col("a2") * col("b2")).cast("double")
            / (col("t_pairs") * (col("a2") + col("b2")) - col("a2") * col("b2")).cast("double")
        ).when(!longSafe && ariDenD =!= 0.0, (pd * s2d - a2d * b2d) / ariDenD)
          .as("ari")
      )
  }

  /** Agreement between two (id, cluster_id) tables — the stability
    * readout for two pipeline runs (full vs delta, run N vs N+1).
    * Ids present in only one run are dropped: pair-counting agreement
    * is defined over a common universe; the CDC feed reports
    * adds/removes separately. */
  def stability(runA: DataFrame, runB: DataFrame): DataFrame = {
    val a = runA.select(col("doc_id"), col("cluster_id").as("ca"))
    val b = runB.select(col("doc_id"), col("cluster_id").as("cb"))
    agreement(a.join(b, "doc_id"))
  }
}
