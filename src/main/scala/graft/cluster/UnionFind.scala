package graft.cluster

/** Driver-side union-by-min with path compression, id-type generic
  * (string doc ids or the pipeline's dictionary-encoded longs — any
  * Comparable). Shared by the adaptive small-graph fast paths in
  * [[ConnectedComponents]] and [[Attach]]: below a bounded edge count,
  * one collect + one in-memory pass replaces ~2 shuffle rounds per
  * large-star/small-star iteration (latency-bound at small scale); the
  * distributed path stays the over-cap route.
  *
  * Union by MIN means every component's root IS its minimum member, so
  * the resulting labels are identical to the distributed algorithm's
  * min-id labels — callers can switch paths without output changes.
  */
private[cluster] object UnionFind {

  private def lt(a: Any, b: Any): Boolean =
    a.asInstanceOf[Comparable[Any]].compareTo(b) < 0

  /** Labels for every node that ends up attached to a smaller root:
    * (node, min-root) pairs. Nodes absent from the result are their own
    * root (callers left-join and coalesce to the node id). */
  def minLabels(edges: Array[org.apache.spark.sql.Row]): Seq[(Any, Any)] = {
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { row =>
      val (a, b) = (find(row.get(0)), find(row.get(1)))
      if (a != b) { if (lt(a, b)) parent(b) = a else parent(a) = b }
    }
    parent.keys.toSeq.map(k => (k, find(k)))
  }

  /** The label pairs as a 2-column DataFrame with the given column
    * names, typed like `idType`.
    *
    * The labels ship to executors as ONE broadcast variable consumed by
    * `mapPartitions` over a row-range RDD — `parallelize(rows)` would
    * serialize the slice of label pairs into every task closure
    * (measured: "task of very large size (8350 KiB)" warnings at the
    * 5M-edge adaptive cap). The broadcast is sent once per executor,
    * tasks carry only (start, end) offsets. */
  def labelFrame(
      spark: org.apache.spark.sql.SparkSession,
      labels: Seq[(Any, Any)],
      idType: org.apache.spark.sql.types.DataType,
      keyCol: String,
      valCol: String
  ): org.apache.spark.sql.DataFrame = {
    val arr = labels.toArray
    val bc = spark.sparkContext.broadcast(arr)
    val parts = math.max(1, math.min(arr.length / 50000, spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext
      .parallelize(0 until parts, parts)
      .mapPartitions { it =>
        val a = bc.value
        it.flatMap { p =>
          val start = (p.toLong * a.length / parts).toInt
          val end = ((p + 1).toLong * a.length / parts).toInt
          (start until end).iterator.map { i =>
            val kv = a(i); org.apache.spark.sql.Row(kv._1, kv._2)
          }
        }
      }
    spark.createDataFrame(
      rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(keyCol, idType),
        org.apache.spark.sql.types.StructField(valCol, idType)
      ))
    )
  }
}
