package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cluster.ConnectedComponents

/** CC vs a BFS oracle (port of the reference's graph traversal,
  * reference: src/core/identity_graph.py:278-314) on hand-built and
  * seeded-random graphs. */
class ConnectedComponentsSpec extends AnyFunSuite {

  /** Driver-side BFS oracle: node -> min id of its component. */
  private def bfsOracle(nodes: Seq[String], edges: Seq[(String, String)]): Map[String, String] = {
    val adj = scala.collection.mutable.Map.empty[String, List[String]].withDefaultValue(Nil)
    edges.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    val label = scala.collection.mutable.Map.empty[String, String]
    nodes.foreach { n =>
      if (!label.contains(n)) {
        val seen = scala.collection.mutable.Set(n)
        val q = scala.collection.mutable.Queue(n)
        while (q.nonEmpty) {
          val u = q.dequeue()
          adj(u).foreach(v => if (seen.add(v)) q.enqueue(v))
        }
        val m = seen.min
        seen.foreach(v => label(v) = m)
      }
    }
    label.toMap
  }

  private def runCC(
      nodes: Seq[String],
      edges: Seq[(String, String)],
      maxLocalEdges: Long
  ): Map[String, String] = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    val n = nodes.toDF("doc_id")
    val r = ConnectedComponents.run(e, n, maxIter = 30, maxLocalEdges = maxLocalEdges)
    // the local path reports 0 iterations, the distributed loop >= 1
    assert(if (maxLocalEdges == 0) r.iterations >= 1 else r.iterations == 0)
    r.assignments.collect().map(row => row.getString(0) -> row.getString(1)).toMap
  }

  /** Both execution paths must match the BFS oracle AND each other. */
  private def check(nodes: Seq[String], edges: Seq[(String, String)]): Unit = {
    val oracle = bfsOracle(nodes, edges)
    assert(runCC(nodes, edges, maxLocalEdges = 0) == oracle, "distributed path")
    assert(runCC(nodes, edges, maxLocalEdges = Long.MaxValue) == oracle, "local union-find path")
  }

  test("chain") {
    val n = (0 to 9).map(i => f"n$i%02d")
    check(n, n.sliding(2).map(p => (p(0), p(1))).toSeq)
  }

  test("star") {
    val n = (0 to 9).map(i => f"n$i%02d")
    check(n, n.tail.map(x => (n.head, x)))
  }

  test("two components + singletons") {
    val n = (0 to 9).map(i => f"n$i%02d")
    check(n, Seq(("n00", "n01"), ("n01", "n02"), ("n05", "n06"), ("n06", "n07")))
  }

  test("self-loops and duplicate/reversed edges") {
    val n = Seq("a", "b", "c", "d")
    check(n, Seq(("a", "a"), ("a", "b"), ("b", "a"), ("c", "d"), ("c", "d")))
  }

  test("seeded random graphs match BFS oracle") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val nNodes = 40 + trial * 20
      val nodes = (0 until nNodes).map(i => f"n$i%03d")
      val edges = (0 until nNodes).map { _ =>
        (nodes(rnd.nextInt(nNodes)), nodes(rnd.nextInt(nNodes)))
      }
      check(nodes, edges)
    }
  }

  test("long-id graphs: primitive union-find path matches BFS oracle and distributed path") {
    // the pipeline's dictionary-encoded path: LongType ids (incl.
    // negative xxhash64-range values) route the local path through
    // UnionFind.minLabelsLong — labels must equal the generic result
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val nodes = (0 until 200).map(_ => rnd.nextLong()).distinct
    val edges = (0 until 150).map(_ => (nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size))))
    val oracle = {
      val adj = scala.collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
      edges.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
      val label = scala.collection.mutable.Map.empty[Long, Long]
      nodes.foreach { n =>
        if (!label.contains(n)) {
          val seen = scala.collection.mutable.Set(n)
          val q = scala.collection.mutable.Queue(n)
          while (q.nonEmpty) { val u = q.dequeue(); adj(u).foreach(v => if (seen.add(v)) q.enqueue(v)) }
          val m = seen.min
          seen.foreach(v => label(v) = m)
        }
      }
      label.toMap
    }
    val e = edges.toDF("src", "dst")
    val n = nodes.toDF("doc_id")
    for (cap <- Seq(0L, Long.MaxValue)) {
      val got = ConnectedComponents.run(e, n, maxIter = 30, maxLocalEdges = cap)
        .assignments.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == oracle, s"cap=$cap")
    }
  }

  test("cluster ids are component minimum (stable across reruns)") {
    val nodes = Seq("z9", "m5", "a1", "q7")
    val edges = Seq(("z9", "m5"), ("m5", "a1"))
    for (cap <- Seq(0L, Long.MaxValue)) {
      val r = runCC(nodes, edges, cap)
      assert(r("z9") == "a1" && r("m5") == "a1" && r("a1") == "a1" && r("q7") == "q7")
    }
  }
}
