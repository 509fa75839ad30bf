package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.schema.Fixture
import graft.text.TextOps

object CkptBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (docsPath, _) = Fixture.ensureWritten(spark, "bench")
    val docs = spark.read.parquet(docsPath)
    def t(name: String)(b: => Any): Unit = {
      val t0 = System.nanoTime(); val r = b
      println(f"[ck] $name%-34s ${(System.nanoTime()-t0)/1e9}%7.1f s  ($r)")
    }
    val texts = transform(filter(col("spans"), s => s.getField("kind") === lit("text")), s => s.getField("text"))
    val docText = col("dt")
    val base = docs.select(col("doc_id"), array_join(texts, " ").as("dt")).localCheckpoint(true)
    t("concat only count")(base.count())
    t("normText count")(base.select(TextOps.normText(docText).as("n")).select(sum(length(col("n")))).head().getLong(0))
    val normed = base.select(col("doc_id"), TextOps.normText(docText).as("n")).localCheckpoint(true)
    t("shingles size")(normed.select(sum(size(TextOps.charShingles(col("n"), 4)))).head().getLong(0))
    t("shingleHashes distinct size")(normed.select(sum(size(TextOps.shingleHashes(TextOps.charShingles(col("n"), 4))))).head().getLong(0))
    val ex = normed.select(col("doc_id"), explode(TextOps.shingleHashes(TextOps.charShingles(col("n"), 4))).as("h")).localCheckpoint(true)
    t("exploded rows")(ex.count())
    val aggs = TextOps.minhashAggExprs(col("h"), 48)
    t("48-min agg")(ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*).count())
    val aggs12 = TextOps.minhashAggExprs(col("h"), 12)
    t("12-min agg")(ex.groupBy("doc_id").agg(aggs12.head, aggs12.tail: _*).count())
    spark.stop()
  }
}
