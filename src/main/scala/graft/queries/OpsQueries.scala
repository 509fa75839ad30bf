package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Rows-only queries (no SQL-expressible oracle) for the near-dup /
  * similarity / text-analysis / multimodal operators. Correctness is
  * covered by the ops ScalaTest specs with planted ground truth. */
object OpsQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MinHash+LSH near-dup groups over the documents corpus
    "op_minhash_neardup" -> ((s, dir) =>
      Dedup.nearDupGroups(docs(s, dir), Dedup.MinHashCfg(jaccardThreshold = 0.35, maxBucket = 100))
        .groupBy("group_id").agg(count(lit(1)).as("n_docs"), min("id").as("min_id"))
        .where(col("n_docs") > 1)),

    // SimHash near-dup pairs (Hamming <= 3 on 64-bit sketches)
    "op_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(docs(s, dir), maxHamming = 3)),

    // language-ID heuristic + quality gate over the corpus
    "op_text_profile" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("lang_guess", TextAnalysis.langId(col("text")))
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .groupBy("lang_guess")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("quality") >= 0.8, 1).otherwise(0)).as("n_high_quality")
        )),

    // winnowing fingerprint overlap groups (docs sharing >= 2 rare
    // fingerprints; fingerprints in > 50 docs carry no identity signal
    // and would blow up the self-join on a homogeneous corpus)
    "op_fingerprint_overlap" -> ((s, dir) => {
      val fp = TextAnalysis.fingerprintRows(docs(s, dir)).localCheckpoint(true)
      val rare = fp.groupBy("fp").agg(count(lit(1)).as("df")).where(col("df") <= 50)
      val kept = fp.join(rare, "fp")
      val a = kept.select(col("fp"), col("id").as("id_a"))
      val b = kept.select(col("fp"), col("id").as("id_b"))
      a.join(b, "fp").where(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared_fp"))
        .where(col("shared_fp") >= 2)
    }),

    // LSH-bucketed approximate cosine pairs (scale path of q11)
    "op_ann_lsh" -> ((s, dir) => {
      val vecs = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.lshCosinePairs(vecs, threshold = 0.30)
    }),

    // multimodal: synthesized payloads -> batched stub decode + features
    "op_media_features" -> ((s, dir) => {
      val fixtureDocs = Resolution.staged(s, Resolution.scaleFor(dir)).docs
      Multimodal.decodeAll(Multimodal.mediaTable(s, fixtureDocs))
        .groupBy("format")
        .agg(
          count(lit(1)).as("n_assets"),
          sum("n_bytes").as("sum_bytes"),
          min("width").as("min_w"),
          max("height").as("max_h")
        )
    })
  )
}
