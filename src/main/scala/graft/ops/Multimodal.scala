package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Rng

/** Multimodal (image/audio/video) columns as opaque `binary` payloads
  * with typed metadata, plus batch decode / feature-extraction
  * plumbing.
  *
  * The Spark-side machinery here is real and tested: binary column
  * schema, deterministic payload synthesis, batched per-partition
  * decode (`mapPartitions` over typed rows — the Scala analog of
  * `mapInPandas` batch UDFs), and a codegen-friendly feature path.
  * The *decode kernels themselves are STUBS* — this container ships no
  * image/audio libraries — producing deterministic pseudo-metadata and
  * pseudo-features from the payload bytes. Swapping in a real decoder
  * changes only the bodies of [[MediaCodec.decodeStub]] /
  * [[MediaCodec.featuresStub]].
  */
object Multimodal {

  final case class MediaRow(media_ref: String, kind: String, payload: Array[Byte])
  final case class DecodedRow(
      media_ref: String,
      kind: String,
      format: String,
      width: Int,
      height: Int,
      n_bytes: Int,
      features: Array[Float]
  )

  object MediaCodec {
    /** STUB — deterministic fake of an image/audio header parse.
      * A real implementation would hand `payload` to e.g. a JPEG/PNG
      * decoder; none is available in this sandbox. */
    def decodeStub(payload: Array[Byte]): (String, Int, Int) = {
      val h = payload.take(8).foldLeft(0L)((acc, b) => Rng.mix(acc ^ (b & 0xffL)))
      val fmt = Array("jpeg", "png", "webp", "wav").apply(math.floorMod(h >>> 8, 4).toInt)
      val w = 64 + math.floorMod(h >>> 16, 1920).toInt
      val ht = 64 + math.floorMod(h >>> 32, 1080).toInt
      (fmt, w, ht)
    }

    /** STUB — deterministic pseudo-embedding from payload bytes.
      * Stands in for a CNN/CLIP-style feature extractor. */
    def featuresStub(payload: Array[Byte], dim: Int): Array[Float] = {
      val base = payload.foldLeft(0L)((acc, b) => Rng.mix(acc ^ (b & 0xffL)))
      Array.tabulate(dim)(i => ((Rng.h(base, i.toLong) >>> 11) * 1.1102230246251565e-16).toFloat * 2f - 1f)
    }
  }

  /** Deterministic synthetic payload for a media_ref (the fixture has
    * refs, not bytes; real pipelines read object-store blobs). */
  def syntheticPayload(ref: String, nBytes: Int = 256): Array[Byte] = {
    val seed = ref.foldLeft(0L)((acc, c) => Rng.mix(acc ^ c.toLong))
    Array.tabulate(nBytes)(i => (Rng.h(seed, i.toLong) & 0xff).toByte)
  }

  /** Media payload table from the fixture docs: one row per distinct
    * media_ref, with synthesized bytes. */
  def mediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs
      .select(explode(col("spans")).as("s"))
      .where(col("s.kind") === "media")
      .select(col("s.media_ref").as("media_ref"))
      .distinct()
      .as[String]
      .map(ref => MediaRow(ref, "image", syntheticPayload(ref)))
  }

  /** Batched decode + feature extraction: one partition = one batch,
    * kernels invoked per row inside the partition iterator (the
    * mapInPandas-equivalent shape — amortizes any per-batch model
    * setup a real decoder needs). */
  def decodeAll(media: Dataset[MediaRow], featureDim: Int = 16): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs would initialize per-partition state here
      it.map { row =>
        val (fmt, w, h) = MediaCodec.decodeStub(row.payload)
        DecodedRow(
          row.media_ref, row.kind, fmt, w, h, row.payload.length,
          MediaCodec.featuresStub(row.payload, featureDim)
        )
      }
    }
  }
}
