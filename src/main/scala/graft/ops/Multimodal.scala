package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Rng

/** Multimodal (image/audio) columns as opaque `binary` payloads with
  * typed metadata, plus batch decode / feature-extraction plumbing.
  *
  * Both halves are REAL here:
  *  - payload synthesis writes well-formed files — PNG (zlib IDAT +
  *    CRC32 chunks, readable by javax.imageio — the spec cross-checks),
  *    baseline JPEG marker structure, and RIFF/WAVE PCM audio;
  *  - [[MediaCodec.decode]] is a real pure-JVM header parser: PNG IHDR
  *    big-endian dims, JPEG marker walk to SOF0/1/2, WAV fmt-chunk
  *    sample rate/channels. No native codecs required.
  *
  * Features are a normalized 16-bin byte histogram — a real, cheap,
  * deterministic content feature (a CNN/CLIP embedding would slot into
  * the same batched shape; no model weights ship in this sandbox).
  *
  * The batch vehicle is `mapPartitions` over typed rows — the Scala
  * analog of `mapInPandas`: per-partition batches amortize any decoder
  * setup, and the decode runs distributed next to the data.
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

    /** Parse format + dimensions from real file headers.
      * For WAV, (width, height) carries (sample_rate, channels).
      * Unknown/corrupt payloads → ("unknown", 0, 0) — the reject path. */
    def decode(payload: Array[Byte]): (String, Int, Int) = {
      def be32(o: Int) = ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
        ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
      def be16(o: Int) = ((payload(o) & 0xff) << 8) | (payload(o + 1) & 0xff)
      def le32(o: Int) = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
        ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
      def le16(o: Int) = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)

      if (payload.length >= 24 &&
        (payload(0) & 0xff) == 0x89 && payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G' &&
        payload(12) == 'I' && payload(13) == 'H' && payload(14) == 'D' && payload(15) == 'R') {
        ("png", be32(16), be32(20))
      } else if (payload.length >= 4 && (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) {
        // JPEG: walk markers to a start-of-frame
        var o = 2
        var res: (String, Int, Int) = ("unknown", 0, 0)
        var done = false
        while (!done && o + 3 < payload.length) {
          if ((payload(o) & 0xff) != 0xff) { done = true }
          else {
            val marker = payload(o + 1) & 0xff
            if (marker == 0xd9 || marker == 0xda) done = true // EOI / SOS
            else {
              val len = be16(o + 2)
              if ((marker == 0xc0 || marker == 0xc1 || marker == 0xc2) && o + 8 < payload.length) {
                res = ("jpeg", be16(o + 7), be16(o + 5)) // width, height
                done = true
              } else o += 2 + len
            }
          }
        }
        res
      } else if (payload.length >= 36 &&
        payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
        payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E') {
        ("wav", le32(24), le16(22)) // sample rate, channels
      } else ("unknown", 0, 0)
    }

    /** Normalized 16-bin byte histogram — deterministic real content
      * feature with the same array<float> shape a learned embedding
      * would have. */
    def byteHistogram(payload: Array[Byte], bins: Int = 16): Array[Float] = {
      val h = new Array[Int](bins)
      payload.foreach(b => h((b & 0xff) * bins / 256) += 1)
      val n = math.max(1, payload.length).toFloat
      h.map(_ / n)
    }
  }

  /** Real media encoders for the synthetic fixture payloads. */
  object MediaGen {

    /** Well-formed PNG: 8-bit RGB, deterministic pixels, zlib-deflated
      * IDAT, CRC32-checked chunks (readable by any PNG decoder). */
    def png(seed: Long, width: Int, height: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      def chunk(typ: String, body: Array[Byte]): Unit = {
        def be(i: Int) = Array((i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
        out.write(be(body.length))
        val tb = typ.getBytes("US-ASCII")
        val crc = new java.util.zip.CRC32
        crc.update(tb); crc.update(body)
        out.write(tb); out.write(body); out.write(be(crc.getValue.toInt))
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(width).putInt(height)
        .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      chunk("IHDR", ihdr.array())
      // raw scanlines: filter byte 0 + RGB
      val raw = new Array[Byte](height * (1 + width * 3))
      var o = 0
      for (y <- 0 until height) {
        raw(o) = 0; o += 1
        for (x <- 0 until width; c <- 0 until 3) {
          raw(o) = (Rng.h(seed, y.toLong, x.toLong, c.toLong) & 0xff).toByte; o += 1
        }
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      // loop until finished(): a single fixed-buffer deflate call would
      // silently truncate IDAT on incompressible scanline data
      val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!deflater.finished()) {
        val n = deflater.deflate(buf)
        zout.write(buf, 0, n)
      }
      deflater.end()
      chunk("IDAT", zout.toByteArray)
      chunk("IEND", Array.empty[Byte])
      out.toByteArray
    }

    /** Structurally valid baseline JPEG: SOI, JFIF APP0, SOF0 with the
      * dimensions, EOI (no entropy data — header-parse target). */
    def jpeg(width: Int, height: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
      b(0xff, 0xd8) // SOI
      b(0xff, 0xe0, 0x00, 0x10) // APP0 len 16
      out.write("JFIF".getBytes("US-ASCII")); b(0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00)
      b(0xff, 0xc0, 0x00, 0x11, 0x08) // SOF0 len 17, 8-bit
      b(height >>> 8, height & 0xff, width >>> 8, width & 0xff)
      b(0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
      b(0xff, 0xd9) // EOI
      out.toByteArray
    }

    /** Valid RIFF/WAVE, 16-bit PCM, deterministic samples. */
    def wav(seed: Long, sampleRate: Int, channels: Int, nSamples: Int = 64): Array[Byte] = {
      val dataLen = nSamples * channels * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      (0 until nSamples * channels).foreach(i => bb.putShort((Rng.h(seed, i.toLong) & 0xffffL).toShort))
      bb.array()
    }
  }

  /** Deterministic well-formed payload for a media_ref: format and
    * dimensions derive from the ref hash (real pipelines read
    * object-store blobs instead). */
  def syntheticPayload(ref: String): Array[Byte] = {
    val seed = ref.foldLeft(0L)((acc, c) => Rng.mix(acc ^ c.toLong))
    math.floorMod(seed >>> 8, 3L).toInt match {
      case 0 => MediaGen.png(seed, 4 + math.floorMod(seed >>> 16, 13L).toInt, 4 + math.floorMod(seed >>> 24, 13L).toInt)
      case 1 => MediaGen.jpeg(16 + math.floorMod(seed >>> 16, 1904L).toInt, 16 + math.floorMod(seed >>> 24, 1064L).toInt)
      case _ => MediaGen.wav(seed, Array(8000, 16000, 44100)(math.floorMod(seed >>> 16, 3L).toInt), 1 + math.floorMod(seed >>> 24, 2L).toInt)
    }
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
      .map { ref =>
        val p = syntheticPayload(ref)
        MediaRow(ref, if (MediaCodec.decode(p)._1 == "wav") "audio" else "image", p)
      }
  }

  final case class MediaParam(doc_id: String, sel: Long, p1: Long, p2: Long)

  /** Cross-engine encode→parse round trip (q54): parameters arrive as
    * SQL-expressible md5-derived integers, a REAL payload is encoded
    * with [[MediaGen]] and re-parsed with [[MediaCodec.decode]] — so an
    * analytic oracle that never sees a byte can still predict exactly
    * what the parse must return. sel: 0 png / 1 jpeg / 2 wav; p1/p2:
    * nonnegative hash-derived params (dims, sample rate, channels).
    * For WAV the decoded (width, height) carries (sample_rate,
    * channels), matching decode()'s contract. */
  def roundTrip(params: Dataset[MediaParam]): DataFrame = {
    import params.sparkSession.implicits._
    params.mapPartitions { it =>
      it.map { p =>
        // fail with the contract named, not a task-level array/encoding
        // exception: a negative p1 would make (p1 % 3) negative in the
        // wav-rate lookup and produce out-of-contract PNG/JPEG dims
        require(p.p1 >= 0 && p.p2 >= 0,
          s"MediaParam p1/p2 must be nonnegative (doc_id=${p.doc_id}, p1=${p.p1}, p2=${p.p2})")
        val payload = p.sel match {
          case 0L => MediaGen.png(p.p1, (4 + p.p1 % 29).toInt, (4 + p.p2 % 29).toInt)
          case 1L => MediaGen.jpeg((16 + p.p1 % 1904).toInt, (16 + p.p2 % 1064).toInt)
          case _  => MediaGen.wav(p.p1, Array(8000, 16000, 44100)((p.p1 % 3).toInt), (1 + p.p2 % 2).toInt)
        }
        val (fmt, w, h) = MediaCodec.decode(payload)
        (p.doc_id, fmt, w.toLong, h.toLong)
      }
    }.toDF("doc_id", "format", "width", "height")
  }

  /** Batched decode + feature extraction: one partition = one batch,
    * kernels invoked per row inside the partition iterator (the
    * mapInPandas-equivalent shape — amortizes any per-batch decoder
    * setup). */
  def decodeAll(media: Dataset[MediaRow], featureBins: Int = 16): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs would initialize per-partition state here
      it.map { row =>
        val (fmt, w, h) = MediaCodec.decode(row.payload)
        DecodedRow(
          row.media_ref, row.kind, fmt, w, h, row.payload.length,
          MediaCodec.byteHistogram(row.payload, featureBins)
        )
      }
    }
  }
}
