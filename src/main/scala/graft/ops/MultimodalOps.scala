package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted in batches inside a typed
  * `mapPartitions` with POOLED decoder state (the Spark-side shape a real
  * image/audio pipeline needs; the actual codec is a clearly-marked
  * deterministic STUB — the decode libraries are not in this container).
  */
object MultimodalOps {

  /** Oracle-checked metadata pass: treat text as the binary payload;
    * byte length + sha256 content address (pure codegen'd columns).
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        octet_length(col("text")).cast("int").as("byte_len"),
        sha2(col("text").cast("binary"), 256).as("sha256"))
      .orderBy("doc_id")

  def mediaFeaturesSql: String =
    """SELECT doc_id, CAST(octet_length(text::BLOB) AS INT) AS byte_len,
       sha256(text) AS sha256
       FROM documents ORDER BY doc_id"""

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class DecodedMedia(
      doc_id: Long,
      byte_len: Int,
      width: Int,
      height: Int,
      thumb_len: Int,
      features: Seq[Float])
  final case class Frame(
      doc_id: Long,
      frame_idx: Int,
      frame_bytes: Int,
      mean_byte: Double)

  /** STUB decoder: a real implementation would wrap a pooled native codec
    * (libjpeg/ffmpeg) here; this deterministic fake derives "dimensions"
    * and a 8-dim "feature vector" from the payload bytes so the schema,
    * batching, and partition shape are real and testable.
    */
  final class StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val n = payload.length
      val width = 16 + (if (n > 0) (payload(0) & 0x7f) else 0)
      val height = 16 + (if (n > 1) (payload(1) & 0x7f) else 0)
      val feats = new Array[Float](8)
      var i = 0
      while (i < n) {
        feats(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      (width, height, feats)
    }

    /** STUB resize: stride-sample the payload down to w×h "pixels" — the
      * real thing is a pooled libjpeg/swscale call; the plumbing (bytes in,
      * smaller bytes out, per-partition reuse) is what's exercised.
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, w * h)
      if (payload.length <= target) payload
      else {
        val out = new Array[Byte](target)
        val stride = payload.length.toDouble / target
        var i = 0
        while (i < target) { out(i) = payload((i * stride).toInt); i += 1 }
        out
      }
    }
  }

  /** Typed decode pass: binary column in, typed features out; one decoder
    * instance per partition (pooled), never per row.
    */
  def decodeMedia(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions { iter =>
      val decoder = new StubDecoder // pooled per-partition state
      iter.map { m =>
        val (w, h, f) = decoder.decode(m.payload)
        val thumb = decoder.resize(m.payload, 8, 8)
        DecodedMedia(m.doc_id, m.payload.length, w, h, thumb.length, f.toSeq)
      }
    }
  }

  /** Frame-sampling plumbing (the video analog): split the payload into
    * fixed-size "frames" and emit every `stride`-th one — the 1-row-in /
    * k-rows-out explode shape a real ffmpeg sampler has, with pooled
    * per-partition decoder state; the per-frame decode is the stub (mean
    * byte value).
    */
  def sampleFrames(
      media: Dataset[MediaRow],
      frameSize: Int = 256,
      stride: Int = 3): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        val n = m.payload.length
        val nFrames = (n + frameSize - 1) / frameSize
        (0 until nFrames by stride).iterator.map { k =>
          val from = k * frameSize
          val until = math.min(n, from + frameSize)
          var s = 0L
          var i = from
          while (i < until) { s += (m.payload(i) & 0xff); i += 1 }
          Frame(m.doc_id, k, until - from,
            if (until > from) s.toDouble / (until - from) else 0.0)
        }
      }
    }
  }

  /** Oracle-checked driver query: per-doc sampled-frame counts + sampled
    * bytes. DuckDB re-derives both from `octet_length` arithmetic (frames
    * of 256 bytes, every 3rd sampled, short last frame when it falls on a
    * sampled index) — verifying the 1-row-in/k-out explode shape end to
    * end. The per-frame decode itself (mean byte value) stays covered by
    * MultimodalSpec's hand-computed fixture: SQL can't index into blob
    * bytes portably, and the stub decode is engine-side by design.
    */
  def frameSampleStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
    sampleFrames(media)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames_sampled"),
        sum(col("frame_bytes")).as("bytes_sampled"))
      .orderBy("doc_id")
  }

  /** Mirrors [[sampleFrames]]' defaults: frameSize=256, stride=3. A doc
    * samples ceil(nf/3) of its nf=ceil(n/256) frames; the last frame is
    * short (n mod 256) and is sampled exactly when (nf-1) % 3 = 0.
    */
  def frameSampleStatsSql: String =
    """WITH b AS (SELECT doc_id, octet_length(text::BLOB) AS n,
           (octet_length(text::BLOB) + 255) // 256 AS nf
         FROM documents WHERE octet_length(text::BLOB) > 0)
       SELECT doc_id, CAST((nf + 2) // 3 AS BIGINT) AS n_frames_sampled,
         CAST(((nf + 2) // 3 - 1) * 256 +
           CASE WHEN (nf - 1) % 3 = 0 THEN n - 256 * (nf - 1) ELSE 256 END
           AS BIGINT) AS bytes_sampled
       FROM b ORDER BY doc_id"""

  /** Rows-only driver query: documents → binary payloads → stubbed decode →
    * per-batch feature stats.
    */
  def mediaDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
    decodeMedia(spark, media)
      .groupBy(col("width") % 8)
      .agg(count(lit(1)).as("n"), sum(col("byte_len")).as("bytes"))
      .orderBy(col("width") % 8)
  }
}
