package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata. The Spark-side contract — schema,
  * partition-sized batching, per-partition decoder reuse — is real and
  * tested; the codec itself is STUBBED deterministically because no media
  * libraries ship in this container. Swap `StubCodec` for a real decoder
  * (e.g. a JNI/FFI batch decoder or `mapInPandas` with PIL/torchaudio on
  * a Python-enabled cluster) without touching the pipeline.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      content_hash: Long,
      width: Int,        // STUB: derived deterministically from payload
      height: Int,       // STUB
      duration_ms: Int,  // STUB (audio/video)
      feature: Array[Float]) // STUB embedding, deterministic in payload

  /** STUB decoder ===================================================
    * Deterministic fake: all "decoded" fields are pure functions of the
    * payload bytes, so tests are reproducible and the pipeline shape
    * (batching, schema, null handling) is exercised for real.
    * A production codec replaces exactly this object.
    * ================================================================ */
  object StubCodec {
    def decode(row: MediaRow): MediaFeatures = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < row.payload.length) { h = (h ^ row.payload(i)) * 1099511628211L; i += 1 }
      val w = 64 + math.floorMod(h, 1024L).toInt
      val ht = 64 + math.floorMod(h >>> 16, 1024L).toInt
      val dur = if (row.kind == "image") 0 else 1000 + math.floorMod(h >>> 24, 60000L).toInt
      val feat = Array.tabulate(8) { d =>
        ((Hash64.splitmix64(h + d) >>> 11) * 1.1102230246251565e-16).toFloat
      }
      MediaFeatures(row.media_id, row.kind, row.payload.length, h, w, ht, dur, feat)
    }
  }

  /** Decode/feature-extract over the binary column. mapPartitions so a
    * real codec can amortize per-partition init (model load, decoder
    * context) across the batch — the same shape `mapInPandas` gives a
    * Python decoder.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init goes here in a real codec
      rows.map(StubCodec.decode)
    }
  }

  /** Deterministic frame-sampling offsets: n evenly spaced byte offsets —
    * the plumbing for video frame extraction (real decoder would seek).
    */
  def frameOffsets(payloadLength: Int, n: Int): Array[Int] =
    if (payloadLength <= 0 || n <= 0) Array.empty
    else Array.tabulate(n)(i => (payloadLength.toLong * i / n).toInt)

  /** Wrap a text corpus as a binary media table (fixture helper: the
    * sandbox has no real media files; payload = utf-8 bytes).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("kind"),
      col(textCol).cast("binary").as("payload")).as[MediaRow]
  }
}
