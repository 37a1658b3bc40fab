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

  /** Real container-header parsing — pure byte inspection, no codec libs.
    * Covers the metadata-extraction half of the decode step genuinely:
    * PNG (IHDR), JPEG (SOFn scan), GIF (logical screen descriptor), and
    * WAV (fmt chunk → duration). Unknown containers fall through to the
    * deterministic stub below.
    */
  object MediaHeaders {
    @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    @inline private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    @inline private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    @inline private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    @inline private def le32(b: Array[Byte], i: Int): Long =
      u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

    /** (kind, width, height, durationMs) when a known container is found. */
    def sniff(p: Array[Byte]): Option[(String, Int, Int, Int)] = {
      if (p.length >= 24 &&
        u8(p, 0) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') {
        // PNG: 8B signature, IHDR chunk: len(4) "IHDR"(4) width(4) height(4)
        Some(("image/png", be32(p, 16).toInt, be32(p, 20).toInt, 0))
      } else if (p.length >= 4 && u8(p, 0) == 0xff && u8(p, 1) == 0xd8) {
        // JPEG: scan markers for SOF0/1/2 (baseline/extended/progressive)
        var i = 2
        while (i + 9 < p.length) {
          if (u8(p, i) != 0xff) return None // marker desync
          val marker = u8(p, i + 1)
          if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
            return Some(("image/jpeg", be16(p, i + 7), be16(p, i + 5), 0))
          }
          if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
          else i += 2 + be16(p, i + 2)
        }
        None
      } else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F') {
        Some(("image/gif", le16(p, 6), le16(p, 8), 0))
      } else if (p.length >= 44 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') {
        // WAV: byteRate at offset 28 in the canonical fmt chunk; data size
        // approximated by RIFF size − header
        val byteRate = le32(p, 28)
        val dataBytes = math.max(0L, le32(p, 4) - 36)
        val durMs = if (byteRate > 0) (dataBytes * 1000 / byteRate).toInt else 0
        Some(("audio/wav", 0, 0, durMs))
      } else None
    }
  }

  /** STUB fallback for payloads without a recognized container, and for
    * the feature-embedding step (no ML model ships in this container):
    * deterministic functions of the payload bytes so tests reproduce.
    * A production embedder replaces exactly this object.
    */
  object StubCodec {
    def contentHash(payload: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < payload.length) { h = (h ^ payload(i)) * 1099511628211L; i += 1 }
      h
    }

    def decode(row: MediaRow): MediaFeatures = {
      val h = contentHash(row.payload)
      val feat = Array.tabulate(8) { d => // STUB embedding
        ((Hash64.splitmix64(h + d) >>> 11) * 1.1102230246251565e-16).toFloat
      }
      MediaHeaders.sniff(row.payload) match {
        case Some((kind, w, ht, dur)) =>
          MediaFeatures(row.media_id, kind, row.payload.length, h, w, ht, dur, feat)
        case None => // unrecognized container: deterministic fake metadata
          val w = 64 + math.floorMod(h, 1024L).toInt
          val ht = 64 + math.floorMod(h >>> 16, 1024L).toInt
          val dur = if (row.kind == "image") 0 else 1000 + math.floorMod(h >>> 24, 60000L).toInt
          MediaFeatures(row.media_id, row.kind, row.payload.length, h, w, ht, dur, feat)
      }
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
