package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion-surface parity operators (SURVEY.md §2.2 P1, §2.3 J1/J5,
  * §2.4 A3/A4). These mirror the reference's document pipeline semantics
  * as declarative DataFrame transforms.
  */
object Coerce {
  /** The reference's three-valued coercion (file_processor.py:207-233):
    * NaN → null, numeric dtypes → double, everything else → trimmed string.
    * Columns listed in `numeric` are cast to double with NaN nulled; all
    * other columns become trimmed strings (null-preserving).
    */
  def documents(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: NumericType =>
          val c = col(f.name).cast(DoubleType)
          when(isnan(c), lit(null)).otherwise(c).as(f.name)
        case DoubleType | FloatType =>
          val c = col(f.name).cast(DoubleType)
          when(isnan(c), lit(null)).otherwise(c).as(f.name)
        case _ => trim(col(f.name).cast(StringType)).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}

object Upsert {
  /** Last-write-wins upsert by id (reference `_bulk` index action with
    * `_id`, file_processor.py:248-257): the latest row per key survives,
    * with a deterministic tiebreak column. Implemented as the standard
    * window-dedupe; at scale this is one hash shuffle on the key and AQE
    * handles skewed keys.
    */
  def lastWriteWins(df: DataFrame, keyCol: String, orderCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

object Ledger {
  /** Resume anti-join (reference bulkupdate.py:258-260): drop work units
    * already recorded in the ledger. Broadcast the ledger when small.
    */
  def pendingOnly(work: DataFrame, ledger: DataFrame, key: String): DataFrame =
    work.join(broadcast(ledger.select(col(key)).distinct()), Seq(key), "left_anti")
}

/** Count reconciliation + alias-switch guardrails
  * (reference switch_alias.py:179-302, bulkupdate.py:92-135).
  */
object Guardrails {
  final val DefaultDriftThresholdPct = 10.0 // switch_alias.py:195

  sealed trait SwitchDecision
  case object Proceed extends SwitchDecision
  final case class Abort(reason: String) extends SwitchDecision

  /** Percentage count drift |tgt-src|/src*100 (switch_alias.py:189-203). */
  def countDriftPct(src: Long, tgt: Long): Double =
    if (src == 0L) { if (tgt == 0L) 0.0 else 100.0 }
    else math.abs((tgt - src).toDouble / src) * 100.0

  /** All abort conditions of the reference's alias switch:
    * same-index (switch_alias.py:264-270), empty target with non-empty
    * source (:197-203), drift above threshold (:195-230).
    */
  def validateSwitch(srcName: String, tgtName: String, srcCount: Long, tgtCount: Long,
      thresholdPct: Double = DefaultDriftThresholdPct): SwitchDecision = {
    if (srcName == tgtName) Abort("source and target are the same index")
    else if (tgtCount == 0L && srcCount > 0L) Abort("target index is empty")
    else {
      val drift = countDriftPct(srcCount, tgtCount)
      if (drift > thresholdPct) Abort(f"document count drift $drift%.2f%% exceeds $thresholdPct%.1f%%")
      else Proceed
    }
  }
}

object Cleanup {
  final val IndexRecreateThreshold = 1000000L // index_cleanup.py:99

  sealed trait CleanupPlan
  case object DeleteAllDocuments extends CleanupPlan // ≤ threshold: cheap truncate
  case object DropAndRecreate extends CleanupPlan    // > threshold: cheaper at scale

  /** The reference's one cost-based rule (index_cleanup.py:95-112). */
  def plan(docCount: Long, threshold: Long = IndexRecreateThreshold): CleanupPlan =
    if (docCount <= threshold) DeleteAllDocuments else DropAndRecreate
}

/** Dead-letter queue sink (reference file_processor.py:263-413): failed
  * rows quarantined with error metadata, payloads chunked at 230 KB with
  * part/total numbering.
  */
object Dlq {
  final val MaxPayloadBytes = 235520 // 230 KB, file_processor.py:308

  case class FailedRecord(sourceFile: String, docJson: String, errorType: String, errorReason: String)

  /** Split a payload into ≤230 KB parts, mirroring the reference's
    * part-numbering contract (file_processor.py:304-366).
    */
  def chunk(payload: String, maxBytes: Int = MaxPayloadBytes): Seq[(Int, Int, String)] = {
    val bytes = payload.getBytes("UTF-8")
    if (bytes.length <= maxBytes) Seq((1, 1, payload))
    else {
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      var start = 0
      while (start < bytes.length) {
        var end = math.min(start + maxBytes, bytes.length)
        // don't split inside a UTF-8 sequence
        while (end < bytes.length && (bytes(end) & 0xc0) == 0x80) end -= 1
        parts += new String(bytes, start, end - start, "UTF-8")
        start = end
      }
      val total = parts.length
      parts.toSeq.zipWithIndex.map { case (p, i) => (i + 1, total, p) }
    }
  }

  /** Quarantine failed rows as a parquet side-channel. */
  def write(spark: SparkSession, failed: Seq[FailedRecord], path: String): Unit = {
    import spark.implicits._
    failed.toDF().write.mode("append").parquet(path)
  }
}

/** Reindex = full scan → sink copy (reference reindex.py:47-124): validate
  * the source exists and is non-empty, clean the target, copy.
  */
object Reindex {
  def copy(spark: SparkSession, srcPath: String, tgtPath: String): Long = {
    val src = spark.read.parquet(srcPath)
    val n = src.count()
    require(n > 0, s"source $srcPath is empty") // reindex.py:100-107 semantics
    src.write.mode("overwrite").parquet(tgtPath)
    n
  }
}
