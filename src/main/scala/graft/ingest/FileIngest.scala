package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-ingestion façade mirroring the reference's `ingest_data` flow
  * (reference bulkupdate.py:482-531 + file_processor.py:584-633):
  * source discovery → parse (CSV with header / JSON single-or-array) →
  * coercion → id-based upsert → quarantine of malformed rows (DLQ) →
  * ledger skip under resume → count verification → per-file summary.
  *
  * Scale shape: file listing is metadata-only; parsing is the parallel
  * scan; the only shuffle is the upsert dedupe (and only when an `id`
  * column exists). Malformed rows ride Spark's PERMISSIVE corrupt-record
  * channel instead of failing the batch — the reference's per-item bulk
  * error semantics (file_processor.py:441-457).
  */
object FileIngest {

  case class FileReport(file: String, totalRows: Long, failedRows: Long, status: String)
  case class IngestSummary(
      files: Seq[FileReport],
      totalRows: Long,
      processedRows: Long,
      failedRows: Long,
      verified: Boolean)

  private val Corrupt = "_corrupt_record"

  /** Explicit file-order row index: contiguous zipWithIndex over the
    * parsed rows ((partition, offset) order — splits are byte-offset
    * ordered, so this is the file's physical row order). Used as the
    * upsert tiebreak instead of `monotonically_increasing_id`, whose
    * sparse per-partition values encode the same order less auditably.
    */
  private def withRowOrder(df: DataFrame, colName: String): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(colName, org.apache.spark.sql.types.LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Parse one file (csv/json by extension, case-insensitive — the
    * reference's extension predicate, file_processor.py:85-86) into
    * (goodRows, failedCount).
    */
  def parseFile(spark: SparkSession, path: String): (DataFrame, Long) = {
    val lower = path.toLowerCase(java.util.Locale.ROOT)
    val raw =
      if (lower.endsWith(".csv"))
        spark.read.option("header", "true").option("inferSchema", "true")
          .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", Corrupt)
          .csv(path)
      else if (lower.endsWith(".json"))
        spark.read.option("multiLine", "true") // object or array-of-objects
          .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", Corrupt)
          .json(path)
      else throw new IllegalArgumentException(s"unsupported file type: $path")
    if (raw.columns.contains(Corrupt)) {
      val cached = raw.cache()
      val bad = cached.filter(col(Corrupt).isNotNull).count()
      (cached.filter(col(Corrupt).isNull).drop(Corrupt), bad)
    } else (raw, 0L)
  }

  /** Full ingestion of a set of files into a parquet "index" table.
    * `resume`: files present in the ledger table are skipped; processed
    * files are appended to the ledger (reference bulkupdate.py:258-314).
    * Malformed rows are quarantined to `dlqPath` with error metadata.
    */
  def ingest(
      spark: SparkSession,
      files: Seq[String],
      targetPath: String,
      ledgerPath: String,
      dlqPath: String,
      resume: Boolean = false): IngestSummary = {
    import spark.implicits._

    val done: Set[String] =
      if (resume && new java.io.File(ledgerPath).exists())
        spark.read.parquet(ledgerPath).select("file").as[String].collect().toSet
      else Set.empty

    val reports = scala.collection.mutable.ArrayBuffer.empty[FileReport]
    var processed = 0L
    var failed = 0L

    files.foreach { f =>
      if (done.contains(f)) {
        reports += FileReport(f, 0L, 0L, "skipped")
      } else {
        try {
          val (good, bad) = parseFile(spark, f)
          val coerced = Coerce.documents(good)
          val deduped =
            if (coerced.columns.contains("id"))
              Upsert.lastWriteWins(
                withRowOrder(coerced, "__ord"),
                "id", Seq("__ord")).drop("__ord")
            else coerced
          val n = deduped.count()
          deduped.write.mode("append").parquet(targetPath)
          if (bad > 0) {
            Seq((f, bad, "parse_error", "malformed row quarantined"))
              .toDF("sourceFile", "failedRows", "errorType", "errorReason")
              .write.mode("append").parquet(dlqPath)
          }
          Seq(f).toDF("file").write.mode("append").parquet(ledgerPath)
          processed += n
          failed += bad
          reports += FileReport(f, n + bad, bad,
            if (bad == 0) "success" else "partial")
        } catch {
          case e: Exception =>
            reports += FileReport(f, 0L, 0L, s"failed: ${e.getMessage}")
        }
      }
    }

    // count verification (reference bulkupdate.py:92-135): target table
    // must contain at least the rows processed in this run
    val actual = spark.read.parquet(targetPath).count()
    IngestSummary(reports.toSeq, processed + failed, processed, failed,
      verified = actual >= processed)
  }
}
