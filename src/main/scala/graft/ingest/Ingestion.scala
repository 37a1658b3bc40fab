package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion-surface parity operators (SURVEY.md §2.2 P1, §2.3 J1/J5,
  * §2.4 A3/A4). These mirror the reference's document pipeline semantics
  * as declarative DataFrame transforms.
  */
object Coerce {
  /** The reference's three-valued coercion (file_processor.py:207-233):
    * NaN → null, numeric dtypes → double, everything else → trimmed string.
    */
  def documents(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: NumericType =>
          val c = col(f.name).cast(DoubleType)
          when(isnan(c), lit(null)).otherwise(c).as(f.name)
        case _ => trim(col(f.name).cast(StringType)).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Mapping field types from the reference's type-compatibility table
    * (data_ingestion_requirements.md:104-123). Unparseable values coerce
    * to null (the reference's per-item bulk-error semantics applied
    * columnwise) — never a thrown task error.
    */
  sealed trait FieldType
  case object KeywordField extends FieldType  // trimmed string
  case object LongField extends FieldType
  case object DoubleField extends FieldType
  case object DateField extends FieldType     // ISO-8601 → timestamp
  case object BooleanField extends FieldType  // true/false/1/0, case-insensitive
  case object IpField extends FieldType       // validated dotted quad, else null
  case object GeoPointField extends FieldType // "lat,lon" or struct → struct(lat,lon)
  /** `object` mapping type: a JSON object column → StructType
    * (data_ingestion_requirements.md:104-123). Unparseable → null.
    */
  final case class ObjectField(schema: StructType) extends FieldType
  /** `nested` mapping type: a JSON array-of-objects column →
    * ArrayType(StructType). Unparseable → null.
    */
  final case class NestedField(elementSchema: StructType) extends FieldType

  private val IpRegex =
    "^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"

  /** Coerce one column to a mapping field type (pure column expressions,
    * codegen'd end to end).
    */
  def coerceTo(c: Column, t: FieldType): Column = t match {
    // try_cast throughout: malformed input must coerce to null, never
    // throw a task error (Spark 4 ANSI mode makes plain cast throw)
    case KeywordField => trim(c.cast(StringType))
    case LongField    => c.try_cast(LongType)
    case DoubleField  =>
      val d = c.try_cast(DoubleType)
      when(isnan(d), lit(null)).otherwise(d)
    case DateField    => c.try_cast(TimestampType) // ISO-8601 parse; null on fail
    case BooleanField =>
      val s = lower(trim(c.cast(StringType)))
      when(s.isin("true", "1"), lit(true))
        .when(s.isin("false", "0"), lit(false))
        .otherwise(lit(null).cast(BooleanType))
    case IpField      =>
      val s = trim(c.cast(StringType))
      when(s.rlike(IpRegex), s).otherwise(lit(null).cast(StringType))
    case ObjectField(schema) =>
      // PERMISSIVE from_json yields an all-null struct (not null) for
      // malformed objects; routing the corrupt record into a sentinel
      // field and nulling on it restores the null-on-malformed contract
      // the scalar types follow
      val corrupt = "__graft_corrupt"
      val parsed = from_json(c.cast(StringType), schema.add(corrupt, StringType),
        Map("columnNameOfCorruptRecord" -> corrupt))
      when(parsed.getField(corrupt).isNull, parsed.dropFields(corrupt))
    case NestedField(elementSchema) =>
      // array root: unparseable input yields null directly
      from_json(c.cast(StringType), ArrayType(elementSchema))
    case GeoPointField =>
      // get() (0-based) is null-safe out of bounds, unlike element_at
      val parts = split(trim(c.cast(StringType)), ",")
      val lat = trim(get(parts, lit(0))).try_cast(DoubleType)
      val lon = trim(get(parts, lit(1))).try_cast(DoubleType)
      when(size(parts) === 2 && abs(lat) <= 90.0 && abs(lon) <= 180.0,
        struct(lat.as("lat"), lon.as("lon")))
        .otherwise(lit(null).cast("struct<lat:double,lon:double>"))
  }

  /** Apply a field-type mapping; unmapped columns fall back to the
    * `documents` numeric-vs-string rule.
    */
  def withMapping(df: DataFrame, mapping: Map[String, FieldType]): DataFrame = {
    val cols = df.schema.fields.map { f =>
      mapping.get(f.name) match {
        case Some(t) => coerceTo(col(f.name), t).as(f.name)
        case None => f.dataType match {
          case _: NumericType =>
            val c = col(f.name).cast(DoubleType)
            when(isnan(c), lit(null)).otherwise(c).as(f.name)
          case _ => trim(col(f.name).cast(StringType)).as(f.name)
        }
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

object PartialUpdate {
  /** Partial update by id (reference data_ingestion_requirements.md:86-101:
    * a document carrying only `{id, age}` updates just the `age` field).
    * Per shared column the update's non-null value wins; null means "not
    * provided, keep existing" (the reference's JSON partial-update body
    * simply omits untouched fields). Ids absent from `current` are ignored
    * — the reference's bulk `update` action errors those items into the
    * DLQ rather than inserting. One hash shuffle on the key (broadcast if
    * the update batch is small — Spark picks by size).
    */
  def apply(current: DataFrame, updates: DataFrame, keyCol: String,
      orderCols: Seq[String] = Seq.empty): DataFrame = {
    val updCols = updates.columns.toSet
    require(updCols.contains(keyCol), s"updates must carry the key column $keyCol")
    // The reference applies bulk update actions per document — last wins
    // (file_processor.py:248-257). A DataFrame carries no row order, so the
    // batch is deduplicated by key first: by `orderCols` desc when the
    // caller has a real ordering, else by the remaining columns as a
    // deterministic tiebreak (duplicate keys would otherwise duplicate the
    // document in the output via the join).
    val tiebreak = if (orderCols.nonEmpty) orderCols
      else updates.columns.filterNot(_ == keyCol).toSeq
    val dedupedUpdates =
      if (tiebreak.isEmpty) updates.distinct()
      else Upsert.lastWriteWins(updates, keyCol, tiebreak)
    val joined = current.alias("c")
      .join(dedupedUpdates.alias("u"), col(s"c.$keyCol") === col(s"u.$keyCol"), "left")
    val cols = current.columns.map { c =>
      if (c == keyCol) col(s"c.$keyCol").as(keyCol)
      else if (updCols.contains(c)) coalesce(col(s"u.$c"), col(s"c.$c")).as(c)
      else col(s"c.$c").as(c)
    }
    joined.select(cols.toIndexedSeq: _*)
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

  /** Existence-guarded alias switch (reference switch_alias.py:271-296):
    * the alias must exist, both indices must exist, and the alias must
    * currently point at the expected source — checked BEFORE the count
    * guards, mirroring the reference's validation order. Forgetting any of
    * these re-creates the reference's guarded failure modes unguarded.
    */
  def validateSwitchCatalog(
      catalog: graft.index.AliasCatalog,
      alias: String,
      src: graft.index.IndexStore,
      tgt: graft.index.IndexStore,
      srcCount: Long,
      tgtCount: Long,
      thresholdPct: Double = DefaultDriftThresholdPct): SwitchDecision =
    catalog.resolve(alias) match {
      case None => Abort(s"alias '$alias' does not exist")
      case Some(cur) =>
        if (!src.exists) Abort(s"source index ${src.root} does not exist")
        else if (!tgt.exists) Abort(s"target index ${tgt.root} does not exist")
        else if (cur != src.root)
          Abort(s"alias '$alias' points at $cur, not the expected source ${src.root}")
        else validateSwitch(src.root, tgt.root, srcCount, tgtCount, thresholdPct)
    }

  /** The same guard chain over parquet/Iceberg TABLE paths (the ingestion
    * lifecycle's "index" unit) — existence = the table directory exists.
    * Same validation order as the reference (switch_alias.py:271-296):
    * alias → source → target → pointer → counts.
    */
  def validateSwitchTables(
      catalog: graft.index.AliasCatalog,
      alias: String,
      srcPath: String,
      tgtPath: String,
      srcCount: Long,
      tgtCount: Long,
      thresholdPct: Double = DefaultDriftThresholdPct): SwitchDecision =
    catalog.resolve(alias) match {
      case None => Abort(s"alias '$alias' does not exist")
      case Some(cur) =>
        // Hadoop FS probes, not java.io.File — the data itself is read
        // through Spark's FS layer, so the guard must see the same
        // namespace (a local-FS check is always false on hdfs:///s3a://,
        // turning every switch into an abort)
        if (!Fs.exists(srcPath)) Abort(s"source table $srcPath does not exist")
        else if (!Fs.exists(tgtPath)) Abort(s"target table $tgtPath does not exist")
        else if (cur != srcPath)
          Abort(s"alias '$alias' points at $cur, not the expected source $srcPath")
        else validateSwitch(srcPath, tgtPath, srcCount, tgtCount, thresholdPct)
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

  /** Settings that can't be carried into a recreated index
    * (index_cleanup.py:172-176): engine-assigned identity/lineage values.
    */
  final val ImmutableSettings: Set[String] =
    Set("creation_date", "uuid", "version", "provided_name")

  /** Settings round-trip for drop-and-recreate: preserve user settings,
    * strip the engine-assigned immutable ones (index_cleanup.py:172-186).
    * The table-properties analogue for a parquet/Iceberg-backed index.
    */
  def recreateSettings(settings: Map[String, String]): Map[String, String] =
    settings.filterNot { case (k, _) => ImmutableSettings.contains(k) }
}

/** Dead-letter queue sink (reference file_processor.py:263-413): failed
  * rows quarantined with error metadata, payloads chunked at 230 KB with
  * part/total numbering.
  */
object Dlq {
  final val MaxPayloadBytes = 235520 // 230 KB, file_processor.py:308

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

  /** Quarantine failed records distributed, applying the 230 KB part
    * contract per record (file_processor.py:304-366): each row of `failed`
    * (sourceFile, docJson, errorType, errorReason) becomes one or more
    * (part, totalParts)-numbered DLQ rows with the document content
    * retrievable. Scan-shaped — no shuffle.
    */
  def writeRecords(failed: DataFrame, path: String, maxBytes: Int = MaxPayloadBytes): Unit = {
    val spark = failed.sparkSession
    import spark.implicits._
    val rows = failed.select("sourceFile", "docJson", "errorType", "errorReason")
      .as[(String, String, String, String)]
      .flatMap { case (src, doc, et, er) =>
        chunk(Option(doc).getOrElse(""), maxBytes).map { case (p, t, payload) =>
          (src, payload, p, t, et, er)
        }
      }
      .toDF("sourceFile", "docJson", "part", "totalParts", "errorType", "errorReason")
    // staged: a retried attempt must not duplicate quarantined records
    // (there is no id column here for LWW to repair)
    StagedAppend(rows, path, "dlq")
  }
}

/** Reindex = full scan → sink copy (reference reindex.py:47-124): validate
  * the source exists and is non-empty, clean the target, copy.
  */
object Reindex {
  def copy(spark: SparkSession, srcPath: String, tgtPath: String): Long = {
    // overwrite-into-self truncates the source mid-read — never legal
    require(srcPath != tgtPath, s"reindex source and target are the same table: $srcPath")
    val src = spark.read.parquet(srcPath)
    val n = src.count()
    require(n > 0, s"source $srcPath is empty") // reindex.py:100-107 semantics
    src.write.mode("overwrite").parquet(tgtPath)
    n
  }
}
