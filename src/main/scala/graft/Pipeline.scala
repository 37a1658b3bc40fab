package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexStore}
import graft.ops.TextStats

/** End-to-end training-corpus pipeline: the one-call composition a user of
  * the reference runs today as separate scripts (ingest → clean → index →
  * serve), re-expressed as a single declarative DataFrame flow.
  *
  * Stages (each optional via config, all scan-shaped except the two
  * documented shuffles):
  *   1. coercion           — `Coerce.documents` column normalization
  *   2. exact dedup        — first-seen-wins by content hash (1 shuffle)
  *   3. quality gate       — `TextStats.qualityScore` ≥ minQuality filter
  *   4. language filter    — keep docs whose `langId` is in `keepLangs`
  *   5. index build        — sliced, resumable `IndexBuilder` (1 bounded
  *                           (term, seg) shuffle; metrics in the manifest)
  *
  * The cleaning stages run in ONE pass over the corpus: they are pure
  * column expressions fused by Catalyst into the scan, so the only
  * materializations are the dedup shuffle and the index build itself.
  */
object Pipeline {

  case class Config(
      dedup: Boolean = true,
      minQuality: Double = 0.0,
      keepLangs: Seq[String] = Seq.empty, // empty = keep all
      index: IndexBuilder.Config = IndexBuilder.Config())

  case class Report(
      inputDocs: Long,
      keptDocs: Long,
      droppedDuplicates: Long,
      droppedQuality: Long,
      droppedLang: Long)

  /** Clean `docs` (must carry `doc_id` and `text`) per `cfg`; returns the
    * cleaned frame. Pure transformation — callers decide materialization.
    */
  def clean(docs: DataFrame, cfg: Config): DataFrame = {
    val qualified =
      if (cfg.minQuality > 0.0)
        docs.filter(TextStats.qualityScore(col("text")) >= cfg.minQuality)
      else docs
    val languaged =
      if (cfg.keepLangs.nonEmpty)
        qualified.filter(TextStats.langId(col("text")).isin(cfg.keepLangs: _*))
      else qualified
    if (!cfg.dedup) languaged
    else {
      // first-seen-wins exact dedup: one shuffle on the content hash; the
      // min-id representative keeps the outcome deterministic
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)
      languaged.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }
  }

  /** Full run: clean → build the index into `store` → report per-stage
    * drop counts (each count rides the same cleaning pass shapes; the
    * stage counts cost three extra scan-cheap aggregates, no new wide op).
    */
  def ingestAndIndex(
      spark: SparkSession,
      docs: DataFrame,
      store: IndexStore,
      cfg: Config = Config()): Report = {
    val input = docs.count()

    val afterQuality =
      if (cfg.minQuality > 0.0)
        docs.filter(TextStats.qualityScore(col("text")) >= cfg.minQuality).count()
      else input
    val afterLang =
      if (cfg.keepLangs.nonEmpty)
        clean(docs, cfg.copy(dedup = false)).count()
      else afterQuality

    val cleaned = clean(docs, cfg)
    IndexBuilder.build(spark, cleaned, store, cfg.index)
    val kept = store.committedSlices.map(_.docs).sum

    Report(
      inputDocs = input,
      keptDocs = kept,
      droppedDuplicates = afterLang - kept,
      droppedQuality = input - afterQuality,
      droppedLang = afterQuality - afterLang)
  }
}
