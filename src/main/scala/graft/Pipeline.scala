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
    * drop counts. Stage attribution rides the cleaning pass itself as an
    * `Observation` (stage-flag sums folded into the scan — no extra
    * corpus passes), and `keptDocs` counts only the slices THIS build
    * committed, so a resumed or reused store never inflates the report.
    */
  def ingestAndIndex(
      spark: SparkSession,
      docs: DataFrame,
      store: IndexStore,
      cfg: Config = Config()): Report = {
    import org.apache.spark.sql.Observation

    // stage flags as columns: one scan computes input/quality/lang counts
    val qualOk =
      if (cfg.minQuality > 0.0) TextStats.qualityScore(col("text")) >= cfg.minQuality
      else lit(true)
    val langOk =
      if (cfg.keepLangs.nonEmpty) TextStats.langId(col("text")).isin(cfg.keepLangs: _*)
      else lit(true)

    val obs = Observation()
    val flagged = docs
      .withColumn("__q", qualOk)
      .withColumn("__l", langOk)
      .observe(obs,
        count(lit(1)).as("input"),
        coalesce(sum(when(col("__q"), 1L)), lit(0L)).as("after_quality"),
        coalesce(sum(when(col("__q") && col("__l"), 1L)), lit(0L)).as("after_lang"))
      .filter(col("__q") && col("__l"))
      .drop("__q", "__l")

    // kept = rows that survive cleaning, observed on the SAME pass —
    // independent of whatever slices the store already held (a resumed or
    // reused root must never inflate the report)
    val keptObs = Observation()
    val deduped =
      if (!cfg.dedup) flagged
      else {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)
        flagged.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn")
      }
    val cleaned = deduped.observe(keptObs, count(lit(1)).as("kept"))

    IndexBuilder.build(spark, cleaned, store, cfg.index)

    // the build's jobs completed the observed scan — metrics are ready
    val m = obs.get
    val input = m("input").asInstanceOf[Long]
    val afterQuality = m("after_quality").asInstanceOf[Long]
    val afterLang = m("after_lang").asInstanceOf[Long]
    val kept = keptObs.get("kept").asInstanceOf[Long]

    Report(
      inputDocs = input,
      keptDocs = kept,
      droppedDuplicates = afterLang - kept,
      droppedQuality = input - afterQuality,
      droppedLang = afterQuality - afterLang)
  }
}
