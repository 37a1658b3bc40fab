package graft.ingest

import org.apache.spark.sql.SparkSession

import graft.index.AliasCatalog

/** One-call zero-downtime refresh — the reference's full orchestration
  * (run_ingestion.bat:32-141, README.md:531-558) as a single library entry
  * point: serve reads from the secondary index while the primary rebuilds,
  * then swing back.
  *
  *   1. reindex primary → secondary            (reindex.py flow)
  *   2. guarded alias switch live → secondary  (switch_alias.py flow)
  *   3. ingest the batch into primary          (bulkupdate.py flow)
  *   4. guarded alias switch live → primary
  *
  * Every switch runs the FULL guard chain (alias exists → both tables
  * exist → alias points at the expected source → count-drift bound) via
  * `Guardrails.validateSwitchTables` — callers cannot skip a guard, which
  * is the point of the facade: round-3 shipped all four steps as parts
  * and every user re-wrote the choreography by hand.
  *
  * Failure semantics mirror the reference script: an aborted guard or a
  * failed ingest throws `RefreshAbortedException` and LEAVES THE ALIAS ON
  * ITS LAST GOOD TARGET (aborting before step 2 keeps it on primary;
  * aborting in step 3/4 keeps it on secondary, which still serves the
  * pre-refresh snapshot — zero downtime either way).
  */
object ZeroDowntime {

  final class RefreshAbortedException(val step: String, val reason: String)
      extends RuntimeException(s"zero-downtime refresh aborted at $step: $reason")

  case class RefreshReport(
      copiedRows: Long,
      servedFromSecondary: Boolean,
      ingest: FileIngest.IngestSummary,
      servedFromPrimary: Boolean)

  private def guardedSwitch(
      catalog: AliasCatalog, alias: String,
      srcPath: String, tgtPath: String,
      srcCount: Long, tgtCount: Long,
      thresholdPct: Double, step: String): Unit =
    Guardrails.validateSwitchTables(catalog, alias, srcPath, tgtPath,
      srcCount, tgtCount, thresholdPct) match {
      case Guardrails.Proceed => catalog.set(alias, tgtPath)
      case Guardrails.Abort(reason) => throw new RefreshAbortedException(step, reason)
    }

  def refresh(
      spark: SparkSession,
      catalog: AliasCatalog,
      alias: String,
      primaryPath: String,
      secondaryPath: String,
      files: Seq[String],
      ledgerPath: String,
      dlqPath: String,
      resume: Boolean = false,
      thresholdPct: Double = Guardrails.DefaultDriftThresholdPct): RefreshReport = {

    // step 0 preconditions (run_ingestion.bat checks before any work):
    // same-index FIRST — an overwrite reindex onto its own source would
    // destroy the primary before the switch guard ever ran
    if (primaryPath == secondaryPath)
      throw new RefreshAbortedException("precheck", "source and target are the same index")
    // the alias must exist and point at the primary
    catalog.resolve(alias) match {
      case None => throw new RefreshAbortedException("precheck", s"alias '$alias' does not exist")
      case Some(cur) if cur != primaryPath =>
        throw new RefreshAbortedException("precheck",
          s"alias '$alias' points at $cur, not the expected primary $primaryPath")
      case _ =>
    }

    // step 1: snapshot primary into secondary (overwrite)
    val copied = Reindex.copy(spark, primaryPath, secondaryPath)

    // step 2: guarded switch — reads now serve the snapshot
    val srcCount = spark.read.parquet(primaryPath).count()
    val tgtCount = spark.read.parquet(secondaryPath).count()
    guardedSwitch(catalog, alias, primaryPath, secondaryPath,
      srcCount, tgtCount, thresholdPct, "switch-to-secondary")

    // step 3: refresh primary while secondary serves
    val summary = FileIngest.ingestBatched(spark, files, primaryPath, ledgerPath, dlqPath, resume)
    if (!summary.verified)
      throw new RefreshAbortedException("ingest",
        s"count verification failed (processed=${summary.processedRows}); alias stays on secondary")
    if (summary.files.exists(_.status.startsWith("failed")))
      throw new RefreshAbortedException("ingest",
        s"file failures: ${summary.files.filter(_.status.startsWith("failed")).map(_.file).mkString(", ")}; " +
          "alias stays on secondary")

    // step 4: guarded switch back to the refreshed primary
    val backSrc = spark.read.parquet(secondaryPath).count()
    val backTgt = spark.read.parquet(primaryPath).count()
    guardedSwitch(catalog, alias, secondaryPath, primaryPath,
      backSrc, backTgt, thresholdPct, "switch-to-primary")

    RefreshReport(copied, servedFromSecondary = true, summary, servedFromPrimary = true)
  }
}
