package graft.ops

import org.apache.spark.sql.DataFrame

/** Drop accounting for bounded sketch modes (`maxBucket` / `maxShingleDf`):
  * "covered everything" and "dropped the hottest bucket" must be
  * distinguishable to the caller — silent caps are forbidden.
  *
  * `droppedGroups` = buckets/shingles over the bound; `droppedEntries` =
  * the (id, key) rows inside them that never became candidates.
  */
case class DropStats(droppedGroups: Long, droppedEntries: Long)

object DropStats {
  private lazy val log = org.slf4j.LoggerFactory.getLogger(classOf[DropStats])

  /** Default handler: WARN when anything was dropped, debug-quiet otherwise. */
  val logDrops: DropStats => Unit = s =>
    if (s.droppedGroups > 0)
      log.warn(s"bounded sketch mode dropped ${s.droppedGroups} over-cap groups " +
        s"(${s.droppedEntries} entries); raise the cap for exact coverage")
}

/** Scoped cache lifetime for the sketch ops (minhash/simhash/ngram/LSH):
  * each op persists its analyze pass because several plan branches consume
  * it, but a long-lived session running many ops (the driver's 41-query
  * bench JVM) must not accumulate block-manager state — so the op
  * materializes its (small) output, releases the persisted bases, and
  * returns the result as a local relation.
  *
  * Outputs above `MaterializeCapRows` (never at gate scale; conceivable at
  * web scale) fall back to returning the lazy plan with the bases still
  * persisted — the documented big-corpus mode, released by the caller via
  * `spark.catalog.clearCache()` between corpora.
  */
private[ops] object CacheScope {
  final val MaterializeCapRows: Int = 1 << 20

  // A FRESH clone per seal, deliberately not cached: a cached clone
  // freezes the parent's SQLConf at first-seal time (later session conf
  // changes — ANSI mode, timezone — would be ignored by sealed ops, and
  // a weakly-held clone would flip back nondeterministically after a
  // GC). The per-seal cost is a ~ms SessionState clone plus a transient
  // listener-bus registration (reclaimed with the clone) against seconds
  // of sealed work.
  private def sealSessionFor(
      spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession = {
    val c = org.apache.spark.sql.GraftBridge.cloneSession(spark)
    c.conf.set("spark.sql.limit.initialNumPartitions", "4096")
    c
  }


  /** Run `out`, report drop metrics, release `cached`, return the result.
    * `drops` is a 1-row (dropped_groups, dropped_entries) aggregate over
    * the op's persisted base — a count-only partial-agg job, run after the
    * main action so the persisted base is already hot. (An `observe` on
    * the capped relation would be free, but AQE's empty-relation
    * propagation prunes the executed CollectMetrics stage from the final
    * plan whenever the capped result is empty — exactly the all-dropped
    * case the metrics exist to expose — so the explicit job it is.)
    */
  def seal(
      out: DataFrame,
      cached: Seq[DataFrame],
      drops: Option[DataFrame],
      onDrops: DropStats => Unit,
      capRows: Int = MaterializeCapRows): DataFrame = {
    val spark = out.sparkSession
    // take() submits incremental limit jobs (1 partition, then ×4, ×16 …)
    // — for a sealed sketch op the output is almost never under one
    // partition's worth, so the waves only add scheduler round-trips and
    // re-runs of the final stage. The take runs on a fresh session CLONE
    // (see sealSessionFor) whose own SQLConf raises the initial limit
    // width (one job, no waves): nothing is ever mutated on the caller's
    // session, no other query can observe the setting, and concurrent
    // seals — on one session or many — proceed without any lock. The
    // clone shares the CacheManager, so the op's persisted relations are
    // still hit.
    val rows = org.apache.spark.sql.GraftBridge
      .ofRows(CacheScope.sealSessionFor(spark), out.queryExecution.logical)
      .take(capRows + 1)
    drops.foreach { d =>
      val r = d.head()
      onDrops(DropStats(r.getLong(0), r.getLong(1)))
    }
    if (rows.length <= capRows) {
      cached.foreach(_.unpersist(blocking = true))
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } else out
  }
}
