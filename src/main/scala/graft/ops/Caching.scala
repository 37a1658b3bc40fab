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

  // per-session seal-session cache with WEAK key AND value: the clone
  // strongly references its parent (SessionState closure), so a strong
  // value would make the weak key unreclaimable; a weak value lets GC
  // take the clone (its ExecutionListenerBus unregisters via the
  // ContextCleaner) and a later seal simply re-clones. Races just build
  // one extra short-lived clone.
  private val sealSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
        java.lang.ref.WeakReference[org.apache.spark.sql.SparkSession]]())

  private def sealSessionFor(
      spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession = {
    val ref = sealSessions.get(spark)
    val cached = if (ref != null) ref.get else null
    if (cached != null) cached
    else {
      val c = org.apache.spark.sql.GraftBridge.cloneSession(spark)
      c.conf.set("spark.sql.limit.initialNumPartitions", "4096")
      sealSessions.put(spark, new java.lang.ref.WeakReference(c))
      c
    }
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
    // re-runs of the final stage. The take runs on a per-session CLONE
    // (weakly cached above) whose own SQLConf raises the initial limit
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
