package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index._

/** Serving snapshot export, partitioned by shard — the on-disk layout a
  * document-sharded serving cluster deploys from. `IndexStore`'s slice
  * layout is the BUILD layout (docID-range slices, resumable commits);
  * a serving node wants the opposite projection: everything ITS shard
  * serves (`seg mod nShards`) under one prefix, so the node reads exactly
  * its own directory at open — no scan-and-filter over the whole index,
  * no router-side collect. This is how the reference's OpenSearch lays
  * out shard directories, re-expressed as a partitioned parquet write.
  *
  * Layout:
  * {{{
  *   <out>/postings/shard=<s>/   (this shard's posting blocks)
  *   <out>/norms/shard=<s>/      (this shard's segment norms)
  *   <out>/terms/                (GLOBAL df — BM25 idf needs corpus-wide stats)
  *   <out>/stats.json            (global N/avgdl + shard count)
  * }}}
  */
object ServingLayout {

  /** One partitioned write per table — the shard dimension is a column,
    * so the export is a single shuffle-free pass over the postings (the
    * partitioned write splits files by the shard value within each task).
    */
  def exportShards(spark: SparkSession, store: IndexStore, outDir: String, nShards: Int): Unit = {
    require(nShards >= 1, "need at least one shard")
    // ONE manifest snapshot drives every read — a live append committing
    // mid-export must not mix old postings with new stats.json counts
    // (openExportedShard would then score with mismatched corpus stats)
    val slices = store.committedSlices
    require(slices.nonEmpty, s"nothing committed at ${store.root}")
    def readSub(table: String) =
      spark.read.parquet(slices.map(s => store.slicePath(table, s.sliceId)): _*)
    val shardCol = pmod(col("seg"), lit(nShards)).as("shard")
    readSub("postings").withColumn("shard", shardCol)
      .write.partitionBy("shard").mode("overwrite").parquet(s"$outDir/postings")
    readSub("norms").withColumn("shard", shardCol)
      .write.partitionBy("shard").mode("overwrite").parquet(s"$outDir/norms")
    // global term stats: merged df/cf (small — one row per distinct term)
    val terms = readSub("terms").groupBy("term")
      .agg(sum("df").as("df"), sum("cf").as("cf"))
    terms.write.mode("overwrite").parquet(s"$outDir/terms")
    // fetch-phase doc store, sharded WITH the postings that score it:
    // a document's _source lives on the shard that owns its segment
    val segSize = store.settings.getOrElse("build.segSize",
      throw new IllegalStateException(s"no build.segSize recorded at ${store.root}")).toLong
    val docs = readSub("docs")
    docs
      .select(col("doc_id"), col("url"), col("doclen").cast("int").as("doclen"), col("lang"))
      .withColumn("shard", pmod(expr(s"doc_id DIV ${segSize}L").cast("int"), lit(nShards)))
      .write.partitionBy("shard").mode("overwrite").parquet(s"$outDir/docs")
    val st = IndexStats.fromDocs(docs, spark.read.parquet(s"$outDir/terms").count())
    // through the Hadoop FS layer, like the parquet it sits beside — the
    // export must work wherever the data tables live
    graft.ingest.Fs.writeString(s"$outDir/stats.json",
      s"""{"nDocs":${st.nDocs},"avgdl":${st.avgdl},"nTerms":${st.nTerms},""" +
        s""""totalTokens":${st.totalTokens},"nShards":$nShards,"segSize":$segSize}""")
  }

  def nShards(outDir: String): Int =
    """"nShards"\s*:\s*(\d+)""".r
      .findFirstMatchIn(graft.ingest.Fs.readString(s"$outDir/stats.json"))
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"no nShards in $outDir/stats.json"))

  /** Open one shard from the export: the node reads ONLY its own
    * directory (`shard=<id>` — directory-level pruning, not a filter over
    * the full index) plus the small global stats. Bit-identical to
    * `Serving.openSharded`'s in-process shards: same seg assignment, same
    * global stats, same kernel.
    */
  // a shard that owns zero segments (fewer segments than shards) has no
  // directory — it opens empty and the router merge is unaffected. The
  // schema comes from the encoder, NOT parquet footer inference: a schema
  // discovery pass over the shard files is a whole extra Spark job per
  // table per open, and the export's schemas are fixed by construction.
  private def readOr[T <: Product : scala.reflect.runtime.universe.TypeTag : scala.reflect.ClassTag](
      spark: SparkSession, path: String): Array[T] = {
    val enc = org.apache.spark.sql.Encoders.product[T]
    if (!graft.ingest.Fs.exists(path)) Array.empty[T]
    else spark.read.schema(enc.schema).parquet(path).as[T](enc).collect()
  }

  /** The small GLOBAL sides of an export (merged term df + corpus stats)
    * — loaded once per node (or once per in-process cluster) and shared
    * read-only across shard opens, the same sharing `Serving.openSharded`
    * uses for its in-process shards.
    */
  private def loadGlobalDf(spark: SparkSession, outDir: String): java.util.HashMap[String, Long] = {
    // the global terms table is MANDATORY (unlike a shard directory,
    // which is legitimately absent when a shard owns zero segments) — a
    // partial export must fail the open loudly, not serve zero hits
    require(graft.ingest.Fs.exists(s"$outDir/terms"),
      s"no global terms table at $outDir/terms — incomplete export")
    val df = new java.util.HashMap[String, Long]()
    readOr[TermStat](spark, s"$outDir/terms").foreach(t => df.put(t.term, t.df))
    df
  }

  private def loadStats(outDir: String): IndexStats = {
    val s = graft.ingest.Fs.readString(s"$outDir/stats.json")
    def num(k: String) = (s""""$k"\\s*:\\s*([-0-9.eE]+)""").r
      .findFirstMatchIn(s).get.group(1)
    IndexStats(num("nDocs").toLong, num("avgdl").toDouble,
      num("nTerms").toLong, num("totalTokens").toLong)
  }

  def openExportedShard(
      spark: SparkSession, outDir: String, shardId: Int, maxBytes: Long,
      withDocs: Boolean = false): ServingIndex = {
    val n = nShards(outDir)
    require(shardId >= 0 && shardId < n, s"shardId $shardId out of range for $n shards")
    openExportedShardWith(spark, outDir, shardId, maxBytes, withDocs,
      loadGlobalDf(spark, outDir), loadStats(outDir))
  }

  private def openExportedShardWith(
      spark: SparkSession, outDir: String, shardId: Int, maxBytes: Long,
      withDocs: Boolean, df: java.util.HashMap[String, Long],
      stats: IndexStats): ServingIndex = {
    val blocks = readOr[PostingBlock](spark, s"$outDir/postings/shard=$shardId")
    val norms = Serving.normsMapOf(readOr[SegNorms](spark, s"$outDir/norms/shard=$shardId"))
    val si = Serving.assemble(blocks, norms, df, stats, maxBytes)
    // per-shard fetch store: this node materializes _source only for the
    // documents whose postings it scores
    if (withDocs) si.loadDocs(readOr[DocMeta](spark, s"$outDir/docs/shard=$shardId"))
    si
  }

  /** All shards of an export opened in one process, routed — the
    * integration-test form of the per-node deployment (each shard open
    * still reads only its own directory). The global term table is read
    * ONCE and shared (it is identical for every shard — re-reading it per
    * shard was the dominant open cost), and the per-shard directory reads
    * run concurrently: independent Spark collects back-fill each other's
    * scheduling gaps (guide §2.6), exactly as separate nodes would open in
    * parallel on a real deploy.
    */
  def openExportedCluster(
      spark: SparkSession, outDir: String, maxBytesPerShard: Long,
      withDocs: Boolean = false): ServingCluster = {
    val n = nShards(outDir)
    val df = loadGlobalDf(spark, outDir)
    val stats = loadStats(outDir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(n, 8))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // one job group over all shard-open collects: a failed open cancels
    // the group's in-flight Spark jobs (thread interruption alone never
    // cancels a submitted job), and shutdownNow stops queued opens
    val group = s"graft-export-open-$outDir-${System.nanoTime()}"
    try Serving.clusterOf(Await.result(
      Future.sequence((0 until n).map(s => Future {
        spark.sparkContext.setJobGroup(group, s"exported shard $s open",
          interruptOnCancel = true)
        openExportedShardWith(spark, outDir, s, maxBytesPerShard, withDocs, df, stats)
      })),
      Duration.Inf))
    catch {
      case t: Throwable => spark.sparkContext.cancelJobGroup(group); throw t
    } finally pool.shutdownNow()
  }
}
/** A serving node that follows a LIVE index: continuous indexing
  * (`StreamIngest.indexStream`) appends slices to the store, and the
  * node re-opens when — and only when — the committed slice set changes,
  * swapping the served index atomically. Queries in flight keep the
  * index they started on and new queries see the refreshed one: the
  * zero-downtime refresh the reference gets from OpenSearch's
  * per-segment reader reopen. Call `refresh()` from ONE scheduler thread
  * at the freshness interval the deployment wants (queries are
  * thread-safe against the published index; `refresh` itself is
  * single-caller).
  *
  * LAYERED, like Lucene's per-segment readers: `current` is a router
  * (`ServingCluster`) over one immutable sub-index per slice. Slices
  * partition docID segments exactly as the document shards of
  * `Serving.openSharded` do, so the k-merge is the same bit-identical
  * router the sharded gates pin. A refresh (a) reads + decodes ONLY the
  * delta slices, (b) re-derives the global df/stats from cached
  * per-slice partials by cloning last tick's df map and applying the
  * delta, and (c) re-stamps every cached sub-index with the new globals
  * — a wrapper object per slice, sharing the decoded-block cache, the
  * norms, and the doc store underneath. Per-tick cost is
  * O(delta + nSlices + changed vocabulary): no re-decode, no full-index
  * scan, no doc-store rebuild (a flat merged index would pay O(index)
  * per tick in re-grouping, re-decoding norms, and rebuilding the doc
  * map — exactly what breaks at a 1000× index/append ratio). The tiered
  * merge policy bounds nSlices (default 16), so the router fan-out is a
  * constant, not a function of stream age.
  */
final class ServingNode(
    spark: SparkSession,
    store: IndexStore,
    maxBytes: Long,
    withDocs: Boolean = false) {
  import spark.implicits._

  // ---- per-slice immutable payloads (slice files never change once
  // committed, so none of this reloads or re-decodes for a cached id;
  // a merge/compaction drops the old ids and loads the merged one) ----
  private val sliceBlocks =
    scala.collection.mutable.Map.empty[Int, Array[PostingBlock]]
  private val sliceByTerm =
    scala.collection.mutable.Map.empty[Int, java.util.HashMap[String, Array[PostingBlock]]]
  private val sliceCache = scala.collection.mutable.Map.empty[Int, BlockCache]
  private val sliceNorms = scala.collection.mutable
    .Map.empty[Int, java.util.HashMap[Integer, (Array[Long], Array[Int])]]
  private val sliceTerms = scala.collection.mutable.Map.empty[Int, Array[TermStat]]
  private val sliceCounts = scala.collection.mutable.Map.empty[Int, (Long, Long)]
  private val sliceDocs =
    scala.collection.mutable.Map.empty[Int, java.util.HashMap[Long, DocMeta]]
  private val sliceDecEst = scala.collection.mutable.Map.empty[Int, Long]
  private val slicePosBytes = scala.collection.mutable.Map.empty[Int, Long]
  // content identity of each cached slice — the FULL SliceMeta, not the
  // id: a fixed-id rebuild (which the dead-list revive legitimizes)
  // recommits an existing id with NEW content, and keying the caches on
  // id alone would silently serve the stale payload forever
  private val sliceMetaOf = scala.collection.mutable.Map.empty[Int, SliceMeta]

  // ---- global side state, cloned + delta'd per tick. The served
  // wrappers hold last tick's df map by reference, so it is NEVER
  // mutated in place — the next tick clones it (O(vocab) pointer
  // copies), subtracts dropped slices' partials and adds loaded ones. ----
  private var globalDf: java.util.HashMap[String, Long] = null

  // ---- decoded-postings budget state. Mirrors `Serving.assemble`'s
  // policy at node scope: when every slice's decoded postings + retained
  // positions fit `maxBytes`, each slice pre-decodes fully at load (the
  // allocation-free mt mode) and the leftover headroom funds ONE shared
  // hot-phrase positions cache; otherwise all slices share ONE bounded
  // CLOCK decode cache (entries keyed by block identity, so a dropped
  // slice's entries age out by eviction). Mode transitions rebuild the
  // affected caches — rare (the budget boundary is crossed once as the
  // index grows) and flagged by lastReusedDecodes dropping to 0. ----
  private var fitsMode: Boolean = true
  private var sharedClock: ClockDecodeCache = null
  private var sharedClockBudget: Long = -1L
  private var sharedPosCache: Option[ClockCache[Serving.DecodedPositions]] = None
  private var posCacheBudget: Long = -1L

  /** Refresh observability: slices loaded / dropped on the last (re)open,
    * and decoded blocks carried over (blocks of retained slices whose
    * decode cache survived the tick — 0 right after a budget-mode
    * transition, which re-decodes lazily or eagerly per the new mode).
    */
  @volatile var lastLoadedSlices: Int = 0
  @volatile var lastDroppedSlices: Int = 0
  @volatile var lastReusedDecodes: Int = 0

  @volatile private var state: (Seq[SliceMeta], ServingCluster) = load()

  private def load(): (Seq[SliceMeta], ServingCluster) = {
    // ONE manifest snapshot drives every read below — blocks, norms,
    // terms, stats, and docs all come from the same committed slice set,
    // so a concurrent append/merge can never mix old blocks with new
    // corpus stats (which would break score identity)
    val slices = store.committedSlices
    require(slices.nonEmpty, s"nothing committed at ${store.root}")
    val ids = slices.map(_.sliceId).toSet
    val metaById = slices.map(s => s.sliceId -> s).toMap
    // an id cached under a DIFFERENT meta was recommitted with new
    // content: reload it like a new slice, and retire its old partials
    // from the global merge like a dropped one
    val changed = sliceBlocks.keySet.toSet
      .intersect(ids).filter(id => sliceMetaOf(id) != metaById(id))
    val newIds = ((ids -- sliceBlocks.keySet) ++ changed).toSeq.sorted
    val dropped = sliceBlocks.keySet.toSet -- ids
    val sortedIds = ids.toSeq.sorted

    // ---- READ + DECODE phase: only the delta slices. Everything lands
    // in locals; caches and counters commit at the end, so a failure
    // anywhere (transient FS error, or — only if the deployment's vacuum
    // grace window is shorter than a refresh — a reclaimed superseded
    // slice) leaves the node exactly as it was. Merges themselves never
    // delete files: superseded slices sit on the manifest dead-list
    // until `IndexStore.vacuum`'s grace window passes. ----
    val loaded = newIds.map { id =>
      val blocks =
        spark.read.parquet(store.slicePath("postings", id)).as[PostingBlock].collect()
      val norms = Serving.normsMapOf(
        spark.read.parquet(store.slicePath("norms", id)).as[SegNorms].collect())
      val terms =
        spark.read.parquet(store.slicePath("terms", id)).as[TermStat].collect()
      val docs =
        if (!withDocs) null
        else {
          val metas = spark.read.parquet(store.slicePath("docs", id))
            .select(col("doc_id"), col("url"),
              col("doclen").cast("int").as("doclen"), col("lang"))
            .as[DocMeta].collect()
          val m = new java.util.HashMap[Long, DocMeta](metas.length * 2)
          metas.foreach(d => m.put(d.doc_id, d))
          m
        }
      val byTerm = new java.util.HashMap[String, Array[PostingBlock]]()
      blocks.groupBy(_.term).foreach { case (t, bs) => byTerm.put(t, bs) }
      // (nDocs, totalTokens) from the decoded doclens — the exact per-doc
      // token counts scoring uses, so the merged avgdl is bit-identical
      // to IndexStats.fromDocs over the same snapshot
      var n = 0L
      var tok = 0L
      norms.forEach { (_, v) =>
        n += v._1.length
        var i = 0
        while (i < v._2.length) { tok += v._2(i); i += 1 }
      }
      (id, blocks, byTerm, norms, terms, (n, tok), docs,
        blocks.iterator.map(Serving.decodedBytes).sum,
        blocks.iterator.map(Serving.positionBytes).sum)
    }
    val loadedById = loaded.iterator.map(l => l._1 -> l).toMap
    def blocksOf(id: Int) = loadedById.get(id).map(_._2).getOrElse(sliceBlocks(id))
    def byTermOf(id: Int) = loadedById.get(id).map(_._3).getOrElse(sliceByTerm(id))
    def normsOf(id: Int) = loadedById.get(id).map(_._4).getOrElse(sliceNorms(id))
    def cntOf(id: Int) = loadedById.get(id).map(_._6).getOrElse(sliceCounts(id))
    def docsOf(id: Int) = loadedById.get(id).map(_._7).getOrElse(sliceDocs(id))
    def decEstOf(id: Int) = loadedById.get(id).map(_._8).getOrElse(sliceDecEst(id))
    def posOf(id: Int) = loadedById.get(id).map(_._9).getOrElse(slicePosBytes(id))

    // ---- budget plan over the NEW slice set ----
    val totDec = sortedIds.iterator.map(decEstOf).sum
    val totPos = sortedIds.iterator.map(posOf).sum
    val fits = totDec + totPos <= maxBytes
    val newCaches = scala.collection.mutable.Map.empty[Int, BlockCache]
    val carried = scala.collection.mutable.Set.empty[Int]
    var clock = sharedClock
    var clockBudget = sharedClockBudget
    if (fits) {
      clock = null; clockBudget = -1L
      sortedIds.foreach { id =>
        sliceCache.get(id) match {
          // only an UNCHANGED cached slice carries its pre-decodes — a
          // recommitted id's old cache holds the stale blocks
          case Some(f: FullDecodeCache) if fitsMode && !loadedById.contains(id) =>
            newCaches(id) = f; carried += id // pre-decodes survive untouched
          case _ =>
            newCaches(id) = new FullDecodeCache(blocksOf(id)) // decode now
        }
      }
    } else {
      val budget = math.max(maxBytes - totPos, maxBytes / 16)
      if (clock == null || budget < clockBudget) {
        // first bounded tick, or the unevictable positions grew into the
        // cache's budget: a fresh (smaller) cache re-decodes lazily
        clock = new ClockDecodeCache(budget); clockBudget = budget
      } else if (!fitsMode) {
        // same shared cache keeps serving — retained decodes stay hot
        carried ++= ids.filterNot(newIds.contains)
      }
      sortedIds.foreach(id => newCaches(id) = clock)
    }

    // ---- global df: clone + delta. Subtract dropped partials FIRST
    // (a merge both drops and adds the same terms), removing exact-zero
    // entries — topK gates query terms on containsKey, so a dead term
    // must disappear, not linger at df=0. java.util.HashMap unboxes a
    // missing get to 0L in Scala, which is exactly the additive identity
    // the adds need. ----
    val df =
      if (globalDf == null) new java.util.HashMap[String, Long]()
      else new java.util.HashMap[String, Long](globalDf)
    // dropped AND changed ids leave with their OLD cached partials — read
    // from sliceTerms directly, never through the loaded-else-cache view
    // (for a changed id that view yields the NEWLY-loaded partials, which
    // would corrupt the subtraction); changed ids then re-enter with
    // their new partials in the adds below
    (dropped ++ changed).foreach { id =>
      sliceTerms(id).foreach { t =>
        val left = df.get(t.term) - t.df
        if (left <= 0L) df.remove(t.term) else df.put(t.term, left)
      }
    }
    loaded.foreach(l => l._5.foreach(t => df.put(t.term, df.get(t.term) + t.df)))

    // ---- corpus stats from cached per-slice counts (same arithmetic as
    // IndexStats.fromDocs over this snapshot's docs) ----
    var nDocs = 0L
    var totTokens = 0L
    sortedIds.foreach { id =>
      val (a, b) = cntOf(id); nDocs += a; totTokens += b
    }
    val stats = IndexStats(nDocs,
      if (nDocs == 0) 0.0 else totTokens.toDouble / nDocs, df.size().toLong, totTokens)

    // ---- shared hot-phrase positions cache from the budget headroom
    // (fits mode only, like the flat open). Keyed by block identity, so
    // keeping it across ticks preserves hot decodes; recreate only when
    // the headroom SHRANK below its budget (it must never overrun). ----
    var posC = sharedPosCache
    var posB = posCacheBudget
    val headroom = maxBytes - totDec - totPos
    if (fits && totPos > 0 && headroom > 0) {
      if (posC.isEmpty || headroom < posB) {
        posC = Some(new ClockCache[Serving.DecodedPositions](
          headroom, Serving.decodePositionsOf, (_, v) => Serving.decodedPositionBytes(v)))
        posB = headroom
      }
    } else { posC = None; posB = -1L }

    // ---- node-level budget accounting, stamped on every wrapper ----
    val cacheBudget = if (fits) totDec else clockBudget
    val report = Serving.OpenReport(
      maxBytes = maxBytes,
      estDecodedBytes = totDec,
      retainedPositionBytes = totPos,
      cacheBudgetBytes = cacheBudget,
      bounded = !fits,
      overBudget = totPos + cacheBudget > maxBytes)

    // ---- wrappers + router: O(nSlices) object constructions sharing
    // the cached payloads; no decode, no rebuild. The cluster's
    // loadedBytes identity-dedups the shared caches, so footprint
    // accounting stays honest even though every wrapper references the
    // same bounded decode cache / positions cache. ----
    val shards = sortedIds.map { id =>
      val si = new ServingIndex(byTermOf(id), newCaches(id), normsOf(id),
        df, stats, posOf(id), posC, report)
      if (withDocs) si.setDocStore(docsOf(id))
      si
    }.toIndexedSeq
    val cluster = Serving.clusterOf(shards)

    // ---- COMMIT — everything above succeeded ----
    loaded.foreach { case (id, blocks, byTerm, norms, terms, cnt, docs, dec, pos) =>
      sliceBlocks(id) = blocks; sliceByTerm(id) = byTerm; sliceNorms(id) = norms
      sliceTerms(id) = terms; sliceCounts(id) = cnt
      if (withDocs) sliceDocs(id) = docs
      sliceDecEst(id) = dec; slicePosBytes(id) = pos
    }
    dropped.foreach { id =>
      sliceBlocks.remove(id); sliceByTerm.remove(id); sliceNorms.remove(id)
      sliceTerms.remove(id); sliceCounts.remove(id); sliceDocs.remove(id)
      sliceDecEst.remove(id); slicePosBytes.remove(id); sliceCache.remove(id)
    }
    newCaches.foreach { case (id, c) => sliceCache(id) = c }
    sliceMetaOf.clear()
    slices.foreach(s => sliceMetaOf(s.sliceId) = s)
    globalDf = df
    fitsMode = fits
    sharedClock = clock
    sharedClockBudget = clockBudget
    sharedPosCache = posC
    posCacheBudget = posB
    lastLoadedSlices = newIds.size
    lastDroppedSlices = dropped.size
    lastReusedDecodes = carried.iterator.map(id => blocksOf(id).length).sum
    (slices, cluster)
  }

  /** The index serving new queries right now (stable reference — hold it
    * for a multi-call exchange like query-then-fetch).
    */
  def current: ServingCluster = state._2

  /** Last refresh failure, if the most recent attempt failed (cleared on
    * success) — false-from-failure is distinguishable from
    * false-from-no-change, so monitoring can tell "retry next tick" from
    * "this node has been failing for an hour and serves stale data".
    */
  @volatile var lastRefreshError: Option[Throwable] = None

  /** Re-open if the committed slice set changed; true when a new index
    * was swapped in. Slice metas identify content: commits are atomic
    * manifest renames and slice files are immutable once committed.
    * Unchanged slices keep their sub-index payloads AND their decoded
    * postings, so the decode work is bounded by the delta.
    */
  def refresh(): Boolean = {
    val seen = state._1
    val now = store.committedSlices
    if (now == seen) false
    else
      try {
        state = load()
        lastRefreshError = None
        true
      } catch {
        // transient load failure (FS hiccup; or a vacuum racing this
        // refresh when the grace window is misconfigured below the
        // refresh interval): keep serving the current index, surface the
        // error, and let the next tick snapshot the post-merge manifest
        // and retry cleanly. NonFatal only: interrupts and fatal JVM
        // errors propagate.
        case scala.util.control.NonFatal(e) =>
          lastRefreshError = Some(e)
          false
      }
  }
}
