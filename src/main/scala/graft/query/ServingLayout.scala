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
  def openExportedShard(
      spark: SparkSession, outDir: String, shardId: Int, maxBytes: Long,
      withDocs: Boolean = false): ServingIndex = {
    import spark.implicits._
    val n = nShards(outDir)
    require(shardId >= 0 && shardId < n, s"shardId $shardId out of range for $n shards")
    // a shard that owns zero segments (fewer segments than shards) has no
    // directory — it opens empty and the router merge is unaffected
    def readOr[T: org.apache.spark.sql.Encoder: scala.reflect.ClassTag](path: String): Array[T] =
      if (!graft.ingest.Fs.exists(path)) Array.empty[T]
      else spark.read.parquet(path).as[T].collect()
    val blocks = readOr[PostingBlock](s"$outDir/postings/shard=$shardId")
    val norms = Serving.normsMapOf(readOr[SegNorms](s"$outDir/norms/shard=$shardId"))
    val df = new java.util.HashMap[String, Long]()
    spark.read.parquet(s"$outDir/terms").as[TermStat].collect()
      .foreach(t => df.put(t.term, t.df))
    val stats = {
      val s = graft.ingest.Fs.readString(s"$outDir/stats.json")
      def num(k: String) = (s""""$k"\\s*:\\s*([-0-9.eE]+)""").r
        .findFirstMatchIn(s).get.group(1)
      IndexStats(num("nDocs").toLong, num("avgdl").toDouble,
        num("nTerms").toLong, num("totalTokens").toLong)
    }
    val si = Serving.assemble(blocks, norms, df, stats, maxBytes)
    // per-shard fetch store: this node materializes _source only for the
    // documents whose postings it scores
    if (withDocs) si.loadDocs(readOr[DocMeta](s"$outDir/docs/shard=$shardId"))
    si
  }

  /** All shards of an export opened in one process, routed — the
    * integration-test form of the per-node deployment (each shard open
    * still reads only its own directory).
    */
  def openExportedCluster(
      spark: SparkSession, outDir: String, maxBytesPerShard: Long,
      withDocs: Boolean = false): ServingCluster =
    Serving.clusterOf(
      (0 until nShards(outDir))
        .map(s => openExportedShard(spark, outDir, s, maxBytesPerShard, withDocs)))
}

/** A serving node that follows a LIVE index: continuous indexing
  * (`StreamIngest.indexStream`) appends slices to the store, and the
  * node re-opens when — and only when — the committed slice set changes,
  * swapping the in-memory index atomically. Queries in flight keep the
  * index they started on and new queries see the refreshed one: the
  * zero-downtime refresh the reference gets from OpenSearch's
  * per-segment reader reopen. Refresh cost is INCREMENTAL — slice files
  * are immutable, so unchanged slices keep their cached payloads and
  * decoded blocks, and a tick reloads only the slice delta. Call
  * `refresh()` from ONE scheduler thread at the freshness interval the
  * deployment wants (queries are thread-safe against the published
  * index; `refresh` itself is single-caller).
  */
final class ServingNode(
    spark: SparkSession,
    store: IndexStore,
    maxBytes: Long,
    withDocs: Boolean = false) {
  import spark.implicits._

  /** Per-slice raw payloads, keyed by sliceId — slice files are immutable
    * once committed, so a cached slice never reloads; a merge/compaction
    * drops the old ids and loads the new one. This makes refresh cost
    * proportional to the SLICE DELTA, not the index: under the tiered
    * merge policy the big base slice is rarely rewritten, so a
    * micro-batch append reloads (and re-decodes) only kilobytes.
    *
    * The GLOBAL side state is delta-cached too: per-slice term partials
    * (df is additive across slices — they partition documents), per-slice
    * doc counts/token sums (derived from the already-loaded norms, zero
    * extra reads), and per-slice doc metas. The round-5 node re-scanned
    * the full terms and docs tables on every tick — at 1000× index/append
    * ratio those two full scans, not the slice delta, would have been the
    * refresh cost.
    */
  private val sliceBlocks = scala.collection.mutable.Map.empty[Int, Array[PostingBlock]]
  private val sliceNorms = scala.collection.mutable.Map.empty[Int, Array[SegNorms]]
  private val sliceTerms = scala.collection.mutable.Map.empty[Int, Array[TermStat]]
  private val sliceCounts = scala.collection.mutable.Map.empty[Int, (Long, Long)]
  private val sliceDocMetas = scala.collection.mutable.Map.empty[Int, Array[DocMeta]]

  /** (nDocs, totalTokens) of a slice from its norms payload — doclens are
    * the exact per-doc token counts scoring uses, so the merged avgdl is
    * bit-identical to `IndexStats.fromDocs` over the same snapshot.
    */
  private def countsOf(norms: Array[SegNorms]): (Long, Long) = {
    var n = 0L
    var tok = 0L
    norms.foreach { nm =>
      n += nm.n
      var i = 0
      while (i < nm.n) { tok += VByte.unpackIntAt(nm.doclens, i); i += 1 }
    }
    (n, tok)
  }

  /** Refresh observability: slices loaded / dropped and decoded blocks
    * reused on the last (re)open.
    */
  @volatile var lastLoadedSlices: Int = 0
  @volatile var lastDroppedSlices: Int = 0
  @volatile var lastReusedDecodes: Int = 0

  @volatile private var state: (Seq[SliceMeta], ServingIndex) = load(null)

  private def load(
      prevDecoded: java.util.IdentityHashMap[PostingBlock, (Array[Long], Array[Long])])
      : (Seq[SliceMeta], ServingIndex) = {
    // ONE manifest snapshot drives every read below — blocks, norms,
    // terms, stats, and docs all come from the same committed slice set,
    // so a concurrent append/merge can never mix old blocks with new
    // corpus stats (which would break score identity)
    val slices = store.committedSlices
    require(slices.nonEmpty, s"nothing committed at ${store.root}")
    val ids = slices.map(_.sliceId).toSet
    val newIds = (ids -- sliceBlocks.keySet).toSeq.sorted
    val dropped = sliceBlocks.keySet.toSet -- ids
    // EVERY read happens first — per-slice payloads AND the small global
    // tables; caches and observability counters mutate only after all of
    // them succeeded. A failure mid-load (transient FS error, or — only
    // if the deployment's vacuum grace window is shorter than a refresh —
    // a reclaimed superseded slice) leaves the node's state — caches and
    // counters both — exactly as it was. Merges themselves never delete
    // files anymore: superseded slices sit on the manifest dead-list
    // until `IndexStore.vacuum`'s grace window passes.
    // delta-only reads: per NEW slice — postings, norms, term partials,
    // and (withDocs) doc metas. The global df map, corpus stats, and doc
    // store then MERGE from the per-slice caches in memory: a refresh
    // runs ZERO full-index scans, so tick cost tracks the slice delta
    // even when the index is 1000× the append.
    val loaded = newIds.map { id =>
      (id,
        spark.read.parquet(store.slicePath("postings", id)).as[PostingBlock].collect(),
        spark.read.parquet(store.slicePath("norms", id)).as[SegNorms].collect(),
        spark.read.parquet(store.slicePath("terms", id)).as[TermStat].collect(),
        if (withDocs)
          spark.read.parquet(store.slicePath("docs", id))
            .select(col("doc_id"), col("url"), col("doclen").cast("int").as("doclen"), col("lang"))
            .as[DocMeta].collect()
        else null)
    }

    // merge through loaded-else-cache VIEWS: the caches and counters
    // commit only after assemble + loadDocs succeed too — a decode
    // failure mid-assemble must leave the node's state (serving index,
    // caches, AND observability counters) exactly as it was, or the next
    // successful refresh would report lastLoadedSlices=0 for the tick
    // that actually published the data (breaking the refresh-cost-
    // tracks-delta evidence the bench's live phase ships)
    val loadedById = loaded.iterator.map(l => l._1 -> l).toMap
    val loadedCounts = loaded.iterator.map(l => l._1 -> countsOf(l._3)).toMap
    def blocksOf(id: Int) = loadedById.get(id).map(_._2).getOrElse(sliceBlocks(id))
    def normsOf(id: Int) = loadedById.get(id).map(_._3).getOrElse(sliceNorms(id))
    def termsOf(id: Int) = loadedById.get(id).map(_._4).getOrElse(sliceTerms(id))
    def cntOf(id: Int) = loadedCounts.getOrElse(id, sliceCounts(id))
    def metasOf(id: Int) = loadedById.get(id).map(_._5).getOrElse(sliceDocMetas(id))
    val sortedIds = ids.toSeq.sorted
    val blocks = sortedIds.iterator.flatMap(blocksOf).toArray
    val norms = Serving.normsMapOf(sortedIds.iterator.flatMap(normsOf).toArray)
    // df partials are additive (slices partition documents); the merged
    // sum over longs equals the round-5 groupBy-sum exactly
    val df = new java.util.HashMap[String, Long]()
    sortedIds.foreach(id =>
      termsOf(id).foreach(t => df.put(t.term, df.get(t.term) + t.df)))
    var nDocs = 0L
    var totTokens = 0L
    sortedIds.foreach { id =>
      val (a, b) = cntOf(id); nDocs += a; totTokens += b
    }
    // same arithmetic as IndexStats.fromDocs over this snapshot's docs
    val stats = IndexStats(nDocs,
      if (nDocs == 0) 0.0 else totTokens.toDouble / nDocs, df.size().toLong, totTokens)
    val si = Serving.assemble(blocks, norms, df, stats, maxBytes, prevDecoded)
    if (withDocs)
      si.loadDocs(sortedIds.iterator.flatMap(metasOf).toArray)
    // COMMIT — everything above succeeded
    loaded.foreach { case (id, b, n, t, dm) =>
      sliceBlocks(id) = b; sliceNorms(id) = n; sliceTerms(id) = t
      sliceCounts(id) = loadedCounts(id)
      if (withDocs) sliceDocMetas(id) = dm
    }
    dropped.foreach { id =>
      sliceBlocks.remove(id); sliceNorms.remove(id); sliceTerms.remove(id)
      sliceCounts.remove(id); sliceDocMetas.remove(id)
    }
    lastLoadedSlices = newIds.size
    lastDroppedSlices = dropped.size
    lastReusedDecodes = si.reusedDecodes
    (slices, si)
  }

  /** The index serving new queries right now (stable reference — hold it
    * for a multi-call exchange like query-then-fetch).
    */
  def current: ServingIndex = state._2

  /** Re-open if the committed slice set changed; true when a new index
    * was swapped in. Slice metas identify content: commits are atomic
    * manifest renames and slice files are immutable once committed.
    * Unchanged slices keep their block instances AND their decoded
    * postings (identity reuse through the new index's cache), so the
    * decode work is bounded by the delta.
    */
  /** Last refresh failure, if the most recent attempt failed (cleared on
    * success) — false-from-failure is distinguishable from
    * false-from-no-change, so monitoring can tell "retry next tick" from
    * "this node has been failing for an hour and serves stale data".
    */
  @volatile var lastRefreshError: Option[Throwable] = None

  def refresh(): Boolean = {
    val seen = state._1
    val now = store.committedSlices
    if (now == seen) false
    else
      try {
        state = load(state._2.decodedSnapshot)
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
