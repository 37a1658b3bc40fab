package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analysis.Analyzer
import graft.index._

/** In-memory single-node serving tier over a built index.
  *
  * Spark is the BUILD engine; serving interactive queries through Spark
  * jobs pays ~100 ms of scheduling per search. A real deployment of this
  * engine serves the way the reference's OpenSearch does: each shard
  * server holds its slice of the postings in memory and answers locally.
  * `ServingIndex` is that shard server in miniature — it loads one
  * store's compressed postings/norms/terms (one Spark collect at open)
  * and then answers top-k queries in pure JVM time through the SAME
  * `Wand.segTopK` kernel the distributed path runs, so results are
  * bit-identical to both the distributed WAND and the brute-force oracle.
  *
  * Scale contract: `maxBytes` budgets the DECODED postings footprint. A
  * slice that fits is fully pre-decoded (allocation-free queries); a
  * larger slice serves through a bounded decoded-block cache — partial
  * pre-decode, same bit-identical results. At web scale the corpus is
  * document-sharded across serving nodes exactly like the distributed
  * path's segments — each node opens the slice the build wrote for it,
  * and a router merges per-node top-ks (the TakeOrdered merge, over RPC
  * instead of a Spark stage).
  */
/** Decoded-postings storage policy for a serving node. Both policies
  * answer through the same kernel, so results are bit-identical; they
  * differ only in RAM-vs-CPU trade.
  */
private[query] sealed trait BlockCache {
  def get(b: PostingBlock): (Array[Long], Array[Long])
  def loadedBytes: Long
}

/** Everything pre-decoded at open: queries run allocation-free (the
  * mt-throughput mode — per-query decode allocations make 16 threads
  * SLOWER than 1, GC-bound). Requires the decoded slice to fit the budget.
  */
private[query] final class FullDecodeCache(blocks: Array[PostingBlock])
    extends BlockCache {
  private val m = new java.util.IdentityHashMap[PostingBlock, (Array[Long], Array[Long])](blocks.length * 2)
  blocks.foreach(b => m.put(b, TermPostings.decodeBlock(b)))
  val loadedBytes: Long = blocks.iterator.map(Serving.decodedBytes).sum
  def get(b: PostingBlock): (Array[Long], Array[Long]) = m.get(b)
}

/** Bounded decoded-block cache: a slice whose decoded footprint exceeds
  * the budget serves with partial pre-decode instead of refusing. Lookups
  * are lock-free ConcurrentHashMap reads plus one volatile write to mark
  * the entry referenced (warm-set queries stay close to full-pre-decode
  * throughput); misses decode on demand and evict by the CLOCK /
  * second-chance rule — a recently-hit entry gets its referenced bit
  * cleared and moves to the tail instead of dying, so a hot block
  * inserted early is never thrashed out by a cold scan (the defect plain
  * FIFO insertion order had). Bit-identity is unconditional — eviction
  * only changes WHERE the decode happens.
  */
private[query] final class ClockDecodeCache(budget: Long) extends BlockCache {
  private val c = new ClockCache[(Array[Long], Array[Long])](
    budget, TermPostings.decodeBlock, (b, _) => Serving.decodedBytes(b))
  def get(b: PostingBlock): (Array[Long], Array[Long]) = c.get(b)
  def loadedBytes: Long = c.loadedBytes
}

/** Generic bounded CLOCK cache over per-block decoded values — shared by
  * the postings decode cache and the phrase positions cache.
  */
private[query] final class ClockCache[V <: AnyRef](
    budget: Long,
    decode: PostingBlock => V,
    sizeOf: (PostingBlock, V) => Long) {
  private final class Entry(val decoded: V, val size: Long) {
    @volatile var referenced: Boolean = false
  }
  private val m = new java.util.concurrent.ConcurrentHashMap[PostingBlock, Entry]()
  private val order = new java.util.concurrent.ConcurrentLinkedQueue[PostingBlock]()
  private val bytes = new java.util.concurrent.atomic.AtomicLong(0L)

  def get(b: PostingBlock): V = {
    val hit = m.get(b)
    if (hit != null) { hit.referenced = true; return hit.decoded }
    val d = decode(b)
    val prev = m.putIfAbsent(b, new Entry(d, sizeOf(b, d)))
    if (prev != null) { prev.referenced = true; return prev.decoded }
    order.add(b)
    var cur = bytes.addAndGet(sizeOf(b, d))
    // second chances are bounded by one full lap of the queue — when every
    // entry is referenced the scan degrades to FIFO rather than spinning
    var chances = m.size() + 1
    while (cur > budget) {
      val victim = order.poll()
      if (victim == null) return d // nothing left to evict
      val e = m.get(victim)
      if (e == null) { cur = bytes.get() } // another thread evicted it
      else if (e.referenced && chances > 0) {
        e.referenced = false
        chances -= 1
        order.add(victim) // spared: recently used
      } else if (m.remove(victim) != null) {
        cur = bytes.addAndGet(-e.size)
      } else cur = bytes.get()
    }
    d
  }
  def loadedBytes: Long = bytes.get()
}

final class ServingIndex private[query] (
    postingsByTerm: java.util.HashMap[String, Array[PostingBlock]],
    cache: BlockCache,
    normsBySeg: java.util.HashMap[Integer, (Array[Long], Array[Int])],
    termDf: java.util.HashMap[String, Long],
    val stats: IndexStats,
    /** Compressed positional payload retained on-heap by a positional
      * slice — real serving footprint, counted against the open budget.
      */
    val retainedPositionBytes: Long = 0L,
    /** Decoded-positions cache for hot phrase traffic, sized to the
      * HEADROOM the open budget left after the pre-decoded postings and
      * the retained compressed positions — absent when the budget is
      * already tight (phrase queries then decode per query, the classic
      * positional trade). Bit-identity unconditional.
      */
    posCache: Option[ClockCache[Serving.DecodedPositions]] = None,
    /** Budget accounting at open time — `overBudget` means the
      * unevictable compressed positions plus the decode-cache floor
      * exceed `maxBytes`: the node still serves bit-identically, but the
      * operator's heap sizing must use `retainedPositionBytes +
      * cacheBudgetBytes`, not `maxBytes`.
      */
    val openReport: Serving.OpenReport = Serving.OpenReport(0, 0, 0, 0, false, false)) {

  def loadedBytes: Long =
    cache.loadedBytes + retainedPositionBytes +
      posCache.map(_.loadedBytes).getOrElse(0L)

  // cache identities, for footprint accounting that must not multi-count
  // caches SHARED across shards (the layered ServingNode's bounded decode
  // cache and hot-phrase positions cache)
  private[query] def blockCacheRef: BlockCache = cache
  private[query] def posCacheRef: Option[ClockCache[Serving.DecodedPositions]] = posCache
  /** True when the decoded slice exceeded the budget and the node serves
    * through the bounded cache (partial pre-decode).
    */
  val bounded: Boolean = cache.isInstanceOf[ClockDecodeCache]

  private val decodeFn: PostingBlock => (Array[Long], Array[Long]) = cache.get(_)

  /** Exact BM25 top-k; rank-identical to `Wand.topK` (same kernel, same
    * tie-breaks, same fold order). Pure JVM — no Spark job.
    */
  def topK(query: String, k: Int): Array[(Long, Double)] = {
    val qTerms = Analyzer.tokenize(query).distinct.sorted
    val present = qTerms.filter(termDf.containsKey)
    if (present.isEmpty || stats.nDocs == 0) return Array.empty
    val idfs: Map[String, Double] =
      present.map(t => t -> BM25.idf(stats.nDocs, termDf.get(t))).toMap

    // group the query terms' blocks by segment (document shard)
    val bySeg = new java.util.HashMap[Integer, java.util.ArrayList[PostingBlock]]()
    present.foreach { t =>
      val bs = postingsByTerm.get(t)
      if (bs != null) bs.foreach { b =>
        bySeg.computeIfAbsent(b.seg, _ => new java.util.ArrayList[PostingBlock]())
          .add(b)
      }
    }

    // per-segment WAND over PRE-DECODED postings/norms (no per-query
    // decode allocations — the serving tier's RAM-for-CPU trade), then
    // the same (score desc, docId asc) k-merge the distributed path's
    // TakeOrderedAndProject performs
    val heap = new TopKHeap(k)
    bySeg.forEach { (seg, blocks) =>
      val arr = blocks.toArray(new Array[PostingBlock](blocks.size()))
      val (nDocs, nLens) = normsBySeg.get(seg)
      def doclen(docId: Long): Long = {
        val i = java.util.Arrays.binarySearch(nDocs, docId)
        require(i >= 0, s"docId $docId missing from norms of seg $seg")
        nLens(i).toLong
      }
      Wand.segTopKWith(arr, doclen, idfs, stats.avgdl, k, decodeFn)
        .foreach { case (d, s) => heap.offer(d, s) }
    }
    heap.result().sortBy(t => (-t._2, t._1))
  }

  /** Top-k as a DataFrame (for the driver gate / hit materialization). */
  def topKDF(spark: SparkSession, query: String, k: Int): DataFrame = {
    import spark.implicits._
    topK(query, k).toSeq.toDF("doc_id", "score")
  }

  /** Unscored phrase matches on THIS shard: (docId, ptf, doclen) for
    * every local document containing the phrase at consecutive positions
    * (overlaps counted — Lucene slop-0). Scoring needs the GLOBAL phrase
    * df, which only the router knows in a sharded layout (the
    * dfs_query_then_fetch shape), so matching and scoring are separate.
    * Positions decode on demand per query — phrase traffic is a small
    * fraction of term traffic, the classic positional-payload trade.
    */
  private[query] def phraseMatches(phrase: String): Array[(Long, Int, Long)] = {
    val slots = Analyzer.tokenize(phrase)
    if (slots.isEmpty) return Array.empty
    val distinctTerms = slots.distinct
    if (distinctTerms.exists(t => !postingsByTerm.containsKey(t))) return Array.empty

    // group the phrase terms' blocks by segment
    val bySeg = new java.util.HashMap[Integer, java.util.ArrayList[PostingBlock]]()
    distinctTerms.foreach { t =>
      postingsByTerm.get(t).foreach { b =>
        bySeg.computeIfAbsent(b.seg, _ => new java.util.ArrayList[PostingBlock]()).add(b)
      }
    }
    def decoded(b: PostingBlock): Serving.DecodedPositions = posCache match {
      case Some(c) => c.get(b) // hot-phrase fast path (budget headroom)
      case None => Serving.decodePositionsOf(b)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    bySeg.forEach { (seg, blocks) =>
      val byTerm = blocks.toArray(new Array[PostingBlock](blocks.size())).groupBy(_.term)
      if (!distinctTerms.exists(t => !byTerm.contains(t))) {
        // per-block probe maps come straight from the cache — the per-query
        // work is hash probes, never rebuilding a merged per-term map
        // (blocks of a (term, seg) partition the docID range, so a doc
        // lives in exactly the block whose [firstDoc, lastDoc] covers it)
        val termBlocks: Map[String, Array[(PostingBlock, Serving.DecodedPositions)]] =
          byTerm.map { case (t, bs) =>
            t -> bs.sortBy(_.firstDoc).map(b => (b, decoded(b)))
          }
        def lookup(t: String, doc: Long): Array[Int] = {
          val arr = termBlocks(t)
          var i = 0
          while (i < arr.length) {
            val (b, m) = arr(i)
            if (doc >= b.firstDoc && doc <= b.lastDoc) return m.get(doc)
            i += 1
          }
          null
        }
        val (nDocs, nLens) = normsBySeg.get(seg)
        val rarest = distinctTerms.minBy(t => termBlocks(t).iterator.map(_._2.size).sum)
        termBlocks(rarest).foreach { case (_, rm) =>
          rm.forEach { (doc, _) =>
            if (distinctTerms.forall(t => lookup(t, doc) != null)) {
              val slotPs = slots.map(t => lookup(t, doc))
              val c = Phrase.countOccurrences(slotPs)
              if (c > 0) {
                val i = java.util.Arrays.binarySearch(nDocs, doc)
                require(i >= 0, s"docId $doc missing from norms of seg $seg")
                out += ((doc, c, nLens(i).toLong))
              }
            }
          }
        }
      }
    }
    out.toArray
  }

  /** Exact phrase BM25 top-k on this (single-node) index — df is local =
    * global here. Rank-identical to `Phrase.topK` over the same store.
    */
  def phraseTopK(phrase: String, k: Int): Array[(Long, Double)] =
    Serving.scorePhraseMatches(phraseMatches(phrase), stats, k)

  // ---- hit materialization: the reference's `hits.hits[]._source + _score`
  // response shape, answered from the serving node's doc store ----
  private var docStore: java.util.HashMap[Long, DocMeta] = _

  /** Load the doc-metadata store for `_source` materialization (optional —
    * id-only responses don't need it). Same budget philosophy: at scale
    * the doc store is the serving shard's own slice.
    */
  private[query] def loadDocs(docs: Array[DocMeta]): Unit = {
    val m = new java.util.HashMap[Long, DocMeta](docs.length * 2)
    docs.foreach(d => m.put(d.doc_id, d))
    docStore = m
  }

  /** Inject a PREBUILT doc store (shared, immutable by convention) — the
    * layered `ServingNode` caches one HashMap per slice and re-injects it
    * into each tick's fresh wrapper, so refresh never rebuilds the doc
    * maps of untouched slices (`loadDocs` is O(docs) per call).
    */
  private[query] def setDocStore(m: java.util.HashMap[Long, DocMeta]): Unit =
    docStore = m

  private[query] def hasDocs: Boolean = docStore != null
  private[query] def docOf(id: Long): DocMeta =
    if (docStore == null) null else docStore.get(id)

  /** Scored hits with stored fields (requires `withDocs` at open). */
  def topKHits(query: String, k: Int): Array[Serving.Hit] = {
    require(docStore != null, "serving index opened without docs; use withDocs = true")
    topK(query, k).map { case (id, score) =>
      val d = docStore.get(id)
      require(d != null, s"docId $id missing from the serving doc store")
      Serving.Hit(id, d.url, d.lang, d.doclen, score)
    }
  }

  def topKHitsDF(spark: SparkSession, query: String, k: Int): DataFrame = {
    import spark.implicits._
    topKHits(query, k).toSeq.toDF()
  }
}

object Serving {

  /** The `hits.hits[]._source + _score` response row. */
  case class Hit(doc_id: Long, url: String, lang: String, doclen: Int, score: Double)

  /** What `open` actually admitted against `maxBytes` (ADVICE: the open
    * budget caps only the decoded-postings cache; unevictable compressed
    * positions can push the floor past it — `overBudget` says so).
    */
  case class OpenReport(
      maxBytes: Long,
      estDecodedBytes: Long,
      retainedPositionBytes: Long,
      cacheBudgetBytes: Long,
      bounded: Boolean,
      overBudget: Boolean)

  /** Score gathered phrase matches with the GLOBAL df (= match count
    * across every shard) through the same BM25 kernels as all paths.
    */
  private[query] def scorePhraseMatches(
      matches: Array[(Long, Int, Long)],
      stats: IndexStats,
      k: Int): Array[(Long, Double)] = {
    if (matches.isEmpty || stats.nDocs == 0) return Array.empty
    val idf = BM25.idf(stats.nDocs, matches.length.toLong)
    val heap = new TopKHeap(k)
    matches.foreach { case (d, ptf, dl) =>
      heap.offer(d, idf * BM25.tfNorm(ptf.toLong, dl, stats.avgdl))
    }
    heap.result().sortBy(t => (-t._2, t._1))
  }

  /** Decoded heap footprint of one posting block: two long arrays of n
    * (docIDs + tfs) plus object headers — the number that actually
    * occupies serving heap, NOT the compressed on-disk bytes the manifest
    * records (and compaction used to record as 0).
    */
  private[query] def decodedBytes(b: PostingBlock): Long = b.n.toLong * 16 + 64

  /** Compressed positional payload a block keeps on the serving heap
    * (phrase queries decode it on demand; it is never dropped while the
    * block is held). Zero for non-positional indexes.
    */
  private[query] def positionBytes(b: PostingBlock): Long =
    if (b.positions == null) 0L else b.positions.length.toLong + 16

  /** A positional block's decoded, probe-ready form: docId → ascending
    * token-index array. Stored as the ready HashMap because building the
    * probe structure — not the VByte decode — dominates per-query phrase
    * cost.
    */
  private[query] type DecodedPositions = java.util.HashMap[Long, Array[Int]]

  private[query] def decodePositionsOf(b: PostingBlock): DecodedPositions = {
    val docs = TermPostings.decodeBlock(b)._1
    val ps = TermPostings.decodePositions(b)
    val m = new java.util.HashMap[Long, Array[Int]](docs.length * 2)
    var i = 0
    while (i < docs.length) { m.put(docs(i), ps(i)); i += 1 }
    m
  }

  private[query] def decodedPositionBytes(dp: DecodedPositions): Long = {
    var s = 64L
    val it = dp.values().iterator()
    while (it.hasNext) s += it.next().length.toLong * 4 + 56 // entry + key + arr
    s
  }

  /** Load a committed index into serving memory. One Spark collect per
    * table. The budget governs the DECODED postings footprint (estimated
    * from posting counts, which every manifest — compacted or not —
    * preserves): a slice that fits is fully pre-decoded (allocation-free
    * queries, the mt-throughput mode); a larger slice serves through the
    * bounded decoded-block cache instead of refusing. The compressed
    * blocks themselves must fit the heap either way — a corpus beyond
    * that belongs on more serving shards.
    */
  def open(spark: SparkSession, store: IndexStore, maxBytes: Long): ServingIndex =
    open(store.open(spark), maxBytes)

  def open(idx: OpenIndex, maxBytes: Long, withDocs: Boolean = false): ServingIndex = {
    val si = assemble(idx.postings.collect(), collectNorms(idx), collectDf(idx),
      idx.stats, maxBytes)
    if (withDocs) si.loadDocs(collectDocs(idx))
    si
  }

  /** Assemble one serving shard from its blocks + norms and the GLOBAL
    * term stats — BM25 idf must use corpus-wide df/N/avgdl in every
    * layout, exactly as the distributed path resolves stats driver-side.
    */
  private[query] def assemble(
      blocks: Array[PostingBlock],
      norms: java.util.HashMap[Integer, (Array[Long], Array[Int])],
      df: java.util.HashMap[String, Long],
      stats: IndexStats,
      maxBytes: Long): ServingIndex = {
    val byTerm = new java.util.HashMap[String, Array[PostingBlock]]()
    blocks.groupBy(_.term).foreach { case (t, bs) => byTerm.put(t, bs) }
    val estDecoded = blocks.iterator.map(decodedBytes).sum
    // the retained compressed positions are footprint the budget must see:
    // they occupy heap for the life of the node whether or not a phrase
    // ever arrives, so the decoded-block budget shrinks by that amount
    // (floored so a positions-heavy slice still gets a working cache)
    val posBytes = blocks.iterator.map(positionBytes).sum
    val fits = estDecoded + posBytes <= maxBytes
    val cacheBudget = if (fits) estDecoded else math.max(maxBytes - posBytes, maxBytes / 16)
    val cache: BlockCache =
      if (fits) new FullDecodeCache(blocks)
      else new ClockDecodeCache(cacheBudget)
    // hot-phrase decoded-positions cache: only the headroom the budget
    // leaves after pre-decoded postings + retained compressed positions —
    // a tight budget means phrase queries decode per query as before
    val headroom = maxBytes - estDecoded - posBytes
    val posCache =
      if (posBytes > 0 && fits && headroom > 0)
        Some(new ClockCache[Serving.DecodedPositions](
          headroom, decodePositionsOf, (_, v) => decodedPositionBytes(v)))
      else None
    // honest budget accounting: the compressed positions are unevictable,
    // so when they alone eat (almost) the whole budget the floor footprint
    // posBytes + cache-floor EXCEEDS maxBytes — flag it rather than let a
    // degraded node silently run past the heap the operator sized for
    val report = Serving.OpenReport(
      maxBytes = maxBytes,
      estDecodedBytes = estDecoded,
      retainedPositionBytes = posBytes,
      cacheBudgetBytes = cacheBudget,
      bounded = !fits,
      overBudget = posBytes + cacheBudget > maxBytes)
    new ServingIndex(byTerm, cache, norms, df, stats, posBytes, posCache, report)
  }

  private def collectNorms(idx: OpenIndex): java.util.HashMap[Integer, (Array[Long], Array[Int])] =
    normsMapOf(idx.norms.collect())

  private[query] def normsMapOf(rows: Array[SegNorms]): java.util.HashMap[Integer, (Array[Long], Array[Int])] = {
    val norms = new java.util.HashMap[Integer, (Array[Long], Array[Int])]()
    rows.foreach { n =>
      val ds = SegNorms.docsOf(n)
      val ls = Array.tabulate(n.n)(i => VByte.unpackIntAt(n.doclens, i))
      norms.put(n.seg, (ds, ls))
    }
    norms
  }

  /** Open ONE shard of a document-sharded cluster, materializing ONLY that
    * shard's blocks and norms (`seg mod nShards == shardId`, pushed into
    * the scan as a filter) plus the small global term stats — what a real
    * shard server does at open: its node's heap holds 1/nShards of the
    * postings, never the whole index. `openSharded` is this in miniature
    * with all shards in one JVM (it collects everything once because the
    * router and shards share the process); this entry point is the
    * per-node deployment form. Bit-identical: segments score locally with
    * global stats in every layout.
    */
  def openShard(idx: OpenIndex, shardId: Int, nShards: Int, maxBytes: Long): ServingIndex = {
    require(nShards >= 1 && shardId >= 0 && shardId < nShards,
      s"shardId $shardId out of range for $nShards shards")
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val sBlocks = idx.postings.filter(pmod(col("seg"), lit(nShards)) === shardId).collect()
    val sNorms = normsMapOf(idx.norms.filter(pmod(col("seg"), lit(nShards)) === shardId).collect())
    assemble(sBlocks, sNorms, collectDf(idx), idx.stats, maxBytes)
  }

  /** Assemble a router over shards opened individually (e.g. via
    * `openShard` or `ServingLayout.openExportedShard`). The shards must
    * partition the segments (each seg on exactly one shard) and share the
    * global stats — both true by construction for the open paths here.
    */
  def clusterOf(shards: IndexedSeq[ServingIndex]): ServingCluster =
    new ServingCluster(shards, null)

  private def collectDf(idx: OpenIndex): java.util.HashMap[String, Long] = {
    val df = new java.util.HashMap[String, Long]()
    idx.terms.collect().foreach(t => df.put(t.term, t.df))
    df
  }

  private def collectDocs(idx: OpenIndex): Array[DocMeta] = {
    import org.apache.spark.sql.functions.col
    val spark = idx.docs.sparkSession
    import spark.implicits._
    idx.docs
      .select(col("doc_id"), col("url"), col("doclen").cast("int").as("doclen"), col("lang"))
      .as[DocMeta].collect()
  }

  /** Document-sharded serving cluster: `nShards` shard servers, each
    * holding the segments assigned to it (`seg mod nShards` — segments
    * are the unit of document sharding in every layout), all scoring
    * with the GLOBAL term stats, plus a router that k-merges per-shard
    * top-ks with the same (score desc, docId asc) order the distributed
    * TakeOrdered merge uses. Bit-identical to the single-node serving
    * index and the distributed WAND: segments are scored locally either
    * way — only WHERE they live changes. This is the web-scale
    * deployment shape in miniature (shards on separate nodes, the
    * router merging over RPC); `maxBytesPerShard` is each node's budget.
    */
  def openSharded(idx: OpenIndex, nShards: Int, maxBytesPerShard: Long,
      withDocs: Boolean = false): ServingCluster = {
    require(nShards >= 1, "need at least one shard")
    val blocks = idx.postings.collect()
    val norms = collectNorms(idx)
    val df = collectDf(idx)
    val stats = idx.stats
    val shards = (0 until nShards).map { s =>
      val sBlocks = blocks.filter(b => math.floorMod(b.seg, nShards) == s)
      val sNorms = new java.util.HashMap[Integer, (Array[Long], Array[Int])]()
      norms.forEach { (seg, v) =>
        if (math.floorMod(seg, nShards) == s) sNorms.put(seg, v)
      }
      assemble(sBlocks, sNorms, df, stats, maxBytesPerShard)
    }
    // hit materialization is the router's fetch phase (like the
    // reference's _source lookup after the query phase)
    val docs = if (withDocs) {
      val m = new java.util.HashMap[Long, DocMeta]()
      collectDocs(idx).foreach(d => m.put(d.doc_id, d))
      m
    } else null
    new ServingCluster(shards.toIndexedSeq, docs)
  }
}

/** Router over document-sharded `ServingIndex` shards: fans the query
  * out, k-merges the shard top-ks. Shard top-ks are disjoint (documents
  * live on exactly one shard), so the merge is the same TopKHeap the
  * single-node path uses per segment.
  */
final class ServingCluster private[query] (
    val shards: IndexedSeq[ServingIndex],
    docStore: java.util.HashMap[Long, DocMeta]) {

  /** Total decoded/retained footprint, counting each cache ONCE — the
    * layered `ServingNode`'s shards share one bounded decode cache (or
    * one hot-phrase positions cache), and summing per-shard loadedBytes
    * would multi-count it nShards times. Independent shards (openSharded,
    * exported opens) have distinct caches, so the dedup is a no-op there.
    */
  def loadedBytes: Long = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    var total = 0L
    shards.foreach { s =>
      total += s.retainedPositionBytes
      val c = s.blockCacheRef
      if (seen.add(c)) total += c.loadedBytes
      s.posCacheRef.foreach(pc => if (seen.add(pc)) total += pc.loadedBytes)
    }
    total
  }

  /** Corpus-wide stats — every shard carries the same GLOBAL IndexStats
    * by construction (local scoring with global stats is what makes the
    * sharded layouts bit-identical).
    */
  def stats: IndexStats = shards.head.stats

  def topK(query: String, k: Int): Array[(Long, Double)] = {
    val heap = new TopKHeap(k)
    shards.foreach(_.topK(query, k).foreach { case (d, s) => heap.offer(d, s) })
    heap.result().sortBy(t => (-t._2, t._1))
  }

  /** Phrase top-k across shards: gather unscored matches, resolve the
    * GLOBAL phrase df at the router, then score — the
    * dfs_query_then_fetch shape. Bit-identical to the single-node and
    * distributed phrase paths (stats are global in every layout).
    */
  def phraseTopK(phrase: String, k: Int): Array[(Long, Double)] = {
    val matches = shards.iterator.flatMap(_.phraseMatches(phrase)).toArray
    Serving.scorePhraseMatches(matches, shards.head.stats, k)
  }

  /** Fetch phase: the router materializes stored fields either from its
    * own doc store (in-process form) or by asking the shard that holds
    * the document (per-shard doc stores — the deployment form, where
    * `_source` lives next to the postings it scores). Documents live on
    * exactly one shard, so the first shard that knows the id answers.
    */
  def topKHits(query: String, k: Int): Array[Serving.Hit] = {
    val shardDocs = docStore == null && shards.forall(_.hasDocs)
    require(docStore != null || shardDocs,
      "cluster opened without docs; use withDocs = true")
    topK(query, k).map { case (id, score) =>
      val d =
        if (docStore != null) docStore.get(id)
        else shards.iterator.map(_.docOf(id)).collectFirst { case m if m != null => m }.orNull
      require(d != null, s"docId $id missing from the doc store")
      Serving.Hit(id, d.url, d.lang, d.doclen, score)
    }
  }
}
