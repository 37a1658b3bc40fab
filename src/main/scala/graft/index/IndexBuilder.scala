package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.{functions => ga}

/** Inverted-index builder (the Spark-native analogue of the reference's
  * `/_bulk` ingestion path, reference file_processor.py:415-471, whose
  * tokenize/postings work Lucene performed server-side — here implemented
  * natively, SURVEY.md §2 A5/A6).
  *
  * Plan shape (one slice) — exactly ONE wide shuffle:
  * {{{
  *   scan(docs)                        -- column pruning drops html etc.
  *     -> per-doc tf flatMap           -- tokenize + per-doc hash count:
  *                                        tf(term,doc) is per-ROW work, a
  *                                        doc's tokens never cross rows,
  *                                        so no (term,docId) shuffle exists
  *     -> groupByKey((term, seg))      [the one shuffle: bounded groups]
  *     -> encode blocks -> write postings
  *   terms(df, cf)  <- postings parquet (columnar agg of n/tfSum — no
  *                     second pass over raw text)
  *   docs/norms     <- token_count scan (doclen only, no token arrays)
  * }}}
  * Earlier shape ran tf as a global groupBy(term, docId): a ~28M-entry
  * hash aggregate that was memory-bound and stopped scaling past 8 cores;
  * the per-doc map (≤ a few hundred entries, cache-resident) scales
  * linearly and feeds the shuffle 2× less data.
  *
  * Skew: head terms (df ≈ N/2 in web text) would make `groupBy(term)`
  * explode; the seg dimension (seg = docId / segSize) is a deterministic
  * salt that bounds every (term, seg) group at segSize postings, and the
  * per-term partials (df, cf) merge additively — exactly Spark's
  * partial+final aggregation model.
  *
  * Resume: the corpus is processed in docID slices; each slice commits its
  * files plus a manifest entry (lineage + row/byte metrics) atomically.
  * Restart skips committed slices (reference resume-ledger semantics,
  * bulkupdate.py:258-260).
  */
object IndexBuilder {

  case class Config(
      segSize: Int = 1 << 16,
      blockSize: Int = 128,
      slices: Int = 1,
      codec: String = "pfor", // "pfor" (PForDelta, default) or "vbyte"
      positions: Boolean = false) // index token positions (phrase queries);
                                  // ~doclen extra ints/doc through the one
                                  // shuffle — Lucene's IndexOptions trade

  case class BuildReport(
      slicesBuilt: Int,
      slicesSkipped: Int,
      docs: Long,
      postings: Long,
      elapsedMs: Long)

  private val verbose = sys.env.contains("GRAFT_BUILD_VERBOSE")
  private def phase[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    if (verbose)
      println(f"[build] $label ${(System.nanoTime() - t0) / 1e9}%.1fs")
    r
  }

  /** Build an index over `docs(doc_id, url, text, lang)` into `store`.
    * `fresh=true` drops any existing index first; otherwise committed
    * slices are skipped (resume).
    */
  def build(
      spark: SparkSession,
      docs: DataFrame,
      store: IndexStore,
      cfg: Config = Config(),
      fresh: Boolean = true,
      failAfterSlice: Int = Int.MaxValue,
      manifestProps: Map[String, String] = Map.empty,
      earlyProps: Map[String, String] = Map.empty): BuildReport = {
    import spark.implicits._
    val t0 = System.nanoTime()
    if (fresh) store.dropAll()
    val done = store.committedSlices.map(_.sliceId).toSet
    // Resume guard: committed slices were encoded under the RECORDED
    // recipe — resuming with a different one would silently write
    // geometry that mismatches them (segment numbers in new units against
    // segHi values in old units), so the supplied cfg must equal the
    // stored recipe exactly.
    if (done.nonEmpty && store.settings.contains("build.segSize")) {
      val rec = recordedConfig(store)
      // a store written before build.slices was recorded can't compare
      // that field directly — the caller's value is accepted HERE, and the
      // per-slice boundary check below (computed vs recorded segLo/segHi)
      // rejects any slices value that doesn't reproduce the committed
      // layout, so the relaxation can never silently skip or overlap
      val recAdj =
        if (store.settings.contains("build.slices")) rec
        else rec.copy(slices = cfg.slices)
      require(cfg == recAdj,
        s"resume with a different build config: supplied $cfg but the committed " +
          s"slices at ${store.root} were built with $recAdj — pass the recorded config " +
          "(or rebuild fresh)")
    }
    val base = normalize(docs)
    // one stats pass: docID bounds + count (token_count no longer needed
    // here — impact metadata is stats-independent, so the build never
    // bakes in avgdl)
    val bounds = phase("stats")(base.agg(
      min("doc_id"), max("doc_id"), count("*")).head())
    val (minId, maxId, nDocs) = (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))

    val segSize = cfg.segSize.toLong
    val segLoAll = (minId / segSize).toInt
    val segHiAll = (maxId / segSize).toInt
    val totalSegs = segHiAll - segLoAll + 1
    val nSlices = math.min(cfg.slices, totalSegs)
    val segsPerSlice = math.ceil(totalSegs.toDouble / nSlices).toInt

    // resume consistency: every already-committed slice's recorded segment
    // range must equal what THIS run's geometry assigns to its id — a
    // cfg.slices (or corpus bounds) mismatch would otherwise re-slice the
    // docID space so the remaining slices overlap or skip the committed
    // ones, double- or under-indexing documents
    // (slices with ids beyond this build's range are later live appends —
    // they have their own geometry and are not part of the resume layout)
    store.committedSlices
      .filter(s => done.contains(s.sliceId) && s.sliceId < nSlices)
      .foreach { s =>
      val expLo = segLoAll + s.sliceId * segsPerSlice
      val expHi = math.min(segLoAll + (s.sliceId + 1) * segsPerSlice - 1, segHiAll)
      require(s.segLo == expLo && s.segHi == expHi,
        s"resume layout mismatch at ${store.root}: committed slice ${s.sliceId} covers " +
          s"segs [${s.segLo}, ${s.segHi}] but the supplied config/corpus re-derives " +
          s"[$expLo, $expHi] — resume with the original config over the original corpus, " +
          "or rebuild fresh")
    }

    // the build recipe rides the store's settings so `append` can derive
    // it (segment geometry and codec must match across slices) — recorded
    // only AFTER the resume guards above accepted this cfg, so a refused
    // resume can never overwrite the recipe the committed slices used
    store.setSettings(Map(
      "build.segSize" -> cfg.segSize.toString,
      "build.blockSize" -> cfg.blockSize.toString,
      "build.codec" -> cfg.codec,
      "build.positions" -> cfg.positions.toString,
      "build.slices" -> cfg.slices.toString))

    var built = 0
    var skipped = 0
    var totalPostings = 0L
    var sliceId = 0
    var propsWritten = manifestProps.isEmpty
    while (sliceId < nSlices) {
      if (done.contains(sliceId)) { skipped += 1 }
      else {
        val segLo = segLoAll + sliceId * segsPerSlice
        val segHi = math.min(segLoAll + (sliceId + 1) * segsPerSlice - 1, segHiAll)
        val lo = segLo * segSize
        val hi = (segHi + 1) * segSize // exclusive
        // docID-range predicate pushes down into the source scan
        val slice = base.filter(col("doc_id") >= lo && col("doc_id") < hi)
        val m = buildSlice(spark, slice, store, cfg, sliceId, segLo, segHi)
        // caller props (e.g. the streaming replay guard) may only commit
        // once the WHOLE build is durable — they ride the FINAL slice's
        // atomic manifest rename, so a crash mid-build leaves them unset
        // and the batch is rebuilt, never half-indexed-but-guarded.
        // `earlyProps` (e.g. the streaming bootstrap-in-progress marker)
        // ride EVERY commit, so a crashed multi-slice build is
        // recognizable as in-progress from its very first slice.
        val last = sliceId == nSlices - 1
        store.commitSlice(m, if (last) earlyProps ++ manifestProps else earlyProps)
        if (last) propsWritten = true
        totalPostings += m.postings
        built += 1
        if (built >= failAfterSlice)
          throw new RuntimeException(s"injected failure after slice $sliceId")
      }
      sliceId += 1
    }
    // final slice was already committed by a previous (crashed) run: the
    // index is complete, record the props now (slice data already durable,
    // so this second rename has no correctness window)
    if (!propsWritten) store.setManifestProps(manifestProps)
    BuildReport(built, skipped, nDocs, totalPostings, (System.nanoTime() - t0) / 1000000)
  }

  /** Pass 1 projection: doc metadata columns (token_count is a codegen
    * Expression — no array materialization for the doclen pass).
    */
  private def normalize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      col("url").cast("string").as("url"),
      col("text"),
      col("lang").cast("string").as("lang"))

  /** Append NEW documents to a committed index as one fresh slice — the
    * live-index form of the reference's recurring bulkupdate runs (an
    * index at 10^12 docs is never rebuilt for a crawl increment). The
    * build recipe (segment geometry, codec, positions) is read back from
    * the store's settings, and the new docIDs must begin in a segment
    * BEYOND every committed slice's range: segments are the unit of
    * document sharding and live in exactly one slice (norms and blocks
    * assume it). Soundness under drifting corpus stats comes from the
    * impact metadata — (maxTf, minDl) per block bounds scores under
    * whatever avgdl the query computes, so earlier slices never need
    * rewriting. Term df/cf partials merge additively on read; query-time
    * stats recompute from the docs table.
    */
  def append(
      spark: SparkSession,
      newDocs: DataFrame,
      store: IndexStore,
      manifestProps: Map[String, String] = Map.empty): SliceMeta = {
    require(store.exists && store.settings.contains("build.segSize"),
      s"append requires an index built by IndexBuilder.build at ${store.root}")
    val cfg = recordedConfig(store)
    val committed = store.committedSlices
    require(committed.nonEmpty, s"nothing committed at ${store.root}")
    val segSize = cfg.segSize.toLong

    val base = normalize(newDocs)
    val bounds = phase("append-stats")(base.agg(
      min("doc_id"), max("doc_id"), count("*")).head())
    require(bounds.getLong(2) > 0, "append of an empty batch")
    val (minId, maxId) = (bounds.getLong(0), bounds.getLong(1))
    val segLo = (minId / segSize).toInt
    val segHi = (maxId / segSize).toInt
    val maxCommitted = committed.map(_.segHi).max
    require(segLo > maxCommitted,
      s"appended docIDs must start in a fresh segment: min docID $minId lands in seg " +
        s"$segLo but the committed index ends at seg $maxCommitted — first appendable " +
        s"docID is ${nextAppendDocId(store)}")
    val sliceId = committed.map(_.sliceId).max + 1
    val m = buildSlice(spark, base, store, cfg, sliceId, segLo, segHi)
    // manifestProps commit in the SAME atomic rename as the slice — the
    // streaming replay guard rides here so no crash can separate them
    store.commitSlice(m, manifestProps)
    m
  }

  /** The build recipe recorded in the store's settings — the single source
    * of truth for segment geometry and codec once any slice is committed.
    */
  def recordedConfig(store: IndexStore): Config = {
    val s = store.settings
    Config(
      segSize = s("build.segSize").toInt,
      blockSize = s("build.blockSize").toInt,
      slices = s.getOrElse("build.slices", "1").toInt,
      codec = s("build.codec"),
      positions = s("build.positions").toBoolean)
  }

  /** First docID a live append may use (the next fresh segment boundary) —
    * what a deterministic docID allocator should hand the next increment.
    */
  def nextAppendDocId(store: IndexStore): Long = {
    val s = store.settings
    require(s.contains("build.segSize") && store.committedSlices.nonEmpty,
      s"no appendable index at ${store.root} — build with IndexBuilder.build first")
    (store.committedSlices.map(_.segHi).max + 1L) * s("build.segSize").toLong
  }

  private def buildSlice(
      spark: SparkSession,
      slice: DataFrame,
      store: IndexStore,
      cfg: Config,
      sliceId: Int,
      segLo: Int,
      segHi: Int): SliceMeta = {
    import spark.implicits._
    val segSize = cfg.segSize.toLong
    val blockSize = cfg.blockSize
    val codec = Codecs.of(cfg.codec)

    // per-doc term frequencies (and, when cfg.positions, the term's token
    // indexes): pure per-row work (a doc's tokens never cross rows),
    // emitted directly — no (term, docId) shuffle exists.
    val withPositions = cfg.positions
    val tfRows = slice
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { iter =>
        iter.flatMap { case (docId, text) =>
          val toks = graft.analysis.Analyzer.tokenize(text)
          val m = new java.util.HashMap[String, Int](toks.length * 2)
          val posM = if (withPositions)
            new java.util.HashMap[String, scala.collection.mutable.ArrayBuilder.ofInt](toks.length * 2)
          else null
          var i = 0
          while (i < toks.length) {
            val prev = m.getOrDefault(toks(i), 0)
            m.put(toks(i), prev + 1)
            if (withPositions) {
              var b = posM.get(toks(i))
              if (b == null) { b = new scala.collection.mutable.ArrayBuilder.ofInt; posM.put(toks(i), b) }
              b += i
            }
            i += 1
          }
          val seg = (docId / segSize).toInt
          val dl = toks.length
          val out = new Array[(String, Long, Int, Int, Int, Array[Int])](m.size())
          val it = m.entrySet().iterator()
          var j = 0
          while (it.hasNext) {
            val e = it.next()
            val ps = if (withPositions) posM.get(e.getKey).result() else null
            out(j) = (e.getKey, docId, e.getValue, dl, seg, ps)
            j += 1
          }
          out
        }
      }

    // blocks per (term, seg): THE one shuffle. Hash-repartition colocates a
    // (term, seg) group; the Tungsten sort orders runs by (term, seg, doc)
    // so block building is a streaming pass — no per-group hashmap, no
    // MapGroupsExec buffering (measured ~2× over groupByKey+flatMapGroups).
    val blocks = tfRows
      .toDF("term", "doc_id", "tf", "doclen", "seg", "pos")
      .repartition(col("term"), col("seg"))
      .sortWithinPartitions(col("term"), col("seg"), col("doc_id"))
      .as[(String, Long, Int, Int, Int, Array[Int])]
      .mapPartitions { it =>
        new Iterator[PostingBlock] {
          private var curTerm: String = null
          private var curSeg = Int.MinValue
          private var blk = 0
          private val ds = new Array[Long](blockSize)
          private val fs = new Array[Long](blockSize)
          private val dls = new Array[Int](blockSize)
          private val pss = new Array[Array[Int]](blockSize)
          private var n = 0
          private var pending: PostingBlock = null
          private var done = false

          private def emit(): PostingBlock = {
            // impact metadata: (maxTf, minDl) instead of a baked-in
            // tfNorm, so block-max bounds stay sound under the stats the
            // QUERY sees — required for live appends shifting avgdl
            var maxTf = 0L
            var minDl = Int.MaxValue
            var tfSum = 0L
            var i = 0
            while (i < n) {
              if (fs(i) > maxTf) maxTf = fs(i)
              if (dls(i) < minDl) minDl = dls(i)
              tfSum += fs(i)
              i += 1
            }
            val docsArr = java.util.Arrays.copyOf(ds, n)
            // positional payload: per-doc ascending token indexes as gap
            // lists, concatenated in docID order (tf gives the splits)
            val posBytes =
              if (!withPositions) null
              else {
                val gaps = new Array[Long](tfSum.toInt)
                var g = 0
                i = 0
                while (i < n) {
                  val ps = pss(i)
                  var prev = 0
                  var j = 0
                  while (j < ps.length) { gaps(g) = (ps(j) - prev).toLong; prev = ps(j); g += 1; j += 1 }
                  i += 1
                }
                // always VByte: the stream length is Σtf (unbounded per
                // block — PFor's 255-value cap doesn't fit), and position
                // gaps are small ints where VByte is already ~1 byte each
                VByte.encode(gaps)
              }
            val b = PostingBlock(curTerm, curSeg, blk, n, docsArr(0), docsArr(n - 1),
              maxTf, minDl, tfSum, codec,
              Codecs.encode(codec, VByte.deltasFrom(docsArr(0), docsArr)),
              Codecs.encode(codec, java.util.Arrays.copyOf(fs, n)),
              posBytes)
            blk += 1
            n = 0
            b
          }

          private def advance(): Unit = {
            while (pending == null && !done) {
              if (it.hasNext) {
                val (term, d, f, dl, seg, ps) = it.next()
                if (term != curTerm || seg != curSeg) {
                  if (n > 0) pending = emit()
                  curTerm = term; curSeg = seg; blk = 0
                } else if (n == blockSize) {
                  pending = emit()
                }
                ds(n) = d; fs(n) = f; dls(n) = dl; pss(n) = ps; n += 1
              } else {
                done = true
                if (n > 0) pending = emit()
              }
            }
          }

          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): PostingBlock = {
            advance()
            val b = pending; pending = null; b
          }
        }
      }

    // blocks leave the sort-stream already term-sorted within each hash
    // partition, so per-file row-group min/max stats prune term lookups.
    // No repartitionByRange here: range partitioning SAMPLES its input,
    // which would re-execute the whole tokenize pipeline a second time.
    // The globally term-sorted layout is compaction's job (IndexStore
    // .compact, the forcemerge analogue).
    val postingsPath = store.slicePath("postings", sliceId)
    // Observation rides the write job: block/posting counts with no extra pass
    val pObs = org.apache.spark.sql.Observation()
    phase("postings")(blocks.toDF()
      .observe(pObs, sum("n").as("postings"), count(lit(1)).as("blocks"))
      .write.mode("overwrite").parquet(postingsPath))

    // per-term partials from the written postings (columnar agg over
    // n/tfSum — never re-tokenizes the corpus)
    phase("terms")(spark.read.parquet(postingsPath)
      .groupBy("term")
      .agg(sum("n").as("df"), sum("tfSum").as("cf"))
      .write.mode("overwrite").parquet(store.slicePath("terms", sliceId)))

    // doc metadata: doclen via the counting kernel (no token arrays)
    val docMeta = slice.select(col("doc_id"), col("url"),
      ga.token_count(col("text")).as("doclen"), col("lang"))
    // source order is already docID-clustered per input split; avoid a
    // range shuffle (sampling would re-run the scan) and write directly
    val dObs = org.apache.spark.sql.Observation()
    phase("docs")(docMeta
      .observe(dObs, count(lit(1)).as("docs"))
      .write.mode("overwrite").parquet(store.slicePath("docs", sliceId)))

    // norms from the written docs table (columnar scan, not raw text)
    phase("norms")(spark.read.parquet(store.slicePath("docs", sliceId))
      .select(col("doc_id"), col("doclen"), (col("doc_id") / segSize).cast("int").as("seg"))
      .as[(Long, Int, Int)]
      .groupByKey(_._3)
      .mapGroups { (seg: Int, rows: Iterator[(Long, Int, Int)]) =>
        val entries = rows.map { case (d, dl, _) => (d, dl) }.toArray
        java.util.Arrays.sort(entries, Ordering.by((e: (Long, Int)) => e._1))
        val ds = entries.map(_._1)
        SegNorms(seg, entries.length, ds(0),
          VByte.encode(VByte.deltasFrom(ds(0), ds)),
          VByte.packInts(entries.map(_._2)))
      }
      .write.mode("overwrite").parquet(store.slicePath("norms", sliceId)))

    // slice metrics for the manifest (lineage + row/byte counts) come from
    // the Observations attached to the writes — zero extra Spark jobs
    val nDocs = dObs.get("docs").asInstanceOf[Long]
    val pMetrics = pObs.get
    val nPostings = Option(pMetrics("postings")).map(_.asInstanceOf[Long]).getOrElse(0L)
    val nBlocks = pMetrics("blocks").asInstanceOf[Long]
    val bytes = dirBytes(postingsPath)
    SliceMeta(sliceId, segLo, segHi, nDocs, nPostings, nBlocks, bytes,
      System.currentTimeMillis())
  }

  private def dirBytes(path: String): Long = {
    val f = new java.io.File(path)
    if (!f.exists()) 0L
    else {
      def walk(x: java.io.File): Long =
        if (x.isFile) x.length()
        else Option(x.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(f)
    }
  }
}
