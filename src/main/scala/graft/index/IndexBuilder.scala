package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.{functions => ga}

/** Inverted-index builder (the Spark-native analogue of the reference's
  * `/_bulk` ingestion path, reference file_processor.py:415-471, whose
  * tokenize/postings work Lucene performed server-side — here implemented
  * natively, SURVEY.md §2 A5/A6).
  *
  * Plan shape (one slice):
  * {{{
  *   scan(docs)                          -- column pruning drops html etc.
  *     -> tokenize Expression (codegen) -> posexplode
  *     -> groupBy(term, docId)   agg count            [shuffle 1: partial agg]
  *     -> groupByKey((term, seg)) blocks              [shuffle 2: bounded groups]
  *     -> write postings/norms/docs/terms + manifest commit
  * }}}
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
      slices: Int = 1)

  case class BuildReport(
      slicesBuilt: Int,
      slicesSkipped: Int,
      docs: Long,
      postings: Long,
      elapsedMs: Long)

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
      failAfterSlice: Int = Int.MaxValue): BuildReport = {
    import spark.implicits._
    val t0 = System.nanoTime()
    if (fresh) store.dropAll()
    val done = store.committedSlices.map(_.sliceId).toSet

    // Pass 1: doc metadata (docId, doclen). token_count is a codegen
    // Expression — no array materialization for the doclen pass.
    val base = docs
      .select(
        col("doc_id").cast("long").as("doc_id"),
        col("url").cast("string").as("url"),
        col("text"),
        col("lang").cast("string").as("lang"))
    val bounds = base.agg(min("doc_id"), max("doc_id"), count("*")).head()
    val (minId, maxId, nDocs) = (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
    val avgdl = base.select(avg(ga.token_count(col("text")))).head().getDouble(0)

    val segSize = cfg.segSize.toLong
    val segLoAll = (minId / segSize).toInt
    val segHiAll = (maxId / segSize).toInt
    val totalSegs = segHiAll - segLoAll + 1
    val nSlices = math.min(cfg.slices, totalSegs)
    val segsPerSlice = math.ceil(totalSegs.toDouble / nSlices).toInt

    var built = 0
    var skipped = 0
    var totalPostings = 0L
    var sliceId = 0
    while (sliceId < nSlices) {
      if (done.contains(sliceId)) { skipped += 1 }
      else {
        val segLo = segLoAll + sliceId * segsPerSlice
        val segHi = math.min(segLoAll + (sliceId + 1) * segsPerSlice - 1, segHiAll)
        val lo = segLo * segSize
        val hi = (segHi + 1) * segSize // exclusive
        // docID-range predicate pushes down into the source scan
        val slice = base.filter(col("doc_id") >= lo && col("doc_id") < hi)
        val m = buildSlice(spark, slice, store, cfg, sliceId, segLo, segHi, avgdl)
        store.commitSlice(m)
        totalPostings += m.postings
        built += 1
        if (built >= failAfterSlice)
          throw new RuntimeException(s"injected failure after slice $sliceId")
      }
      sliceId += 1
    }
    BuildReport(built, skipped, nDocs, totalPostings, (System.nanoTime() - t0) / 1000000)
  }

  private def buildSlice(
      spark: SparkSession,
      slice: DataFrame,
      store: IndexStore,
      cfg: Config,
      sliceId: Int,
      segLo: Int,
      segHi: Int,
      avgdl: Double): SliceMeta = {
    import spark.implicits._
    val segSize = cfg.segSize.toLong
    val blockSize = cfg.blockSize

    val withToks = slice.withColumn("toks", ga.tokenize(col("text")))
    val docMeta = withToks
      .select(col("doc_id"), col("url"), size(col("toks")).as("doclen"), col("lang"))

    // tf per (term, doc): shuffle 1 — Spark's partial aggregation combines
    // map-side so the shuffle carries (term, doc) pairs, not raw tokens.
    val tf = withToks
      .select(col("doc_id"), size(col("toks")).as("doclen"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("doclen"))
      .agg(count(lit(1)).as("tf"))

    // blocks per (term, seg): shuffle 2 — bounded groups (≤ segSize docs).
    val blocks = tf
      .select(col("term"), col("doc_id"), col("doclen"), col("tf"),
        (col("doc_id") / segSize).cast("int").as("seg"))
      .as[(String, Long, Int, Long, Int)]
      .groupByKey(r => (r._1, r._5))
      .flatMapGroups { (key: (String, Int), rows: Iterator[(String, Long, Int, Long, Int)]) =>
        val (term, seg) = key
        val entries = rows.map { case (_, d, dl, f, _) => (d, f, dl) }.toArray
        java.util.Arrays.sort(entries, Ordering.by((e: (Long, Long, Int)) => e._1))
        entries.grouped(blockSize).zipWithIndex.map { case (chunk, blk) =>
          val ds = chunk.map(_._1)
          val fs = chunk.map(_._2)
          var maxNorm = 0.0
          var i = 0
          while (i < chunk.length) {
            val n = BM25.tfNorm(chunk(i)._2, chunk(i)._3.toLong, avgdl)
            if (n > maxNorm) maxNorm = n
            i += 1
          }
          PostingBlock(term, seg, blk, chunk.length, ds(0), ds(chunk.length - 1),
            maxNorm, VByte.encode(VByte.deltasFrom(ds(0), ds)), VByte.encode(fs))
        }
      }

    val postingsPath = store.slicePath("postings", sliceId)
    blocks
      .repartitionByRange(col("term"), col("seg"))
      .sortWithinPartitions(col("term"), col("seg"), col("blk"))
      .write.mode("overwrite").parquet(postingsPath)

    // per-term partials for this slice (df/cf merge additively on read)
    tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      .write.mode("overwrite").parquet(store.slicePath("terms", sliceId))

    // norms: per-seg sorted docIDs + doclens
    docMeta
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
      .write.mode("overwrite").parquet(store.slicePath("norms", sliceId))

    docMeta
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(store.slicePath("docs", sliceId))

    // slice metrics for the manifest (lineage + row/byte counts)
    val nDocs = spark.read.parquet(store.slicePath("docs", sliceId)).count()
    val blockAgg = spark.read.parquet(postingsPath)
      .agg(coalesce(sum("n"), lit(0L)), count(lit(1))).head()
    val nPostings = blockAgg.getLong(0)
    val nBlocks = blockAgg.getLong(1)
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
