package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]). Two paths:
  *  - brute-force cosine top-k: the correctness baseline. All arithmetic
  *    in double precision via `zip_with`/`aggregate` (codegen-friendly
  *    higher-order functions, no UDF).
  *  - LSH-bucketed (random hyperplanes): the scale path. Each vector maps
  *    to a deterministic sign-bit bucket; queries probe only their bucket
  *    (optionally with multi-probe), turning the O(N·Q) scan into a
  *    bucket-local join.
  */
object Ann {

  /** Cosine similarity of two array<double> columns, computed in a fixed
    * sequential fold order (index ascending) for cross-engine parity.
    * Uses the codegen'd DotProduct expression (graft.analysis).
    */
  def cosine(a: Column, b: Column): Column =
    graft.analysis.functions.dot(a, b) /
      (sqrt(graft.analysis.functions.dot(a, a)) * sqrt(graft.analysis.functions.dot(b, b)))

  /** Cosine with the norms precomputed per row (hoisted out of pair
    * joins: dot(v,v) per vector once, not per pair — same arithmetic,
    * same bits, ~3× less work on dense pair scans).
    */
  private def cosineHoisted(a: Column, normA: Column, b: Column, normB: Column): Column =
    graft.analysis.functions.dot(a, b) / (normA * normB)

  private def withNorm(df: DataFrame, idCol: String, idAs: String, vecAs: String): DataFrame =
    df.select(col(idCol).cast("long").as(idAs),
      col("__vec").as(vecAs), col("__norm").as(vecAs + "_norm"))

  /** size() that treats a null array as null even under legacy
    * sizeOfNull (-1) — for first-non-null dimension probes, where a -1
    * from a null row would otherwise decide partition-order-dependently.
    */
  private def nonNegSize(c: Column): Column =
    when(size(c) >= 0, size(c))

  private def prep(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__vec"))
      .withColumn("__norm", sqrt(graft.analysis.functions.dot(col("__vec"), col("__vec"))))

  /** Brute-force exact top-k neighbors for each query vector.
    * `queries` is expected to be small (it is broadcast); the big side
    * streams once with no shuffle until the final per-query top-k, which
    * Spark plans as partial top-k + merge via window rank.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = withNorm(prep(corpus, idCol, vecCol), idCol, "nbr_id", "v_c")
    val q = withNorm(prep(queries, idCol, vecCol), idCol, "query_id", "v_q")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineHoisted(col("v_q"), col("v_q_norm"), col("v_c"), col("v_c_norm")))
      .select("query_id", "nbr_id", "cosine")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cosine", "rank")
  }

  /** Deterministic random hyperplanes: nPlanes vectors of dim entries in
    * [-1, 1), derived from splitmix64(seed, plane, coord).
    */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { d =>
        val h = Hash64.splitmix64(seed + p.toLong * 131071L + d)
        (h >>> 11) * 1.1102230246251565e-16 * 2.0 - 1.0
      }
    }

  /** Sign-bit LSH bucket id of a vector under the given hyperplanes. */
  def signBucket(vec: Array[Double], planes: Array[Array[Double]]): Long = {
    var key = 0L
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      val pl = planes(p)
      var i = 0
      val n = math.min(vec.length, pl.length)
      while (i < n) { dot += vec(i) * pl(i); i += 1 }
      if (dot >= 0) key |= (1L << p)
      p += 1
    }
    key
  }

  /** Multi-table, multi-probe LSH ANN. The corpus stores one sign-bit
    * bucket key per table (`nTables` × corpus rows — the classic LSH index
    * size trade); each query probes, per table, every bucket within
    * Hamming distance `probeBits` of its own signature (query-side
    * multi-probe: the candidate fan-out rides the tiny broadcast side, the
    * corpus is never re-keyed). Candidates are ranked by exact cosine, so
    * precision within the candidate set is exact; recall at the defaults
    * is ≈ 1 - (1 - P(H ≤ probeBits))^nTables ≳ 0.95 for true top-10
    * neighbors of this corpus (pinned in OpsSpec).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 8, seed: Long = 42L,
      nTables: Int = 8, probeBits: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nPlanes >= 1 && nPlanes <= 28, "nPlanes must be in [1, 28]")
    require(probeBits >= 0 && probeBits <= 2, "probeBits 0..2 supported")
    import org.apache.spark.sql.expressions.Window

    // first NON-NEGATIVE size: a null-embedding row landing first must
    // not decide the hyperplane dimension partition-order-dependently —
    // size(null) is null by default and -1 under legacy sizeOfNull, so
    // both are excluded by the when() before the first()
    val dimRow = corpus.agg(first(nonNegSize(col(vecCol)), ignoreNulls = true)).head()
    val dim = if (dimRow.isNullAt(0)) 0 else dimRow.getInt(0)
    val tables = Array.tabulate(nTables)(t => hyperplanes(dim, nPlanes, seed + 7919L * t))

    // bucket keys via the codegen'd LshBucketKeys expression — the corpus
    // side runs it over every row at scale, so no ScalaUDF hop; the query
    // side multi-probes (probeBits) on the tiny broadcast frame
    val c = withNorm(prep(corpus, idCol, vecCol), idCol, "nbr_id", "v_c")
      .withColumn("key", explode(annFunctions.lshKeys(col("v_c"), tables, 0)))
    val q = withNorm(prep(queries, idCol, vecCol), idCol, "query_id", "v_q")
      .withColumn("key", explode(annFunctions.lshKeys(col("v_q"), tables, probeBits)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    c.join(broadcast(q), "key")
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineHoisted(col("v_q"), col("v_q_norm"), col("v_c"), col("v_c_norm")))
      .select("query_id", "nbr_id", "cosine")
      .distinct() // a pair can collide in several (table, probe) buckets
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cosine", "rank")
  }

  /** Deterministic k-means coarse quantizer for IVF: trains on a bounded
    * sample (first `trainCap` by id — deterministic), L2-normalized so
    * euclidean cells align with cosine similarity. Returns centroids.
    */
  def trainIvfCentroids(df: DataFrame, nCells: Int, iters: Int = 8,
      seed: Long = 42L, trainCap: Int = 10000,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    // null embeddings carry no training signal and would NPE the collect
    val sample = df.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(trainCap)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty training sample")
    def normalize(v: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
      v.map(_ * inv)
    }
    val data = sample.map(normalize)
    val k = math.min(nCells, data.length)
    // seeded distinct-index init
    var centroids = {
      val picked = scala.collection.mutable.LinkedHashSet.empty[Int]
      var s = seed
      while (picked.size < k) {
        s = Hash64.splitmix64(s)
        picked += math.floorMod(s, data.length.toLong).toInt
      }
      picked.toArray.map(i => data(i).clone())
    }
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        while (i < v.length) { val x = v(i) - cs(c)(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    var it = 0
    val nThreads = math.max(1, math.min(Runtime.getRuntime.availableProcessors(), 16))
    while (it < iters) {
      // assignment phase (the trainCap × k × dim distance scan — ~95% of
      // the work) runs on driver threads: each element's nearest cell is
      // a PURE function of (element, centroids), so the strided split is
      // bit-identical to the sequential loop regardless of scheduling
      val cs = centroids
      val assign = new Array[Int](data.length)
      val firstErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val workers = (0 until nThreads).map { t =>
        val th = new Thread(() => {
          try {
            var i = t
            while (i < data.length) { assign(i) = nearest(data(i), cs); i += nThreads }
          } catch { case e: Throwable => firstErr.compareAndSet(null, e) }
        })
        th.start(); th
      }
      workers.foreach(_.join())
      // a worker failure must propagate like the sequential loop's did —
      // not leave a stride silently assigned to cell 0
      if (firstErr.get() != null) throw firstErr.get()
      // the fp accumulation stays SEQUENTIAL in data order — double
      // addition is not associative, so a parallel fold would change the
      // centroids (and with them the declared IVF gate's output)
      val sums = Array.fill(k)(new Array[Double](data(0).length))
      val counts = new Array[Int](k)
      var j = 0
      while (j < data.length) {
        val v = data(j)
        val c = assign(j)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
        j += 1
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // keep empty cells stable
        else normalize(sums(c).map(_ / counts(c)))
      }
      it += 1
    }
    centroids
  }

  /** IVF ANN: assign corpus vectors to their `nAssign` nearest centroid
    * cells, probe the `nProbe` nearest cells per query, rank by exact
    * cosine within the probed cells. The cell assignment is the partition
    * key at scale — queries touch ~nProbe/nCells of the corpus.
    * `nAssign > 1` (multi-assignment / spilling) trades `nAssign`× storage
    * for recall at cell boundaries — the standard IVF remedy when vectors
    * sit between centroids.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L, nAssign: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val centroids = trainIvfCentroids(corpus, nCells, seed = seed,
      idCol = idCol, vecCol = vecCol)
    // cell assignment via the codegen'd IvfCells expression (the centroid
    // table rides the plan as a reference object — kilobytes); identical
    // normalize + squared-distance + (distance, index) ordering as the
    // former UDF, so assignments are bit-identical
    val c = withNorm(prep(corpus, idCol, vecCol), idCol, "nbr_id", "v_c")
      .withColumn("cell", explode(annFunctions.ivfCells(col("v_c"), centroids, nAssign)))
    val q = withNorm(prep(queries, idCol, vecCol), idCol, "query_id", "v_q")
      .withColumn("cell", explode(annFunctions.ivfCells(col("v_q"), centroids, nProbe)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    val scored = c.join(broadcast(q), "cell")
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineHoisted(col("v_q"), col("v_q_norm"), col("v_c"), col("v_c_norm")))
      .select("query_id", "nbr_id", "cosine")
    // multi-assigned pairs can meet in several probed cells — dedupe the
    // pair (cosine is a pure function of it) before ranking
    val distinctPairs = if (nAssign > 1) scored.distinct() else scored
    distinctPairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cosine", "rank")
  }

  /** Embedding near-duplicate pairs: all (a < b) with cosine ≥ threshold.
    * Exact quadratic form — the small-scale oracle ONLY (O(N²) pairs);
    * `lshNearDupPairs` below is the scale path.
    *
    * NOTE: constructing the plan runs one O(N) measurement pass over the
    * input (the broadcast-vs-cartesian gate needs the real payload size;
    * compressed planner estimates under-count by up to 100×) — accepted
    * eagerness for an op that is about to do O(N²) work.
    */
  def nearDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // the streamed side is spread (a small table arrives as one split and
    // would run the O(N²) cosine scan on one core); the other side rides
    // an explicit broadcast ONLY when the MEASURED payload (nVecs×dim×8,
    // one cheap agg over the pruned projection — this op is about to do
    // an O(N²) scan, so one O(N) pass is noise) fits an 8 MB budget.
    // Planner estimates were rejected here: they reflect the COMPRESSED
    // source, which dictionary/RLE parquet can hold 50-100× under the
    // materialized rows. An oversized input keeps the old
    // CartesianProduct (slow but completing) instead of dying on the cap.
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val pruned = df.select(col(idCol), col(vecCol))
    val a = withNorm(prep(Dedup.spread(pruned, parts, idCol), idCol, vecCol),
      idCol, "id_a", "v_a")
    val b = withNorm(prep(df, idCol, vecCol), idCol, "id_b", "v_b")
    // ignoreNulls so a null-embedding row landing first can't decide the
    // gate partition-order-dependently; the dim > 0 check also defuses
    // legacy sizeOfNull (-1) configurations, where a negative measured
    // size would otherwise force-broadcast an arbitrarily large table
    val m = pruned
      .agg(first(nonNegSize(col(vecCol).cast("array<double>")), ignoreNulls = true),
        count(lit(1)),
        coalesce(sum(greatest(size(col(vecCol).cast("array<double>")), lit(0))),
          lit(0L))).head()
    // per-row surcharge (~120 B of UnsafeRow/relation bookkeeping), like
    // the LSH verify-map gate — and the payload term sums EVERY vector's
    // element count, so a ragged-dimension corpus can't under-measure
    // through its first row (greatest defuses legacy sizeOfNull = -1)
    val measuredBytes =
      if (m.isNullAt(0) || m.getInt(0) <= 0) Double.MaxValue
      else m.getLong(2).toDouble * 8 + m.getLong(1).toDouble * 120
    val bSide = if (measuredBytes <= (8L << 20).toDouble) broadcast(b) else b
    a.crossJoin(bSide)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        cosineHoisted(col("v_a"), col("v_a_norm"), col("v_b"), col("v_b_norm")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** LSH-bucketed embedding near-duplicate pairs — the scale path.
    *
    * Each vector is hashed by `nTables` independent sign-bit signatures of
    * `nPlanes` hyperplanes and lands in its bucket plus (with
    * `probeBits = 1`) every 1-bit-flip bucket, so a pair collides in a
    * table whenever its signatures differ by ≤ 2 bits. Candidate pairs are
    * generated only inside (table, bucket) groups — bounded by `maxBucket`
    * — then verified by exact cosine, so precision is exact and recall is
    * 1 - Π_t P(hamming_t > 2·probeBits). With the defaults the miss
    * probability for a pair at cosine 0.4 (the loosest useful threshold)
    * is ≈ 0.39⁸ < 10⁻³ per pair; tighter pairs are safer still.
    *
    * `nPlanes = 0` (the default) auto-scales to ≈ log2(N / 32), so bucket
    * width tracks corpus size: candidate mass stays bounded as N grows
    * while recall for genuinely-near pairs (cosine ≳ 0.7) stays ≈ 1; only
    * pairs hugging the loosest thresholds decay gently with N — the
    * standard web-scale near-dup trade. The only wide ops are the bucket
    * groupBy and the two candidate-verify joins — never an all-pairs
    * product.
    */
  def lshNearDupPairs(df: DataFrame, threshold: Double,
      nPlanes: Int = 0, nTables: Int = 12, probeBits: Int = 1,
      seed: Long = 42L, maxBucket: Int = 4096,
      idCol: String = "vec_id", vecCol: String = "embedding",
      onDrops: DropStats => Unit = DropStats.logDrops): DataFrame = {
    val (out, cached, obs) = lshNearDupPairsPlan(df, threshold, nPlanes, nTables,
      probeBits, seed, maxBucket, idCol, vecCol)
    CacheScope.seal(out, cached, obs, onDrops)
  }

  private[graft] def lshNearDupPairsPlan(df: DataFrame, threshold: Double,
      nPlanes: Int = 0, nTables: Int = 12, probeBits: Int = 1,
      seed: Long = 42L, maxBucket: Int = 4096,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Seq[DataFrame], Option[DataFrame]) = {
    require(nPlanes >= 0 && nPlanes <= 28, "nPlanes must be in [0, 28]")
    require(probeBits >= 0 && probeBits <= 1, "probeBits 0 or 1 supported")
    val spark = df.sparkSession
    import spark.implicits._

    // spread a narrow input before the per-row norm/bucket expressions
    // (a small embeddings table arrives as one file split), then resolve
    // dim/count from the SAME job that materializes the persisted vectors
    // — no separate metadata scan over the input
    val parts = spark.sessionState.conf.numShufflePartitions
    val p = prep(Dedup.spread(df.select(col(idCol), col(vecCol)), parts, idCol),
      idCol, vecCol)
    val vecs = withNorm(p, idCol, "id", "v").persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (dim, p0, nVecs, sumDims) = {
      // ignoreNulls: dim must come from a real vector — a null-embedding
      // row landing first would otherwise zero the hyperplane dimension
      // and collapse every bucket (partition-order-dependent!). An
      // all-null corpus yields no entries at all, so dim 0 is inert.
      // sum of element counts feeds the broadcast-budget gate: a
      // first-row dim × count product would under-measure a
      // ragged-dimension corpus (greatest(…, 0) defuses legacy
      // sizeOfNull = -1 configurations).
      val r = vecs.agg(first(nonNegSize(col("v")), ignoreNulls = true), count(lit(1)),
        coalesce(sum(greatest(size(col("v")), lit(0))), lit(0L))).head()
      val auto = math.ceil(math.log(math.max(r.getLong(1), 2L) / 32.0) / math.log(2)).toInt
      (if (r.isNullAt(0)) 0 else r.getInt(0),
        if (nPlanes > 0) nPlanes else math.min(24, math.max(4, auto)),
        r.getLong(1), r.getLong(2))
    }
    val tables = Array.tabulate(nTables)(t => hyperplanes(dim, p0, seed + 7919L * t))

    // candidate generation as a key self-join, NOT collect_list + explode:
    // grouped bucket rows are few and byte-small, so AQE coalesces them to
    // one partition and the quadratic pair expansion runs on one core —
    // the join keeps the expansion distributed across the key hash space.
    // Keys come from the codegen'd LshBucketKeys expression (this map runs
    // over every corpus row — no ScalaUDF hop). Entries persist UNKEYED:
    // the maxBucket cap exists precisely because a degenerate bucket can
    // hold a huge fraction of the corpus, and a key-partitioned persist
    // would funnel that bucket's rows into one straggler partition
    // before the cap drops them — the key exchange happens after the
    // okKeys semi-join below, over surviving buckets only (the count
    // groupBy shuffles partial-aggregated rows, so hot keys cost it
    // nothing).
    val entries = vecs
      .select(col("id"), explode(annFunctions.lshKeys(col("v"), tables, probeBits)).as("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bucket sizes computed ONCE (tiny: one row per distinct key,
    // persisted) and consumed by both the cap filter and the drop-metrics
    // aggregate — over-cap buckets are dropped LOUDLY, with no duplicated
    // count shuffle
    val keyCounts = entries.groupBy("key").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val okKeys = keyCounts.filter(col("n").between(2, maxBucket)).select("key")
    val dropsDf = keyCounts
      .filter(col("n") > maxBucket)
      .agg(count(lit(1)).as("dropped_groups"),
        coalesce(sum(col("n")), lit(0L)).as("dropped_entries"))
    // explicit numPartitions repartition (post-guard — over surviving
    // buckets only), which AQE never coalesces: the quadratic pair
    // expansion stays spread across the key space
    val bounded = entries.join(okKeys, Seq("key"), "left_semi")
      .repartition(parts, col("key"))
    val rawPairs = bounded.select(col("key"), col("id").as("id_a")).hint("shuffle_hash")
      .join(bounded.select(col("key"), col("id").as("id_b")), "key")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")

    def verifyByJoin(pairs: DataFrame): DataFrame = {
      def side(s: String, n: String) =
        vecs.select(col("id").as(s), col("v").as("v" + s), col("v_norm").as(n))
      pairs
        .join(side("id_a", "na"), "id_a")
        .join(side("id_b", "nb"), "id_b")
        .withColumn("cosine", cosineHoisted(col("vid_a"), col("na"), col("vid_b"), col("nb")))
        .filter(col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    }

    // Candidate multiplicity (same pair colliding in several table/probe
    // buckets) must be deduplicated exactly once. When the vector table
    // fits the broadcast budget, verifying FIRST is far cheaper (distinct
    // is a full shuffle of the raw candidate stream; the verified output
    // is tiny) — and the verify itself is a codegen id→(vector, norm)
    // broadcast-map lookup, NOT a pair of broadcast hash joins: the joins
    // copied ~2×dim×8 bytes of vector payload into every candidate row
    // (the op's dominant cost measured at gate scale); the lookup keeps
    // candidate rows at 16 bytes and is bit-identical arithmetic. Past
    // broadcast size the verify becomes shuffled joins, so dedupe the
    // (id,id) pairs first and join vectors once per pair. Cutoff is
    // BYTE-based (~64 MB), not row-based — a row cutoff would happily
    // broadcast gigabytes of wide embeddings — and charges each entry
    // its JVM map overhead (~120 B: HashMap.Node + boxed key + Tuple2 +
    // boxed norm + array header) so a low-dim corpus with many rows
    // can't blow the driver past the budget on bookkeeping alone; the
    // payload term sums EVERY vector's element count, so a
    // ragged-dimension corpus can't under-measure through its first row
    val vecBytes = sumDims.toDouble * 8 + nVecs.toDouble * 120
    val out =
      if (vecBytes <= 64e6) {
        // null ids/vectors never produce verifiable pairs (they yield no
        // LSH entries, and id_a < id_b filters null ids), so they are
        // skipped rather than NPE-ing the map build; a DUPLICATE id
        // would make the map silently last-win where the join form
        // emitted one verify row per duplicate — that input falls back
        // to the OLD small-input shape (join all raw pairs, then
        // distinct the output), bit-identical to the pre-map semantics
        val map = new java.util.HashMap[java.lang.Long, (Array[Double], Double)]()
        var dupId = false
        vecs.select("id", "v", "v_norm").collect().foreach { r =>
          if (!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2)) {
            // null ELEMENTS read as 0.0, matching ArrayData.getDouble's
            // behavior in the join-form cosine kernel
            val s = r.getSeq[java.lang.Double](1)
            val arr = new Array[Double](s.length)
            var i = 0
            s.foreach { x => arr(i) = if (x == null) 0.0 else x.doubleValue; i += 1 }
            if (map.put(r.getLong(0), (arr, r.getDouble(2))) != null) dupId = true
          }
        }
        if (dupId) verifyByJoin(rawPairs).distinct()
        else {
          // a real Broadcast (torrent-fetched once per executor, reclaimed
          // by the ContextCleaner like any broadcast-join relation)
          val bc = spark.sparkContext.broadcast(map)
          rawPairs
            .withColumn("cosine", annFunctions.cosineByIds(col("id_a"), col("id_b"), bc))
            .filter(col("cosine") >= threshold)
            .distinct()
        }
      } else verifyByJoin(rawPairs.distinct())
    (out, Seq(vecs, entries, keyCounts), Some(dropsDf))
  }
}
