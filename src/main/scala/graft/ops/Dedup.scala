package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic 64-bit string hash shared by the dedup sketches
  * (polynomial rolling hash, fixed base; Long overflow wraps, which is
  * deterministic on the JVM). Not cryptographic — collision-tolerant
  * sketch input only.
  */
object Hash64 {
  final val Base = 1099511628211L

  def apply(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h = h * Base + s.charAt(i); i += 1 }
    h
  }

  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

/** Web-scale deduplication operators over a corpus of (id, text).
  *
  * Scale design: every method is a pure per-row sketch followed by a
  * key-grouped shuffle whose groups are bounded (band buckets / hash
  * groups), never an O(n²) comparison. Exact pairwise verification only
  * runs inside candidate buckets.
  *
  * Caching: the sketch ops persist their single analyze pass
  * (MEMORY_AND_DISK) because two or more plan branches consume it, then
  * materialize their (small) output and RELEASE the persisted bases
  * before returning (`CacheScope.seal`) — a long-lived session running
  * many ops never accumulates block-manager state. Outputs past the
  * materialization cap fall back to a lazy plan with the bases persisted
  * (released via `spark.catalog.clearCache()`), preserving scale-out.
  *
  * Bounded modes (`maxBucket`, `maxShingleDf`) report what they dropped
  * through `onDrops` (default: log WARN) — never a silent cap.
  */
object Dedup {

  /** Distribute an analyze pass over a narrow input: a small corpus
    * arrives as one or two file splits, which would run the per-doc
    * tokenize/sketch expressions on ONE core; an input already at least
    * as wide as min(shuffle width, 8) keeps its natural split
    * parallelism — no shuffle of raw text at scale, where splits provide
    * the width (the gate makes the choice size-adaptive, guide §2).
    *
    * The probe reads the partition count off the NON-adaptive physical
    * plan's lazily-built RDD — never `df.rdd`, which under AQE
    * materializes every upstream query stage (running real shuffle jobs
    * whose output the probe then orphans) — and only for a plain
    * scan-shaped LOGICAL plan (leaf/project/filter/alias chain with no
    * plan subqueries): anything wider (joins, aggregates, explicit
    * repartitions) either arrives distributed by its own shuffle or
    * would pay side effects from the probe's prepare() (broadcast and
    * subquery stages kick off there even on the non-adaptive copy) —
    * those inputs skip the spread instead. The physical-plan check alone
    * is NOT enough: implicit exchanges are inserted by EnsureRequirements
    * during executedPlan preparation, after `sparkPlan`.
    */
  private[ops] def spread(df: DataFrame, parts: Int, idCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical
    val lp = df.queryExecution.optimizedPlan
    val scanShaped = lp.collect { case n => n }.forall {
      case _: logical.LeafNode => true
      case _: logical.Project | _: logical.Filter | _: logical.SubqueryAlias => true
      case _ => false
    } && !lp.exists(_.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]])))
    val n =
      if (!scanShaped) Int.MaxValue
      else try df.queryExecution.sparkPlan.execute().getNumPartitions
      catch { case scala.util.control.NonFatal(_) => Int.MaxValue }
    if (n >= math.min(parts, 8)) df
    else df.repartition(parts, col(idCol))
  }

  /** Exact duplicates: group by content hash; representative = min id.
    * One shuffle on a 128-bit key; trivially scales. (No `spread` here —
    * measured: md5 is cheap enough that the extra exchange costs more
    * than the single-core hash pass it parallelizes.)
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_md5"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_docs"))

  /** Word k-gram shingle set of an analyzed token stream. */
  def shingles(tokens: Array[String], k: Int): Array[String] =
    if (tokens.length < k) {
      if (tokens.isEmpty) Array.empty else Array(tokens.mkString(" "))
    } else tokens.sliding(k).map(_.mkString(" ")).toArray

  /** Exact k-token windows of an analyzed token stream — unlike
    * `shingles`, a document shorter than k tokens yields NO window (a
    * passage-copy signal needs a full-length window; whole-short-doc
    * equality is `exact`'s job).
    */
  def tokenWindows(tokens: Array[String], k: Int): Array[String] =
    if (tokens.length < k) Array.empty
    else tokens.sliding(k).map(_.mkString(" ")).toArray

  /** MinHash signature of a shingle set: m permutations h_i = a_i*x + b_i
    * over the 64-bit shingle hashes; min taken unsigned. Deterministic in
    * (seed, content).
    */
  def minhashSignature(shingleHashes: Array[Long], m: Int, seed: Long): Array[Long] = {
    val sig = Array.fill(m)(-1L) // unsigned max
    var p = 0
    while (p < m) {
      val a = Hash64.splitmix64(seed + 2L * p) | 1L
      val b = Hash64.splitmix64(seed + 2L * p + 1)
      var best = -1L
      var i = 0
      while (i < shingleHashes.length) {
        val h = a * shingleHashes(i) + b
        if (java.lang.Long.compareUnsigned(h, best) < 0) best = h
        i += 1
      }
      sig(p) = best
      p += 1
    }
    sig
  }

  /** MinHash+LSH near-duplicate candidate pairs.
    * Pipeline: shingle → minhash(m) → band (b bands of r rows) → bucket
    * join within (band, bandHash) → distinct pairs → exact Jaccard verify.
    * The band shuffle is the only wide op; bucket sizes concentrate around
    * true near-dups, and a guard caps pathological buckets.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, m: Int = 128, bands: Int = 32,
      threshold: Double = 0.8, seed: Long = 42L,
      maxBucket: Int = 64,
      onDrops: DropStats => Unit = DropStats.logDrops): DataFrame = {
    val (out, cached, obs) =
      minhashLshPlan(df, idCol, textCol, shingleK, m, bands, threshold, seed, maxBucket)
    CacheScope.seal(out, cached, obs, onDrops)
  }

  private[graft] def minhashLshPlan(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int, m: Int, bands: Int, threshold: Double, seed: Long,
      maxBucket: Int): (DataFrame, Seq[DataFrame], Option[DataFrame]) = {
    require(m % bands == 0, "m must divide into bands")

    // ONE tokenize+shingle pass, all codegen (no typed-Dataset ser/de):
    // the persisted base holds the distinct 128-bit shingle hashes —
    // 16 bytes/shingle instead of the raw k-token strings — and both the
    // banding branch and the Jaccard-verify branch read it. Signatures
    // derive from the h1 components (h1 IS Hash64 of the shingle, so the
    // minhash permutations are bit-identical to the string path) inside
    // the band-key expression; band-hash collisions only ADD candidates,
    // which the exact verify removes.
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val base = spread(df.select(col(idCol).cast("long").as("id"),
        col(textCol).as("text")), parts, "id")
      .select(col("id"),
        dedupFunctions.shingleHashes(col("text"), shingleK, whole = true).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val banded = base.select(
      col("id"),
      posexplode(dedupFunctions.minhashBandKeys(col("sh"), m, bands, seed))
        .as(Seq("band", "bhash")))

    // ONE band shuffle: the grouped relation is persisted and feeds both
    // the capped buckets and the drop metrics (the keyCounts pattern from
    // lshNearDupPairsPlan/ngramJaccardPairsPlan) — deriving drops from a
    // second groupBy over `banded` would re-run the posexplode + band-hash
    // shuffle from scratch. Singleton buckets carry no pairs and no drops,
    // so they're filtered before the persist.
    val bandGroups = banded
      .groupBy("band", "bhash")
      .agg(collect_list("id").as("ids"))
      .filter(size(col("ids")) >= 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val buckets = bandGroups.filter(size(col("ids")) <= maxBucket)

    // drop accounting: buckets past maxBucket are capped, not silent —
    // reported by CacheScope.seal next to the result.
    val dropsDf = bandGroups
      .filter(size(col("ids")) > maxBucket)
      .agg(count(lit(1)).as("dropped_groups"),
        coalesce(sum(size(col("ids"))), lit(0L)).cast("long").as("dropped_entries"))

    val pairs = buckets
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct()

    // verify candidates with exact Jaccard — only candidate ids' shingle
    // sets enter the join (semi-join first: candidates are a vanishing
    // fraction of the corpus at scale)
    val candIds = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
    val sets = base.select("id", "sh").join(candIds, Seq("id"), "left_semi")
    val out = pairs
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      // codegen O(|A|+|B|) set kernel: array_intersect/array_union on
      // struct elements fall off Spark's hash fast path into O(|A|·|B|)
      // ordering scans per candidate pair — quadratic per pair on long
      // documents. Drop semantics preserved: two empty sets yield -Inf
      // (the column form's NULL division), failing every threshold.
      .withColumn("jaccard", dedupFunctions.jaccard128(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    (out, Seq(base, bandGroups), Some(dropsDf))
  }

  /** All unordered pairs (a < b) of a (small, capped) bucket array.
    * NOTE: expr-based — the input column must be named `ids`.
    */
  private[ops] def pairsOf(ids: Column): Column =
    expr("""
      flatten(transform(ids, (x, i) ->
        transform(filter(ids, (y, j) -> j > i),
          y -> struct(least(x, y) AS _1, greatest(x, y) AS _2))))
    """)

  /** Connected components over near-duplicate pairs — the step that turns
    * pairwise dup evidence into KEEP/DROP decisions: every document in a
    * component shares its component's representative (the min id), so
    * "keep one per cluster" is a filter on `id === rep`.
    *
    * Algorithm: min-label propagation — each round every node takes the
    * minimum label among itself and its neighbors; converges in
    * O(component diameter) rounds. Near-dup components are shallow
    * (stars/short chains — transitive near-duplication collapses fast),
    * so the practical bound is a handful of rounds; each round is one
    * bounded join on the edge list. Labels persist per round and release
    * on the next; a non-converged run past `maxIters` fails loudly
    * rather than returning partial components.
    *
    * Input: pairs with `id_a`/`id_b` columns. Output: (id, rep_id) for
    * every node appearing in a pair.
    */
  def components(pairs: DataFrame, maxIters: Int = 25,
      localCap: Int = 1 << 20): DataFrame = {
    // hybrid solve, the standard CC design: edge sets below `localCap`
    // collect to a driver union-find (near-dup pair sets are a vanishing
    // fraction of the corpus — at gate scale the distributed loop would
    // spend seconds of pure job overhead on a toy graph); larger graphs
    // run the distributed label-propagation below
    val spark = pairs.sparkSession
    val rawEdges = pairs.select(
      col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
    val head = rawEdges.take(localCap + 1)
    if (head.length <= localCap) {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      head.foreach { e =>
        val (a, b) = (find(e.getLong(0)), find(e.getLong(1)))
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b } // min-id root
      }
      val nodes = head.iterator.flatMap(e => Iterator(e.getLong(0), e.getLong(1)))
        .toArray.distinct.sorted
      import spark.implicits._
      return nodes.map(n => (n, find(n))).toSeq.toDF("id", "rep_id")
    }

    val edges = rawEdges
      .union(pairs.select(col("id_b").cast("long"), col("id_a").cast("long")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("rep_id", col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("rep_id").as("nbr_rep")), "dst")
        .groupBy("src").agg(min("nbr_rep").as("nbr_rep"))
        .withColumnRenamed("src", "id")
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("rep_id"), coalesce(col("nbr_rep"), col("rep_id"))).as("rep_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      changed = next
        .join(labels.withColumnRenamed("rep_id", "old"), "id")
        .filter(col("rep_id") =!= col("old")).count()
      labels.unpersist(blocking = false)
      labels = next
      it += 1
    }
    if (changed != 0) {
      edges.unpersist(blocking = false)
      labels.unpersist(blocking = false)
      throw new IllegalArgumentException(
        s"components did not converge in $maxIters rounds — component diameter " +
          "exceeds the bound; raise maxIters")
    }
    CacheScope.seal(labels.select("id", "rep_id"), Seq(edges, labels),
      None, DropStats.logDrops)
  }

  /** SimHash-64: per-token hash bit votes weighted by tf. */
  def simhash64(tokens: Array[String]): Long = {
    if (tokens.isEmpty) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = Hash64(tokens(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist. Blocking by
    * the pigeonhole principle: split 64 bits into (maxDist+1) bands — any
    * pair within maxDist matches exactly on ≥1 band, so candidates come
    * from equality joins on band keys (scales; no all-pairs scan).
    *
    * Ids are expected UNIQUE per row (duplicated identical rows are
    * deduped internally); an input carrying one id with several distinct
    * texts pairs each distinct (id, sketch) independently and can emit
    * repeated (id_a, id_b, hamming) rows.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val (out, cached) = simhashPairsPlan(df, idCol, textCol, maxDist)
    CacheScope.seal(out, cached, None, DropStats.logDrops)
  }

  private[graft] def simhashPairsPlan(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int): (DataFrame, Seq[DataFrame]) = {
    val spark = df.sparkSession
    val nBands = maxDist + 1
    val width = 64 / nBands
    val mask = (1L << width) - 1

    // codegen tokenize+simhash in one expression — no typed-Dataset hop.
    // distinct(): duplicated input ROWS must not inflate pair
    // multiplicity now that the output no longer runs through a
    // distinct() of its own — deduping here costs one (id, sim) exchange
    // over one row per doc instead of a shuffle of every candidate pair.
    // Precondition note: for inputs carrying the SAME id with DIFFERENT
    // text, each distinct (id, sim) sketch pairs independently — two
    // such sketches landing at the SAME hamming from a neighbor emit two
    // identical output rows where the old output-distinct collapsed
    // them; ids are expected unique (they are in every declared gate).
    val parts = spark.sessionState.conf.numShufflePartitions
    val hashed = spread(df.select(col(idCol).cast("long").as("id"),
        col(textCol).as("text")), parts, "id")
      .select(col("id"), dedupFunctions.simhash64(col("text")).as("sim"))
      .distinct()

    // persisted PRE-PARTITIONED on the band key: the self-join reads both
    // sides from this relation with zero further exchanges (and without
    // the persist the tokenize+simhash map would run twice)
    val banded = hashed.select(
      col("id"), col("sim"),
      posexplode(expr(
        s"transform(sequence(0, ${nBands - 1}), b -> " +
          s"(shiftright(sim, b * $width) & $mask))"))
        .as(Seq("band", "key")))
      .repartition(parts, col("band"), col("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // co-partitioned self-join off the cached pre-partitioned relation —
    // zero further exchanges, same expansion rationale as above
    val a = banded.select(col("band"), col("key"),
      col("id").as("id_a"), col("sim").as("sim_a")).hint("shuffle_hash")
    val b = banded.select(col("band"), col("key"),
      col("id").as("id_b"), col("sim").as("sim_b"))
    // A pair matching in d bands would surface d times; instead of a
    // distinct() (a full shuffle of the candidate stream) each pair is
    // emitted ONLY from its first agreeing band — per-row codegen
    // arithmetic on the XOR, exactly-once by construction. Band b agrees
    // iff ((sim_a^sim_b) >> b*width) & mask == 0 (arithmetic shift
    // distributes over XOR, so this is precisely key_a == key_b).
    val xorCol = col("sim_a").bitwiseXOR(col("sim_b"))
    val firstBand = (0 until nBands).reverse.foldLeft(lit(nBands): Column) {
      (acc, b2) =>
        when(shiftright(xorCol, b2 * width).bitwiseAND(lit(mask)) === 0, lit(b2))
          .otherwise(acc)
    }
    val out = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("band") === firstBand)
      .select(col("id_a"), col("id_b"),
        bit_count(xorCol).as("hamming"))
      .filter(col("hamming") <= maxDist)
    (out, Seq(banded))
  }

  /** Exact n-gram Jaccard similarity pairs via a shingle inverted index:
    * (shingle, doc) → self-join on shingle → per-pair intersection count →
    * Jaccard. `maxShingleDf` drops ubiquitous shingles (they generate
    * quadratic candidates while adding no discrimination) — the standard
    * web-scale guard, ON by default: the shingle self-join goes quadratic
    * on any hot shingle without it. Pass `Long.MaxValue` explicitly for
    * unbounded exact-parity mode (small corpora only). Pair Jaccard is
    * still computed against UNFILTERED set sizes, so the guard can only
    * under-count intersections (drop borderline pairs), never inflate.
    */
  final val DefaultMaxShingleDf = 1000L

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, threshold: Double = 0.5,
      maxShingleDf: Long = DefaultMaxShingleDf,
      onDrops: DropStats => Unit = DropStats.logDrops): DataFrame = {
    val (out, cached, obs) =
      ngramJaccardPairsPlan(df, idCol, textCol, shingleK, threshold, maxShingleDf)
    CacheScope.seal(out, cached, obs, onDrops)
  }

  private[graft] def ngramJaccardPairsPlan(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int, threshold: Double, maxShingleDf: Long)
      : (DataFrame, Seq[DataFrame], Option[DataFrame]) = {
    // The per-doc set size rides along on each row, so the Jaccard
    // denominators come out of the pair aggregation itself — no separate
    // sizes groupBy and no two extra joins against it.
    val (docShingles, filtered, dropsDf, dfCached, bounded) =
      hashedInvertedIndex(df, idCol, textCol, shingleK, whole = true,
        carrySize = true, maxDf = maxShingleDf)

    val inter = pairCountsByKey(filtered, Seq("h1", "h2"), Seq("n"), "common",
      repartitionKeys = bounded)

    val out = inter
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    (out, Seq(docShingles) ++ dfCached, dropsDf)
  }

  /** Shared miner scaffold: spread → ONE codegen pass (tokenize → k-gram
    * → distinct 128-bit hashes — no typed-Dataset ser/de hop, and every
    * downstream shuffle carries a 16-byte (h1, h2) key instead of the
    * raw k-token string, 3-6× the bytes at web scale) → explode →
    * persist → hot-key guard.
    *
    * Partitioning: in UNBOUNDED mode (the small-corpus oracle form) the
    * persisted relation is pre-partitioned on the key, so the self-join
    * plans with zero further exchanges. In BOUNDED mode the key exchange
    * happens AFTER the hot-key guard (inside pairCountsByKey): a hot
    * key's rows must never ride a key-partitioned shuffle into one
    * straggler partition only to be dropped by the guard — the guard's
    * own df count shuffles partial-aggregated (key, count) rows only,
    * so hot keys cost it nothing.
    *
    * Returns (persisted relation, guarded relation, drop metrics, guard
    * cache, bounded).
    */
  private def hashedInvertedIndex(df: DataFrame, idCol: String, textCol: String,
      k: Int, whole: Boolean, carrySize: Boolean, maxDf: Long)
      : (DataFrame, DataFrame, Option[DataFrame], Option[DataFrame], Boolean) = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val bounded = maxDf != Long.MaxValue
    val hashed = spread(df.select(col(idCol).cast("long").as("id"),
        col(textCol).as("text")), parts, "id")
      .select(col("id"), dedupFunctions.shingleHashes(col("text"), k, whole).as("shs"))
    val withGen =
      if (carrySize)
        hashed.select(col("id"), size(col("shs")).as("n"), explode(col("shs")).as("s"))
      else hashed.select(col("id"), explode(col("shs")).as("s"))
    val exploded = withGen.select(
      Seq(col("id")) ++ (if (carrySize) Seq(col("n")) else Nil) ++
        Seq(col("s.h1").as("h1"), col("s.h2").as("h2")): _*)
    val rel =
      (if (bounded) exploded else exploded.repartition(parts, col("h1"), col("h2")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (filtered, dropsDf, dfCached) = hotKeyGuard(rel, Seq("h1", "h2"), maxDf)
    (rel, filtered, dropsDf, dfCached, bounded)
  }

  /** Exact-passage duplication: document pairs sharing at least one
    * EXACT k-token window, with the count of distinct shared windows —
    * the "exact substring duplication" curation signal LLM pipelines use
    * to find copied passages (quotes, licensing boilerplate, syndicated
    * paragraphs) that set-similarity misses: two long documents sharing
    * one verbatim paragraph have near-zero shingle Jaccard but are
    * exactly the pair a dedup/decontamination pass wants to see. A
    * distributed window inverted index (window → doc self-join) is the
    * shape that scales where suffix arrays don't: one shuffle on the
    * window key. `maxWindowDf` guards hot windows (site boilerplate
    * repeated across millions of pages goes quadratic in the self-join)
    * with the same loud broadcast anti-join as the n-gram guard. The
    * guard can only UNDER-report: hot windows leave the `shared` count
    * of every pair (a pair sharing 2 rare + 2 hot windows reports
    * shared=2), and a pair whose only shared windows are hot disappears
    * — by design, since ubiquitous boilerplate is exactly the noise the
    * signal exists to ignore, but a caller thresholding on `shared`
    * must know the count excludes guarded windows. Unbounded
    * (`Long.MaxValue`) is the small-corpus oracle form.
    */
  def sharedPassagePairs(df: DataFrame, idCol: String, textCol: String,
      windowK: Int = 8,
      maxWindowDf: Long = DefaultMaxShingleDf,
      onDrops: DropStats => Unit = DropStats.logDrops): DataFrame = {
    val (out, cached, obs) =
      sharedPassagePairsPlan(df, idCol, textCol, windowK, maxWindowDf)
    CacheScope.seal(out, cached, obs, onDrops)
  }

  private[graft] def sharedPassagePairsPlan(df: DataFrame, idCol: String,
      textCol: String, windowK: Int, maxWindowDf: Long)
      : (DataFrame, Seq[DataFrame], Option[DataFrame]) = {
    // the same hashedInvertedIndex scaffold as the n-gram miner, with
    // `whole = false` (a sub-k-token doc yields NO window) and no carried
    // size — the signal is the shared-window count, not Jaccard. The
    // window inverted index shuffles 16-byte keys where it used to
    // shuffle the full 8-token window text (~50-100 bytes/row) — the
    // engine's widest shuffle cut to a fraction of its bytes.
    val (docWindows, filtered, dropsDf, dfCached, bounded) =
      hashedInvertedIndex(df, idCol, textCol, windowK, whole = false,
        carrySize = false, maxDf = maxWindowDf)

    val out = pairCountsByKey(filtered, Seq("h1", "h2"), Nil, "shared",
      repartitionKeys = bounded)
      .select("id_a", "id_b", "shared")
    (out, Seq(docWindows) ++ dfCached, dropsDf)
  }

  /** Hot-key guard shared by the shingle/window self-join miners. Hot
    * keys are guarded out loudly, never silently: the df-count relation
    * is computed ONCE (tiny: one row per distinct key, persisted) and
    * consumed by the guard and the drop-metrics aggregate — no duplicated
    * count shuffle. The guard itself INVERTS the join: hot keys are by
    * definition few distinct VALUES (that's what makes them hot), so a
    * broadcast anti-join against the hot set costs a scan instead of
    * shuffling the whole (id, key) stream against the huge OK-key set —
    * the bounded default is as cheap as unbounded plus one count
    * aggregate. A pathological corpus whose hot set outgrows the
    * broadcast cap falls back to the semi-join. Returns (guarded
    * relation, drop-metrics row for CacheScope.seal, persisted count
    * relation for the cache scope).
    */
  private def hotKeyGuard(rel: DataFrame, keyCols: Seq[String], maxDf: Long)
      : (DataFrame, Option[DataFrame], Option[DataFrame]) =
    if (maxDf == Long.MaxValue) (rel, None, None)
    else {
      val spark = rel.sparkSession
      val dfCounts = rel.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("kdf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hot = dfCounts.filter(col("kdf") > maxDf)
      // one aggregate over the persisted counts serves BOTH the
      // broadcast-size decision and the drop metrics (materialized here,
      // handed to CacheScope.seal as a local row — no recompute)
      val dropRow = hot
        .agg(count(lit(1)).as("dropped_groups"),
          coalesce(sum(col("kdf")), lit(0L)).as("dropped_entries"))
        .head()
      val drops = spark.createDataFrame(
        java.util.Collections.singletonList(dropRow),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("dropped_groups",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("dropped_entries",
            org.apache.spark.sql.types.LongType, nullable = false))))
      // row cap proxies a byte budget: ~1M key strings ≈ tens of MB
      // broadcast — past that the semi-join path is the safer shape
      val maxBroadcastHot = 1L << 20
      val guarded =
        if (dropRow.getLong(0) <= maxBroadcastHot)
          rel.join(broadcast(hot.select(keyCols.map(col): _*)), keyCols, "left_anti")
        else rel.join(
          dfCounts.filter(col("kdf") <= maxDf).select(keyCols.map(col): _*),
          keyCols, "left_semi")
      (guarded,
        Some(drops): Option[DataFrame],
        Some(dfCounts): Option[DataFrame])
    }

  /** Distinct (id_a < id_b) pair counts via a key self-join over an
    * (id, key...) relation — the shared kernel of the shingle/window pair
    * miners. Explicit numPartitions repartition + shuffle-hash: the
    * inputs are byte-small but the self-join EXPANDS quadratically per
    * key — AQE-coalesced plans run the expansion on one core (see Ann).
    * `carryCols` ride the shuffle (8 bytes each, constant per id) and
    * come out as `<c>_a`/`<c>_b` aggregates — carrying the per-doc set
    * size this way removes the separate sizes groupBy plus two joins the
    * Jaccard denominators used to cost.
    *
    * `repartitionKeys = true` (bounded mode): the input was NOT
    * key-partitioned upstream — the hot-key guard must see the raw
    * relation first — so the self-join repartitions here, AFTER the
    * guard removed the hot keys. `false` (unbounded mode): `rel` arrives
    * PRE-PARTITIONED on `keyCols` (the miners repartition before the
    * persist) and the self-join plans with ZERO exchanges. Either way
    * the explicit numPartitions partitioning means AQE cannot coalesce
    * the quadratic expansion onto one core.
    */
  private def pairCountsByKey(rel0: DataFrame, keyCols: Seq[String],
      carryCols: Seq[String], outCol: String,
      repartitionKeys: Boolean): DataFrame = {
    val rel =
      if (!repartitionKeys) rel0
      else rel0.repartition(
        rel0.sparkSession.sessionState.conf.numShufflePartitions, keyCols.map(col): _*)
    def side(sfx: String) = rel.select(
      keyCols.map(col) ++
        (col("id").as("id" + sfx) +: carryCols.map(c => col(c).as(c + sfx))): _*)
    val a = side("_a").hint("shuffle_hash")
    val b = side("_b")
    a.join(b, keyCols)
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as(outCol),
        carryCols.flatMap(c =>
          Seq(min(col(c + "_a")).as(c + "_a"), min(col(c + "_b")).as(c + "_b"))): _*)
  }
}
