package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.{functions => ga}

/** Plan-quality regression guards: the scale properties the engine
  * depends on must be visible in the physical plan, not assumed.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan") {
    val p = plan(spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang")).filter(col("lang") === "en"))
    assert(p.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), p)
  }

  test("column pruning: 2-column projection reads a 2-column schema") {
    val p = plan(spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars")))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), p)
    assert(!p.contains("text"), "text column must not be read")
  }

  test("term lookup pushes IN-filter into the postings scan") {
    val idx = SparkEntry.indexFor(spark, sf)
    val p = plan(idx.postings.filter(col("term").isin("spark", "dup")).toDF())
    assert(p.contains("In(term, [dup,spark])"), p)
  }

  test("tf pipeline: partial aggregation before the exchange, tokenize in codegen") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(ga.tokenize(col("text"))).as("term"))
      .groupBy("term").count()
    df.collect() // finalize THIS queryExecution (count() would build a new one)
    val p = plan(df)
    assert(p.contains("partial_count"), s"map-side combine missing:\n$p")
    assert(p.contains("graft_tokenize"), p)
    assert(p.contains("*("), s"whole-stage codegen markers missing:\n$p")
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan(spark.read.parquet(s"$sf/documents.parquet")
      .orderBy(col("n_chars").desc).limit(10))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("hit materialization broadcasts the tiny scored side") {
    val idx = SparkEntry.indexFor(spark, sf)
    val hits = graft.query.Search.relevance(spark, idx, "spark dup", k = 5)
    val p = plan(hits)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("lshNearDupPairs plans equality joins only — no cartesian product") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // the unsealed plan: the public op materializes + releases its caches,
    // so the scale-shape guard inspects the plan the op executes internally
    val p = plan(graft.ops.Ann.lshNearDupPairsPlan(emb, threshold = 0.4)._1)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup scale path must never plan a cross join:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("lshTopK broadcasts the probe side; corpus joined by bucket key") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.ops.Ann.lshTopK(emb, emb.filter(col("vec_id") < 2), k = 5))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ANN bucket keys are codegen expressions — no UDF node on the corpus side") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 2)
    val pLsh = plan(graft.ops.Ann.lshTopK(emb, q, k = 5))
    val pIvf = plan(graft.ops.Ann.ivfTopK(emb, q, k = 5, nCells = 8, nProbe = 2))
    val pNd = plan(graft.ops.Ann.lshNearDupPairsPlan(emb, threshold = 0.4)._1)
    for ((name, p) <- Seq(("lshTopK", pLsh), ("ivfTopK", pIvf), ("lshNearDupPairs", pNd))) {
      assert(!p.contains("UDF") && !p.contains("BatchEvalPython"),
        s"$name still plans a UDF hop:\n$p")
    }
    assert(pLsh.contains("graft_lsh_keys"), pLsh)
    assert(pIvf.contains("graft_ivf_cells"), pIvf)
    assert(pNd.contains("graft_lsh_keys"), pNd)
  }

  test("decontaminate broadcasts the benchmark shingles — corpus side scan-shaped") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ops.Curation.decontaminate(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0),
      "doc_id", "text"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("wand topK prunes the positional payload out of the postings scan") {
    val idx = SparkEntry.indexFor(spark, sf) // built WITH positions
    val df = graft.query.Wand.topK(spark, idx, "spark dup", 5)
    val p = plan(df)
    // ReadSchema strings truncate in toString — pin the FileScan output
    // attribute lists instead (printed in full)
    def scanCols(s: String): Seq[String] =
      "FileScan parquet \\[[^\\]]*\\]".r.findAllIn(s).toSeq
    val postingScans = scanCols(p).filter(_.contains("term#"))
    assert(postingScans.nonEmpty, p)
    assert(!postingScans.exists(_.contains("positions#")),
      s"term queries must not scan the positional payload:\n$p")
    // the phrase path is the one consumer of positions — it must still read them
    val pp = plan(graft.query.Phrase.matchesPlan(idx, IndexedSeq("spark", "dup")).toDF())
    assert(scanCols(pp).exists(_.contains("positions#")), pp)
  }

  test("minhash LSH derives buckets AND drop metrics from one persisted band shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (_, cached, drops) = graft.ops.Dedup.minhashLshPlan(
      docs, "doc_id", "text", shingleK = 3, m = 128, bands = 32,
      threshold = 0.5, seed = 42L, maxBucket = 64)
    try {
      // the drop-metrics aggregate must read the persisted band-group
      // relation, not re-run the posexplode + band-hash shuffle (the
      // round-3 3.4s -> 11.4s regression)
      val dp = plan(drops.get)
      assert(dp.contains("InMemoryTableScan"),
        s"drop metrics must reuse the cached band groups:\n$dp")
      // the live plan ABOVE the cache boundary must not rebuild the band
      // hash (InMemoryRelation prints its cached build plan below it, so
      // only the prefix before the first cache boundary is inspected)
      val live = dp.substring(0, dp.indexOf("InMemoryRelation"))
      assert(!live.contains("posexplode") && !live.contains("xxhash64"),
        s"drop metrics re-runs the band shuffle:\n$dp")
    } finally cached.foreach(_.unpersist(blocking = false))
  }

  test("bounded ngram guard is a broadcast anti-join of the (few) hot shingles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (out, cached, _) = graft.ops.Dedup.ngramJaccardPairsPlan(
      docs, "doc_id", "text", shingleK = 3, threshold = 0.5,
      maxShingleDf = graft.ops.Dedup.DefaultMaxShingleDf)
    try {
      // hot shingles are few by definition — the guard must ride a
      // broadcast anti-join, not shuffle the stream against the OK keys
      val p = plan(out)
      assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
        s"bounded guard should broadcast the hot set:\n$p")
    } finally cached.foreach(_.unpersist(blocking = false))
  }

  test("pair miners repartition/self-join on the 128-bit hash, never the raw token string") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (ngOut, ngCached, _) = graft.ops.Dedup.ngramJaccardPairsPlan(
      docs, "doc_id", "text", 3, 0.5, Long.MaxValue)
    val (ppOut, ppCached, _) = graft.ops.Dedup.sharedPassagePairsPlan(
      docs, "doc_id", "text", 8, graft.ops.Dedup.DefaultMaxShingleDf)
    try {
      for ((name, p) <- Seq(("ngram", plan(ngOut)), ("passage", plan(ppOut)))) {
        assert(p.contains("graft_shingle_hash128"),
          s"$name miner must hash shingles in codegen:\n$p")
        // the quadratic self-join's exchange must be keyed on the two
        // 64-bit hash halves — raw shingle/window strings through the
        // wide shuffle is the round-6 'What's wrong #2'
        assert("hashpartitioning\\(h1#\\d+L, h2#\\d+L".r.findFirstIn(p).nonEmpty,
          s"$name self-join must repartition on (h1, h2):\n$p")
        // \b so an unrelated column merely ENDING in 'w' (raw#12) can't
        // spuriously trip the raw-token-string guard
        assert(!"hashpartitioning\\([^)]*\\b(shingle|w)#\\d+[,)]".r.findFirstIn(p).isDefined,
          s"$name must not shuffle a raw token-string column:\n$p")
      }
    } finally (ngCached ++ ppCached).foreach(_.unpersist(blocking = false))
  }

  test("wand topK issues no terms-table job (driver-side stats) and one blocks shuffle") {
    val idx = SparkEntry.indexFor(spark, sf)
    assert(idx.termsLocal.nonEmpty, "bounded vocab must resolve driver-side")
    val df = graft.query.Wand.topK(spark, idx, "spark dup", 5)
    val p = plan(df)
    // document-sharded WAND: one exchange of the query terms' blocks, then
    // the tiny TakeOrdered merge — no join, no second shuffle
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
