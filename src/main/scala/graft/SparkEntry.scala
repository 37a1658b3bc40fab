package graft

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.{functions => ga}
import graft.index.{IndexBuilder, IndexStore, OpenIndex}
import graft.ingest.{Coerce, Ledger, Upsert}
import graft.ops.{Ann, Curation, Dedup, TextStats}
import graft.query.{Search, Wand}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB-runnable oracle where the semantics
  * are SQL-expressible. Float-ranked queries order by the EXACT metric
  * (bit-identical across engines: fixed fold order) and output the
  * rounded metric, so top-k membership never depends on rounding.
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---- shared inverted index per (JVM, sfDir): built once, reused ----
  private val idxCache = TrieMap.empty[String, OpenIndex]
  private val exportCache = TrieMap.empty[String, String]
  private[graft] def indexFor(s: SparkSession, dir: String): OpenIndex =
    idxCache.getOrElseUpdate(dir, {
      val root = Files.createTempDirectory("graft-idx-").toString
      val store = new IndexStore(root)
      val docs = tbl(s, dir, "documents")
        .withColumn("url", concat(lit("doc://"), col("doc_id")))
      // positional build: every gate (WAND, serving, sharded, phrase)
      // runs over the SAME index — positions are additive payload
      IndexBuilder.build(s, docs, store,
        IndexBuilder.Config(segSize = 512, blockSize = 64, slices = 2, positions = true))
      store.open(s)
    })

  /** Flagship: build the inverted index over the sf0.001 corpus and run a
    * BM25 relevance search through block-max WAND (rows > 0).
    */
  def entry(spark: SparkSession): DataFrame = {
    val idx = indexFor(spark, "/root/testdata/sf0.001")
    Search.relevance(spark, idx, "spark index dup", k = 10)
  }

  // ---- shared single-node serving tier per (JVM, sfDir) ----
  private val servingCache = TrieMap.empty[String, graft.query.ServingIndex]
  private[graft] def servingFor(s: SparkSession, dir: String): graft.query.ServingIndex =
    servingCache.getOrElseUpdate(dir,
      graft.query.Serving.open(indexFor(s, dir), maxBytes = 2L << 30, withDocs = true))

  // deterministic BM25 presentation: exact-score ranking, rounded output
  private def bm25(s: SparkSession, dir: String, q: String, k: Int): DataFrame = {
    val hits = Wand.topK(s, indexFor(s, dir), q, k)
    hits.orderBy(col("score").desc, col("doc_id").asc)
      .select(col("doc_id"), round(col("score"), 4).as("score"))
  }

  private def bm25Sql(terms: Seq[String], k: Int): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS term FROM documents
       |), tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
       |df AS (SELECT term, count(*) AS df FROM tf WHERE term IN ($inList) GROUP BY term),
       |scores AS (
       |  SELECT tf.doc_id,
       |         sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) *
       |             tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))) AS score
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
       |  GROUP BY tf.doc_id)
       |SELECT doc_id, round(score, 4) AS score FROM scores
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  private val tokSql = "regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')"

  private lazy val ngramJaccardSql =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(range(greatest(len(t) - 2, 1)),
       |    i -> CASE WHEN len(t) < 3 THEN array_to_string(t, ' ')
       |              ELSE t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] END)) AS s
       |  FROM (SELECT doc_id, $tokSql AS t FROM documents) WHERE len(t) > 0),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM (
       |  SELECT id_a, id_b, c::DOUBLE / (sa.n + sb.n - c) AS jac
       |  FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b)
       | WHERE jac >= 0.5""".stripMargin

  private lazy val passageSql =
    s"""WITH w AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(range(len(t) - 7),
       |    i -> array_to_string(t[i+1:i+8], ' '))) AS w
       |  FROM (SELECT doc_id, $tokSql AS t FROM documents) WHERE len(t) >= 8)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
       |FROM w a JOIN w b ON a.w = b.w AND a.doc_id < b.doc_id
       |GROUP BY 1, 2""".stripMargin

  private lazy val embNearDupSql =
    """SELECT id_a, id_b, round(cos, 4) AS cosine FROM (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      |      (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
      |       sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cos
      |  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id) WHERE cos >= 0.4""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- S: scans / projections (SURVEY §2.1-2.2) ----
    "q_scan_project" -> ((s, d) =>
      tbl(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars"))
        .filter(col("lang") === "en")),

    "q_coerce" -> ((s, d) =>
      Coerce.documents(tbl(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"), col("props")))),

    // mapping-type coercion (date/boolean/ip/geo_point) over strings
    // derived from events — exercises the reference's type table
    // (data_ingestion_requirements.md:104-123) end to end
    "q_coerce_typed" -> ((s, d) => {
      val raw = tbl(s, d, "events").select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("ts_str"),
        when(col("event_id") % 3 === 0, lit("TRUE"))
          .when(col("event_id") % 3 === 1, lit("false"))
          .otherwise(lit("maybe")).as("flag_str"),
        concat(lit("10."), col("user_id") % 256, lit("."), col("event_id") % 256, lit("."),
          when(col("event_id") % 7 === 0, lit("999"))
            .otherwise((col("event_id") % 200).cast("string"))).as("ip_str"),
        concat(col("user_id") % 90, lit(".5,"), col("event_id") % 180, lit(".25")).as("geo_str"))
      val typed = Coerce.withMapping(raw, Map(
        "event_id" -> Coerce.LongField,
        "ts_str" -> Coerce.DateField,
        "flag_str" -> Coerce.BooleanField,
        "ip_str" -> Coerce.IpField,
        "geo_str" -> Coerce.GeoPointField))
      typed.select(
        col("event_id"),
        date_format(col("ts_str"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_iso"),
        col("flag_str").as("flag"),
        col("ip_str").as("ip"),
        col("geo_str.lat").as("lat"),
        col("geo_str.lon").as("lon"))
    }),

    // object/nested mapping types: JSON-object and JSON-array columns
    // coerce to struct / array<struct> with null-on-malformed — closes the
    // reference's type table (data_ingestion_requirements.md:104-123).
    // The JSON is synthesized from the table's own columns, so the oracle
    // is the round-trip identity (no DuckDB JSON functions needed).
    "q_coerce_nested" -> ((s, d) => {
      import org.apache.spark.sql.types.{LongType, StringType, StructType}
      val raw = tbl(s, d, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 7 === 0, lit("{not valid json"))
          .otherwise(concat(lit("{\"lang\": \""), col("lang"),
            lit("\", \"n\": "), col("n_chars"), lit("}"))).as("obj_str"),
        concat(lit("[{\"v\": "), col("doc_id") % 5,
          lit("}, {\"v\": "), col("doc_id") % 3, lit("}]")).as("arr_str"))
      val typed = Coerce.withMapping(raw, Map(
        "doc_id" -> Coerce.LongField,
        "obj_str" -> Coerce.ObjectField(
          new StructType().add("lang", StringType).add("n", LongType)),
        "arr_str" -> Coerce.NestedField(new StructType().add("v", LongType))))
      typed.select(
        col("doc_id"),
        col("obj_str.lang").as("j_lang"),
        col("obj_str.n").as("j_n"),
        element_at(col("arr_str"), 1).getField("v").as("v1"),
        element_at(col("arr_str"), 2).getField("v").as("v2"),
        size(col("arr_str")).cast("long").as("n_elems"))
    }),

    // ---- P: term / prefix / match-all query surface (§2.2) ----
    "q_term_filter" -> ((s, d) =>
      Search.termSearch(
        tbl(s, d, "documents"),
        Map("lang" -> "EN", "source" -> "SRC3"), size = Int.MaxValue)
        .orderBy(col("doc_id")).limit(100)
        .select(col("doc_id"), col("lang"), col("source"))),

    "q_prefix_autocomplete" -> ((s, d) =>
      Search.prefixSearch(
        tbl(s, d, "documents"), "text", "spa sca", size = Int.MaxValue)
        .get.orderBy(col("doc_id")).limit(10).select(col("doc_id"))),

    // byte-faithful query_string "{q}*": 'spark' exact, trailing 'sca' prefix
    "q_autocomplete_querystring" -> ((s, d) =>
      Search.queryStringAutocomplete(
        tbl(s, d, "documents").select(col("doc_id"), col("text"), col("lang"), col("source")),
        "spark sca", size = Int.MaxValue)
        .get.orderBy(col("doc_id")).limit(10).select(col("doc_id"))),

    // fields:["*"] autocomplete: 'src' only matches via the source column
    "q_prefix_all_fields" -> ((s, d) =>
      Search.prefixSearchAllFields(
        tbl(s, d, "documents").select(col("doc_id"), col("text"), col("lang"), col("source")),
        "spa sca src", size = Int.MaxValue)
        .get.orderBy(col("doc_id")).limit(10).select(col("doc_id"))),

    // match-all + field sort (+ doc_id tiebreak for a deterministic gate)
    "q_match_all_sort" -> ((s, d) =>
      tbl(s, d, "documents").select(col("doc_id"), col("lang"))
        .orderBy(col("lang"), col("doc_id")).limit(10)),

    // ---- T3: BM25 top-k through the real index (WAND) ----
    "q_bm25_mixed_top10" -> ((s, d) => bm25(s, d, "spark index dup", 10)),
    "q_bm25_head_top100" -> ((s, d) => bm25(s, d, "the data web", 100)),
    "q_bm25_rare_top10" -> ((s, d) => bm25(s, d, "dup", 10)),

    // single-node serving tier: same segTopK kernel, no Spark job per
    // query — must be bit-identical to the distributed WAND gate above
    "q_bm25_serving_top10" -> ((s, d) =>
      servingFor(s, d).topKDF(s, "spark index dup", 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"))),

    // serving-side hit materialization: `_source + _score` from the
    // serving node's in-memory doc store — same oracle as q_bm25_hits
    "q_bm25_serving_hits" -> ((s, d) =>
      servingFor(s, d).topKHitsDF(s, "spark index dup", 10)
        .select(col("doc_id"), col("lang"), col("doclen").cast("long").as("doclen"),
          round(col("score"), 4).as("score"))),

    // exact phrase query over the positional index: consecutive-position
    // match, overlap-counting ptf, BM25 on exact phrase df — the
    // fulltext-tier capability beyond bag-of-words WAND
    "q_bm25_phrase_top10" -> ((s, d) =>
      graft.query.Phrase.topK(s, indexFor(s, d), "table hash", 10)
        .select(col("doc_id"), round(col("score"), 4).as("score"))),

    // the same phrase answered by the serving shard server (positions
    // decoded on demand, global-df scoring) — must be bit-identical
    "q_bm25_phrase_serving_top10" -> ((s, d) => {
      import s.implicits._
      servingFor(s, d).phraseTopK("table hash", 10)
        .toSeq.toDF("doc_id", "score")
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),

    // document-sharded serving cluster (3 shard servers + router k-merge,
    // global term stats) — must be bit-identical to every other layout
    "q_bm25_sharded_top10" -> ((s, d) => {
      import s.implicits._
      val cluster = graft.query.Serving.openSharded(
        indexFor(s, d), nShards = 3, maxBytesPerShard = 2L << 30)
      cluster.topK("spark index dup", 10).toSeq.toDF("doc_id", "score")
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),

    // deployment-layout twin of q_bm25_sharded_top10 (same oracle): the
    // index is exported partitioned by shard, each shard server opens
    // ONLY its own directory, and the router must still merge to the
    // exact distributed/serving ranking
    "q_bm25_export_shard_top10" -> ((s, d) => {
      import s.implicits._
      val idx = indexFor(s, d)
      val out = exportCache.getOrElseUpdate(d, {
        val dir = Files.createTempDirectory("graft-export-").toString
        graft.query.ServingLayout.exportShards(s, idx.store, dir, nShards = 3)
        dir
      })
      val cluster = graft.query.ServingLayout.openExportedCluster(s, out, 2L << 30)
      cluster.topK("spark index dup", 10).toSeq.toDF("doc_id", "score")
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),

    // J4: hit materialization — scored docIDs broadcast-joined to stored fields
    "q_bm25_hits" -> ((s, d) =>
      Search.relevance(s, indexFor(s, d), "spark index dup", k = 10)
        .select(col("doc_id"), col("lang"), col("doclen"), round(col("score"), 4).as("score"))),

    // F5: autocomplete label projection over prefix matches
    "q_autocomplete_label" -> ((s, d) =>
      Search.prefixSearch(tbl(s, d, "documents"), "text", "spa sca", size = Int.MaxValue)
        .get.orderBy(col("doc_id")).limit(10)
        .select(col("doc_id"),
          concat(col("source"), lit(" ("), col("doc_id"), lit(")")).as("label"))),

    // ---- A5/A6: postings + stats decoded from the compressed index ----
    "q_postings" -> ((s, d) => {
      import s.implicits._
      // (term, doc, tf) dump never reads positions — prune them from the
      // scan exactly as the WAND path does
      indexFor(s, d).postings
        .withColumn("positions", lit(null).cast("binary"))
        .as[graft.index.PostingBlock]
        .flatMap { b =>
          val docs = graft.index.VByte.undeltas(b.firstDoc,
            graft.index.Codecs.decode(b.codec, b.docDeltas, b.n))
          val tfs = graft.index.Codecs.decode(b.codec, b.tfs, b.n)
          docs.indices.map(i => (b.term, docs(i), tfs(i)))
        }.toDF("term", "doc_id", "tf")
    }),

    "q_term_stats" -> ((s, d) =>
      indexFor(s, d).terms.toDF().select(col("term"), col("df"), col("cf"))),

    "q_corpus_stats" -> ((s, d) => {
      val st = indexFor(s, d).stats
      import s.implicits._
      Seq((st.nDocs, math.round(st.avgdl * 1e6) / 1e6, st.totalTokens))
        .toDF("n_docs", "avgdl", "total_tokens")
    }),

    // ---- J1/J5/A3/A4: ingestion-surface parity over events ----
    "q_upsert_lww" -> ((s, d) =>
      Upsert.lastWriteWins(
        tbl(s, d, "events").select(col("user_id"), col("event_id"), col("event_type"), col("value")),
        keyCol = "user_id", orderCols = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))),

    // partial update by id: update rows carry only (key, lang); null/omitted
    // fields keep their current values, unknown ids are ignored
    "q_partial_update" -> ((s, d) => {
      val current = tbl(s, d, "documents").select(col("doc_id"), col("lang"), col("source"))
      val updates = tbl(s, d, "documents")
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), lit("xx").as("lang"),
          lit(null).cast("string").as("source"))
      graft.ingest.PartialUpdate(current, updates, "doc_id")
    }),

    "q_resume_antijoin" -> ((s, d) => {
      val events = tbl(s, d, "events")
      // partial ledger: only a third of the users are marked processed
      val ledger = events.filter(col("event_type") === "signup" && col("user_id") % 3 === 0)
        .select(col("user_id"))
      Ledger.pendingOnly(events, ledger, "user_id")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_pending"))
    }),

    "q_summary_report" -> ((s, d) =>
      tbl(s, d, "events").groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))),

    "q_count_drift" -> ((s, d) => {
      val src = tbl(s, d, "orders").agg(count(lit(1)).as("src_count"))
      val tgt = tbl(s, d, "lineitem").agg(countDistinct(col("l_orderkey")).as("tgt_count"))
      src.crossJoin(tgt).select(
        col("src_count"), col("tgt_count"),
        round(abs(col("tgt_count") - col("src_count")).cast("double") / col("src_count") * 100, 4)
          .as("drift_pct"))
    }),

    "q_union_dedup" -> ((s, d) =>
      tbl(s, d, "events").select(col("user_id").as("id"))
        .union(tbl(s, d, "orders").select(col("o_custkey").as("id")))
        .distinct()),

    // ---- Dedup suite (training-data ops) ----
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exact(tbl(s, d, "documents"), "doc_id", "text")),

    // unbounded = explicit oracle-parity mode (small-sf only)
    "q_dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(tbl(s, d, "documents"), "doc_id", "text",
        shingleK = 3, threshold = 0.5, maxShingleDf = Long.MaxValue)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))),

    // default bounded hot-shingle guard — identical output at sf0.01
    // (500 docs: no shingle can exceed df 1000), so same oracle applies
    "q_dedup_ngram_jaccard_bounded" -> ((s, d) =>
      Dedup.ngramJaccardPairs(tbl(s, d, "documents"), "doc_id", "text",
        shingleK = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))),

    "q_dedup_minhash_lsh" -> ((s, d) => // oracle-gated: see oracleSql note
      Dedup.minhashLsh(tbl(s, d, "documents"), "doc_id", "text",
        shingleK = 3, m = 128, bands = 32, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))),

    // exact-passage duplication (verbatim k-token window shared between
    // two docs — the substring-dedup signal set-similarity misses). The
    // default hot-window guard is on: GateScaleSpec pins that no window
    // is hot at gate scale, so the exact oracle applies verbatim
    "q_dedup_passage" -> ((s, d) =>
      Dedup.sharedPassagePairs(tbl(s, d, "documents"), "doc_id", "text",
        windowK = 8)
        .select(col("id_a"), col("id_b"), col("shared"))),

    // pairs → clusters → representative: the KEEP/DROP step of the dedup
    // pipeline (connected components by min-label propagation). Input is
    // the DEFAULT bounded pair miner — the scale-path plan end to end;
    // the df guard is a no-op on this corpus (GateScaleSpec pins it), so
    // the exact recursive-closure oracle applies verbatim.
    "q_dedup_components" -> ((s, d) => {
      val pairs = Dedup.ngramJaccardPairs(tbl(s, d, "documents"), "doc_id", "text",
        shingleK = 3, threshold = 0.5)
      Dedup.components(pairs).select(col("id").as("doc_id"), col("rep_id"))
    }),

    "q_dedup_simhash" -> ((s, d) => // no SQL oracle: 64-bit sketch arithmetic
      Dedup.simhashPairs(tbl(s, d, "documents"), "doc_id", "text", maxDist = 8)),

    // ---- ANN / embeddings ----
    "q_ann_brute_topk" -> ((s, d) => {
      val emb = tbl(s, d, "embeddings")
      Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 4), k = 10)
        .select(col("query_id"), col("nbr_id"), round(col("cosine"), 4).as("cosine"), col("rank"))
    }),

    "q_ann_lsh_topk" -> ((s, d) => { // no SQL oracle: LSH bucketing
      val emb = tbl(s, d, "embeddings")
      Ann.lshTopK(emb, emb.filter(col("vec_id") < 4), k = 10, nPlanes = 8)
        .select(col("query_id"), col("nbr_id"), round(col("cosine"), 4).as("cosine"), col("rank"))
    }),

    "q_ann_ivf_topk" -> ((s, d) => { // no SQL oracle: k-means quantizer
      val emb = tbl(s, d, "embeddings")
      // nProbe=8, nAssign=2: the recall≥0.9 recipe (nProbe=4 single-assign
      // measured 0.53 recall@10 at gate scale — GateScaleSpec pins the bar
      // at sf0.1 with exactly these parameters)
      Ann.ivfTopK(emb, emb.filter(col("vec_id") < 4), k = 10, nCells = 16,
        nProbe = 8, nAssign = 2)
        .select(col("query_id"), col("nbr_id"), round(col("cosine"), 4).as("cosine"), col("rank"))
    }),

    "q_emb_near_dup" -> ((s, d) =>
      Ann.nearDupPairs(tbl(s, d, "embeddings"), threshold = 0.4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))),

    // scale path: LSH-bucketed candidates + exact-cosine verify. Output is
    // deterministic (seeded hyperplanes); with the default probe settings
    // its recall over this corpus is exactly 1, so the exact-pairs oracle
    // applies verbatim (OpsSpec asserts the recall invariant).
    "q_emb_near_dup_lsh" -> ((s, d) =>
      Ann.lshNearDupPairs(tbl(s, d, "embeddings"), threshold = 0.4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))),

    // ---- Corpus curation (training-data pipeline) ----
    // test-set decontamination: every 50th doc plays the benchmark set;
    // corpus docs sharing ≥2 distinct 3-gram shingles with it are flagged
    "q_decontaminate" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      Curation.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", shingleK = 3, minOverlap = 2L)
    }),

    // deterministic stratified sampling (domain mixing): fixed-hash keep
    // decision — same documents every rebuild, any partitioning
    "q_stratified_sample" -> ((s, d) =>
      Curation.stratifiedSample(
        tbl(s, d, "documents").select(col("doc_id"), col("lang")),
        strataCol = "lang", idCol = "doc_id",
        fractions = Map("en" -> 0.5, "de" -> 0.25), defaultFraction = 0.1)),

    // fixed-window sequence chunking with stride (overlap = window-stride)
    "q_chunk_windows" -> ((s, d) =>
      Curation.chunkWindows(tbl(s, d, "documents"), "doc_id", "text",
        window = 64, stride = 32)
        .select(col("doc_id"), col("win_id").cast("long").as("win_id"),
          col("chunk"), col("n_tokens"))),

    // ---- Text analysis ----
    "q_token_count" -> ((s, d) =>
      tbl(s, d, "documents").select(col("doc_id"),
        TextStats.tokenCount(col("text")).as("n_tokens"))),

    "q_bpe_token_count" -> ((s, d) =>
      tbl(s, d, "documents").select(col("doc_id"),
        TextStats.bpeTokenCount(col("text")).as("n_bpe"))),

    "q_lang_id" -> ((s, d) =>
      tbl(s, d, "documents").select(col("doc_id"),
        TextStats.langId(col("text")).as("lang_guess"))),

    "q_quality_score" -> ((s, d) =>
      tbl(s, d, "documents").select(col("doc_id"),
        TextStats.qualityScore(col("text")).as("quality"))),

    // Gopher-rule repetition signals: top-2-gram fraction + dup-token ratio
    "q_repetition" -> ((s, d) =>
      tbl(s, d, "documents").select(col("doc_id"),
        round(TextStats.topBigramFraction(col("text")), 6).as("top_bigram_frac"),
        round(TextStats.dupTokenRatio(col("text")), 6).as("dup_token_ratio"))),

    "q_fingerprint" -> ((s, d) =>
      tbl(s, d, "documents").select(col("doc_id"),
        TextStats.fingerprint(col("text")).as("fp"))),

    // ---- Multimodal plumbing: binary column metadata ----
    "q_binary_meta" -> ((s, d) =>
      tbl(s, d, "documents").select(col("doc_id"),
        octet_length(col("text").cast("binary")).as("n_bytes"))),

    // ---- Window: deterministic dense id assignment (§2.8 oracle form) ----
    "q_docid_window" -> ((s, d) =>
      tbl(s, d, "documents").select(col("doc_id"),
        row_number().over(Window.orderBy(col("lang"), col("doc_id"))).as("dense_id")))
  )

  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'",

    "q_coerce" ->
      """SELECT CAST(event_id AS DOUBLE) AS event_id, TRIM(CAST(event_type AS VARCHAR)) AS event_type,
        | CAST(value AS DOUBLE) AS value, TRIM(CAST(props AS VARCHAR)) AS props FROM events""".stripMargin,

    "q_coerce_typed" ->
      """WITH raw AS (
        |  SELECT event_id,
        |    strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts_str,
        |    CASE WHEN event_id % 3 = 0 THEN 'TRUE'
        |         WHEN event_id % 3 = 1 THEN 'false' ELSE 'maybe' END AS flag_str,
        |    '10.' || (user_id % 256) || '.' || (event_id % 256) || '.' ||
        |      (CASE WHEN event_id % 7 = 0 THEN '999' ELSE (event_id % 200)::VARCHAR END) AS ip_str,
        |    (user_id % 90) || '.5,' || (event_id % 180) || '.25' AS geo_str
        |  FROM events)
        |SELECT event_id,
        |  strftime(strptime(ts_str, '%Y-%m-%dT%H:%M:%S.%f'), '%Y-%m-%d %H:%M:%S.%f') AS ts_iso,
        |  CASE WHEN lower(flag_str) IN ('true','1') THEN true
        |       WHEN lower(flag_str) IN ('false','0') THEN false END AS flag,
        |  CASE WHEN regexp_matches(ip_str,
        |    '^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$')
        |    THEN ip_str END AS ip,
        |  string_split(geo_str, ',')[1]::DOUBLE AS lat,
        |  string_split(geo_str, ',')[2]::DOUBLE AS lon
        |FROM raw""".stripMargin,

    "q_coerce_nested" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS j_lang,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS j_n,
        |  doc_id % 5 AS v1,
        |  doc_id % 3 AS v2,
        |  2::BIGINT AS n_elems
        |FROM documents""".stripMargin,

    "q_term_filter" ->
      """SELECT doc_id, lang, source FROM documents
        | WHERE lower(lang) = 'en' AND lower(source) = 'src3' ORDER BY doc_id LIMIT 100""".stripMargin,

    "q_prefix_autocomplete" ->
      s"""SELECT doc_id FROM (SELECT doc_id, $tokSql AS toks FROM documents)
         | WHERE list_bool_and(list_transform(['spa', 'sca'],
         |   p -> len(list_filter(toks, t -> t LIKE p || '%')) > 0))
         | ORDER BY doc_id LIMIT 10""".stripMargin,

    "q_autocomplete_querystring" ->
      s"""SELECT doc_id FROM (SELECT doc_id,
         |   $tokSql
         |   || regexp_extract_all(lower(lang), '[\\p{L}\\p{N}]+')
         |   || regexp_extract_all(lower(source), '[\\p{L}\\p{N}]+') AS toks FROM documents)
         | WHERE list_contains(toks, 'spark')
         |   AND len(list_filter(toks, t -> t LIKE 'sca' || '%')) > 0
         | ORDER BY doc_id LIMIT 10""".stripMargin,

    "q_prefix_all_fields" ->
      s"""SELECT doc_id FROM (SELECT doc_id,
         |   $tokSql
         |   || regexp_extract_all(lower(lang), '[\\p{L}\\p{N}]+')
         |   || regexp_extract_all(lower(source), '[\\p{L}\\p{N}]+') AS toks FROM documents)
         | WHERE list_bool_and(list_transform(['spa', 'sca', 'src'],
         |   p -> len(list_filter(toks, t -> t LIKE p || '%')) > 0))
         | ORDER BY doc_id LIMIT 10""".stripMargin,

    "q_match_all_sort" ->
      "SELECT doc_id, lang FROM documents ORDER BY lang, doc_id LIMIT 10",

    "q_bm25_mixed_top10" -> bm25Sql(Seq("spark", "index", "dup"), 10),
    "q_bm25_serving_top10" -> bm25Sql(Seq("spark", "index", "dup"), 10),
    "q_bm25_sharded_top10" -> bm25Sql(Seq("spark", "index", "dup"), 10),
    "q_bm25_export_shard_top10" -> bm25Sql(Seq("spark", "index", "dup"), 10),

    // phrase = pseudo-term BM25: ptf counts consecutive-position (even
    // overlapping) occurrences; idf over exact phrase df; rank by the
    // exact double, output rounded — same parity discipline as bm25Sql
    "q_bm25_phrase_top10" ->
      s"""WITH base AS (SELECT doc_id, $tokSql AS t FROM documents),
         |stats AS (SELECT count(*) AS n, avg(len(t)) AS avgdl FROM base),
         |mm AS (SELECT * FROM (
         |         SELECT doc_id,
         |           len(list_filter(range(greatest(len(t) - 1, 0)),
         |             i -> t[i+1] = 'table' AND t[i+2] = 'hash')) AS ptf,
         |           len(t) AS dl
         |         FROM base) WHERE ptf > 0),
         |df AS (SELECT count(*) AS df FROM mm)
         |SELECT doc_id, round(s, 4) AS score FROM (
         |  SELECT doc_id,
         |    ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) *
         |      ptf * 2.2 / (ptf + 1.2 * (1 - 0.75 + 0.75 * dl / stats.avgdl)) AS s
         |  FROM mm CROSS JOIN stats CROSS JOIN df)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_bm25_phrase_serving_top10" ->
      s"""WITH base AS (SELECT doc_id, $tokSql AS t FROM documents),
         |stats AS (SELECT count(*) AS n, avg(len(t)) AS avgdl FROM base),
         |mm AS (SELECT * FROM (
         |         SELECT doc_id,
         |           len(list_filter(range(greatest(len(t) - 1, 0)),
         |             i -> t[i+1] = 'table' AND t[i+2] = 'hash')) AS ptf,
         |           len(t) AS dl
         |         FROM base) WHERE ptf > 0),
         |df AS (SELECT count(*) AS df FROM mm)
         |SELECT doc_id, round(s, 4) AS score FROM (
         |  SELECT doc_id,
         |    ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) *
         |      ptf * 2.2 / (ptf + 1.2 * (1 - 0.75 + 0.75 * dl / stats.avgdl)) AS s
         |  FROM mm CROSS JOIN stats CROSS JOIN df)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,
    "q_bm25_head_top100" -> bm25Sql(Seq("the", "data", "web"), 100),
    "q_bm25_rare_top10" -> bm25Sql(Seq("dup"), 10),

    "q_bm25_hits" -> {
      val inner = bm25Sql(Seq("spark", "index", "dup"), 10)
      s"""SELECT t.doc_id, d.lang,
         |  len(regexp_extract_all(lower(d.text), '[\\p{L}\\p{N}]+')) AS doclen, t.score
         | FROM ($inner) t JOIN documents d ON d.doc_id = t.doc_id""".stripMargin
    },

    "q_bm25_serving_hits" -> {
      val inner = bm25Sql(Seq("spark", "index", "dup"), 10)
      s"""SELECT t.doc_id, d.lang,
         |  len(regexp_extract_all(lower(d.text), '[\\p{L}\\p{N}]+')) AS doclen, t.score
         | FROM ($inner) t JOIN documents d ON d.doc_id = t.doc_id""".stripMargin
    },

    "q_autocomplete_label" ->
      s"""SELECT doc_id, source || ' (' || doc_id || ')' AS label
         | FROM (SELECT doc_id, source, $tokSql AS toks FROM documents)
         | WHERE list_bool_and(list_transform(['spa', 'sca'],
         |   p -> len(list_filter(toks, t -> t LIKE p || '%')) > 0))
         | ORDER BY doc_id LIMIT 10""".stripMargin,

    "q_postings" ->
      s"""SELECT term, doc_id, count(*) AS tf
         | FROM (SELECT doc_id, unnest($tokSql) AS term FROM documents)
         | GROUP BY term, doc_id""".stripMargin,

    // NOTE: integer sum() in DuckDB yields HUGEINT, which the driver's
    // pandas materialization turns into float64 ('3500.0' vs '3500') —
    // every integer aggregate below is cast ::BIGINT for hash parity.
    "q_term_stats" ->
      s"""SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf FROM (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest($tokSql) AS term FROM documents)
         |  GROUP BY doc_id, term) GROUP BY term""".stripMargin,

    "q_corpus_stats" ->
      s"""SELECT count(*) AS n_docs, round(avg(dl), 6) AS avgdl, sum(dl)::BIGINT AS total_tokens
         | FROM (SELECT doc_id, len($tokSql) AS dl FROM documents)""".stripMargin,

    "q_upsert_lww" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "q_partial_update" ->
      """SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS lang, source
        | FROM documents""".stripMargin,

    "q_resume_antijoin" ->
      """SELECT user_id, count(*) AS n_pending FROM events e
        | WHERE NOT EXISTS (SELECT 1 FROM events s
        |   WHERE s.event_type = 'signup' AND s.user_id % 3 = 0 AND s.user_id = e.user_id)
        | GROUP BY user_id""".stripMargin,

    "q_summary_report" ->
      "SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value FROM events GROUP BY event_type",

    "q_count_drift" ->
      """SELECT src_count, tgt_count,
        |  round(abs(tgt_count - src_count)::DOUBLE / src_count * 100, 4) AS drift_pct
        | FROM (SELECT count(*) AS src_count FROM orders),
        |      (SELECT count(DISTINCT l_orderkey) AS tgt_count FROM lineitem)""".stripMargin,

    "q_union_dedup" ->
      "SELECT DISTINCT id FROM (SELECT user_id AS id FROM events UNION ALL SELECT o_custkey AS id FROM orders)",

    "q_dedup_exact" ->
      "SELECT md5(text) AS content_md5, min(doc_id) AS rep_id, count(*) AS n_docs FROM documents GROUP BY md5(text)",

    "q_dedup_ngram_jaccard" -> ngramJaccardSql,
    // shared column is a BIGINT count in both engines — no cast needed
    "q_dedup_passage" -> passageSql,
    // guard is a no-op at sf0.01 (df can't exceed 1000 in 500 docs), so
    // the bounded default path matches the same exact oracle
    "q_dedup_ngram_jaccard_bounded" -> ngramJaccardSql,

    // MinHash+LSH is deterministic (seeded permutations); on this corpus
    // the banded candidates cover every true pair and the exact-Jaccard
    // verify stage keeps precisely the >= threshold pairs, so the output
    // equals the exact n-gram Jaccard oracle
    "q_dedup_minhash_lsh" -> ngramJaccardSql,

    // transitive closure of the near-dup pairs; component rep = min id
    "q_dedup_components" ->
      s"""WITH RECURSIVE pairs AS ($ngramJaccardSql),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         |SELECT a AS doc_id, least(a, min(b))::BIGINT AS rep_id
         |FROM reach GROUP BY a""".stripMargin,

    "q_ann_brute_topk" ->
      """SELECT query_id, nbr_id, round(cos, 4) AS cosine, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
        |    list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) DESC, c.vec_id) AS rank
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 4 AND c.vec_id <> q.vec_id) WHERE rank <= 10""".stripMargin,

    "q_emb_near_dup" -> embNearDupSql,
    // LSH path is deterministic (seeded planes) with recall 1 on this
    // corpus at the default probe settings (OpsSpec pins the invariant),
    // so the exact-pairs oracle applies verbatim
    "q_emb_near_dup_lsh" -> embNearDupSql,

    "q_decontaminate" ->
      s"""WITH sh AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(range(greatest(len(t) - 2, 1)),
         |    i -> CASE WHEN len(t) < 3 THEN array_to_string(t, ' ')
         |              ELSE t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] END)) AS s
         |  FROM (SELECT doc_id, $tokSql AS t FROM documents) WHERE len(t) > 0),
         |bsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0)
         |SELECT doc_id, count(*)::BIGINT AS n_hits
         |FROM (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0) c JOIN bsh USING (s)
         |GROUP BY doc_id HAVING count(*) >= 2""".stripMargin,

    // the (+1000)%1000 wrap mirrors Spark-side pmod for negative ids; a
    // no-op on this corpus (doc_id >= 0) but keeps the rule engine-equal
    "q_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        | WHERE ((doc_id % 100003) * 2654435761 % 1000 + 1000) % 1000 <
        |   CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250 ELSE 100 END""".stripMargin,

    "q_chunk_windows" ->
      s"""WITH base AS (SELECT doc_id, $tokSql AS t FROM documents),
         |w AS (SELECT doc_id, t, unnest(range(CASE WHEN len(t) <= 64 THEN 1
         |        ELSE ((len(t) - 64 + 31) // 32) + 1 END)) AS win_id FROM base)
         |SELECT doc_id, win_id::BIGINT AS win_id,
         |  array_to_string(t[win_id*32+1 : win_id*32+64], ' ') AS chunk,
         |  greatest(least(64, len(t) - win_id*32), 0)::BIGINT AS n_tokens
         |FROM w""".stripMargin,

    "q_token_count" ->
      s"SELECT doc_id, len($tokSql) AS n_tokens FROM documents",

    "q_bpe_token_count" ->
      """SELECT doc_id, len(regexp_extract_all(text,
        | '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]+'))::INT AS n_bpe FROM documents""".stripMargin,

    "q_lang_id" ->
      s"""SELECT doc_id, CASE WHEN best_r < 0.05 THEN 'und' ELSE best_l END AS lang_guess FROM (
         |  SELECT doc_id,
         |    CASE WHEN r_fr >= r_es AND r_fr >= r_en AND r_fr >= r_de THEN r_fr
         |         WHEN r_es >= r_en AND r_es >= r_de THEN r_es
         |         WHEN r_en >= r_de THEN r_en ELSE r_de END AS best_r,
         |    CASE WHEN r_fr >= r_es AND r_fr >= r_en AND r_fr >= r_de THEN 'fr'
         |         WHEN r_es >= r_en AND r_es >= r_de THEN 'es'
         |         WHEN r_en >= r_de THEN 'en' ELSE 'de' END AS best_l
         |  FROM (SELECT doc_id,
         |    CASE WHEN len(t) = 0 THEN 0.0 ELSE len(list_filter(t, x -> x IN ('the','a','of','to','and','in','is','it','for','on')))::DOUBLE / len(t) END AS r_en,
         |    CASE WHEN len(t) = 0 THEN 0.0 ELSE len(list_filter(t, x -> x IN ('der','die','das','und','ist','nicht','ein','zu')))::DOUBLE / len(t) END AS r_de,
         |    CASE WHEN len(t) = 0 THEN 0.0 ELSE len(list_filter(t, x -> x IN ('le','la','les','et','est','un','une','dans')))::DOUBLE / len(t) END AS r_fr,
         |    CASE WHEN len(t) = 0 THEN 0.0 ELSE len(list_filter(t, x -> x IN ('el','los','las','y','es','un','una','en')))::DOUBLE / len(t) END AS r_es
         |  FROM (SELECT doc_id, $tokSql AS t FROM documents)))""".stripMargin,

    "q_quality_score" ->
      s"""SELECT doc_id, round(
         |   0.4 * least(len(t) / 64.0, 1.0)
         | + 0.4 * (CASE WHEN strlen(text) = 0 THEN 0.0
         |          ELSE strlen(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / strlen(text) END)
         | + 0.2 * least((CASE WHEN len(t) = 0 THEN 0.0
         |          ELSE len(list_filter(t, x -> x IN ('the','a','of','to','and','in','is','it','for','on')))::DOUBLE / len(t) END) * 4.0, 1.0)
         | , 6) AS quality
         | FROM (SELECT doc_id, text, $tokSql AS t FROM documents)""".stripMargin,

    "q_repetition" ->
      s"""WITH base AS (SELECT doc_id, $tokSql AS t FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(range(len(t) - 1),
         |         i -> t[i+1] || ' ' || t[i+2])) AS b
         |       FROM base WHERE len(t) >= 2),
         |m AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS frac FROM (
         |        SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b)
         |      GROUP BY doc_id)
         |SELECT base.doc_id,
         |  round(coalesce(m.frac, 0.0), 6) AS top_bigram_frac,
         |  round(CASE WHEN len(t) = 0 THEN 0.0
         |        ELSE 1.0 - len(list_distinct(t))::DOUBLE / len(t) END, 6)
         |    AS dup_token_ratio
         |FROM base LEFT JOIN m USING (doc_id)""".stripMargin,

    "q_fingerprint" ->
      s"SELECT doc_id, md5(array_to_string($tokSql, ' ')) AS fp FROM documents",

    "q_binary_meta" ->
      "SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents",

    "q_docid_window" ->
      "SELECT doc_id, row_number() OVER (ORDER BY lang, doc_id) AS dense_id FROM documents"
  )
}
