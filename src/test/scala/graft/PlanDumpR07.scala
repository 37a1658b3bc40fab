package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Writes plans/r07/<query>_<suffix>.txt — the `.explain("formatted")`
  * output of each optimization-target query, for the round-7 before/after
  * plan evidence. The sealed sketch ops (dedup/ANN) materialize and
  * release their internal plans before returning a local relation, so for
  * those this dumps the UNSEALED internal plan — the one that executes.
  *
  *   Test/runMain graft.PlanDumpR07 <suffix> [q1,q2,...]
  */
object PlanDumpR07 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val only = args.drop(1).headOption.map(_.split(",").toSet)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")

    // (query name, note, unsealed plan producer, caches to release)
    def plans: Seq[(String, String, () => (DataFrame, Seq[DataFrame]))] = Seq(
      ("q_dedup_ngram_jaccard", "unsealed ngramJaccardPairsPlan, unbounded",
        () => { val (o, c, _) = graft.ops.Dedup.ngramJaccardPairsPlan(
          docs, "doc_id", "text", 3, 0.5, Long.MaxValue); (o, c) }),
      ("q_dedup_ngram_jaccard_bounded", "unsealed ngramJaccardPairsPlan, default guard",
        () => { val (o, c, _) = graft.ops.Dedup.ngramJaccardPairsPlan(
          docs, "doc_id", "text", 3, 0.5, graft.ops.Dedup.DefaultMaxShingleDf); (o, c) }),
      ("q_dedup_passage", "unsealed sharedPassagePairsPlan, default guard",
        () => { val (o, c, _) = graft.ops.Dedup.sharedPassagePairsPlan(
          docs, "doc_id", "text", 8, graft.ops.Dedup.DefaultMaxShingleDf); (o, c) }),
      ("q_dedup_minhash_lsh", "unsealed minhashLshPlan",
        () => { val (o, c, _) = graft.ops.Dedup.minhashLshPlan(
          docs, "doc_id", "text", 3, 128, 32, 0.5, 42L, 64); (o, c) }),
      ("q_dedup_simhash", "unsealed simhashPairsPlan, maxDist=8",
        () => { val (o, c) = graft.ops.Dedup.simhashPairsPlan(
          docs, "doc_id", "text", 8); (o, c) }),
      ("q_emb_near_dup_lsh", "unsealed lshNearDupPairsPlan",
        () => { val (o, c, _) = graft.ops.Ann.lshNearDupPairsPlan(
          emb, threshold = 0.4); (o, c) }),
      ("q_emb_near_dup", "exact quadratic oracle form",
        () => (graft.ops.Ann.nearDupPairs(emb, threshold = 0.4), Nil)),
      ("q_decontaminate", "broadcast benchmark shingles",
        () => (graft.ops.Curation.decontaminate(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", shingleK = 3, minOverlap = 2L), Nil)),
      // topK materializes its result (LocalTableScan), so the evidence
      // plan is the internal segment-local matcher — the query's one
      // heavy job. The doclen-resolving variant is the executed fast
      // path whenever the norms broadcast exists (always at gate scale).
      ("q_bm25_phrase_top10", "internal phrase match plan (doclen-resolving fast path)",
        () => {
          val idx = SparkEntry.indexFor(spark, sf)
          val slots = graft.analysis.Analyzer.tokenize("table hash").toIndexedSeq
          (idx.normsBroadcast match {
            case Some(bc) =>
              graft.query.Phrase.matchesWithDlPlan(idx, slots, bc)
                .toDF("doc_id", "ptf", "doclen")
            case None => graft.query.Phrase.matchesPlan(idx, slots).toDF("doc_id", "ptf")
          }, Nil)
        }),
      ("q_resume_antijoin", "ledger anti-join + pending counts",
        () => (SparkEntry.queries("q_resume_antijoin")(spark, sf), Nil)),
      ("q_upsert_lww", "last-write-wins upsert",
        () => (SparkEntry.queries("q_upsert_lww")(spark, sf), Nil)),
      ("q_partial_update", "partial update by id",
        () => (SparkEntry.queries("q_partial_update")(spark, sf), Nil)),
      ("q_union_dedup", "union + distinct",
        () => (SparkEntry.queries("q_union_dedup")(spark, sf), Nil)),
      ("q_ann_ivf_topk", "IVF probe join",
        () => (SparkEntry.queries("q_ann_ivf_topk")(spark, sf), Nil)),
      ("q_ann_lsh_topk", "LSH probe join",
        () => (SparkEntry.queries("q_ann_lsh_topk")(spark, sf), Nil)),
      ("q_ann_brute_topk", "brute-force broadcast scan",
        () => (SparkEntry.queries("q_ann_brute_topk")(spark, sf), Nil)),
      ("q_chunk_windows", "fixed-window chunking",
        () => (SparkEntry.queries("q_chunk_windows")(spark, sf), Nil)))

    Files.createDirectories(Paths.get("plans/r07"))
    plans.filter(p => only.forall(_.contains(p._1))).foreach { case (name, note, mk) =>
      val (df, caches) = mk()
      try {
        df.collect() // finalize AQE so the printed plan is the executed one
        val s = s"# $name ($suffix) — $note\n# sf: $sf, shuffle.partitions=32\n\n" +
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"plans/r07/${name}_$suffix.txt"), s)
        println(s"[plandump-r07] wrote plans/r07/${name}_$suffix.txt")
      } finally caches.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
