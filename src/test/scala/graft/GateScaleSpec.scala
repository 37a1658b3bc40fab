package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Ann, Dedup}

/** Gate-scale invariant pins (sf0.1 — the largest corpus the driver
  * touches): several gates are checked against EXACT oracles on premises
  * that are probabilistic or corpus-dependent —
  *   - `q_emb_near_dup_lsh` / `q_dedup_minhash_lsh` assume LSH recall is
  *     exactly 1 on this corpus at the default probe settings;
  *   - `q_dedup_ngram_jaccard_bounded` assumes no shingle's df exceeds
  *     the default guard, making the bound a no-op;
  *   - `q_dedup_passage` assumes no 8-token window's df exceeds the
  *     default guard, for the same reason.
  * Those premises are asserted HERE at the actual gate scale, so a future
  * corpus or parameter change fails with a clear message instead of a
  * confusing oracle hash mismatch. (lshNearDupPairs auto-scales nPlanes
  * with N, so sf0.01 pins alone would not cover the sf0.1 behavior.)
  */
class GateScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.1"

  test("emb near-dup LSH recall is exactly 1 at gate scale (sf0.1)") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val exact = Ann.nearDupPairs(emb, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshNearDupPairs(emb, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh == exact,
      s"q_emb_near_dup_lsh's exact oracle premise broke at gate scale: " +
        s"lsh=${lsh.size} exact=${exact.size} missing=${(exact -- lsh).take(5)}")
  }

  test("minhash LSH equals exact ngram jaccard at gate scale (sf0.1)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val mh = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleK = 3, m = 128, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleK = 3, threshold = 0.5, maxShingleDf = Long.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(mh == exact,
      s"q_dedup_minhash_lsh's exact oracle premise broke at gate scale: " +
        s"minhash=${mh.size} exact=${exact.size}")
  }

  test("ANN gate recall bars hold at gate scale (sf0.1) with the GATE's parameters") {
    import spark.implicits._
    // `q_ann_ivf_topk` / `q_ann_lsh_topk` have no SQL oracle — their
    // correctness bar is recall vs brute force. The suite pins those bars
    // at suite scale with tuned parameters; HERE they are asserted at the
    // driver's gate scale with the exact parameters the gates pass
    // (SparkEntry: ivfTopK(k=10, nCells=16, nProbe=8, nAssign=2),
    // lshTopK(k=10, nPlanes=8)), so corpus drift fails loudly instead of
    // silently degrading the no-oracle gates. (This pin caught a real
    // one: the gate originally passed nProbe=4/nAssign=1, which measures
    // 0.525 recall@10 at sf0.1 — the gate now uses the tuned recipe.)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 4)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val brute = pairs(Ann.bruteForceTopK(emb, queries, k = 10))
    assert(brute.size == 40)
    val ivf = pairs(Ann.ivfTopK(emb, queries, k = 10, nCells = 16, nProbe = 8, nAssign = 2))
    val ivfRecall = (ivf & brute).size.toDouble / brute.size
    val lsh = pairs(Ann.lshTopK(emb, queries, k = 10, nPlanes = 8))
    val lshRecall = (lsh & brute).size.toDouble / brute.size
    info(f"gate-scale recall@10: ivf=$ivfRecall%.3f lsh=$lshRecall%.3f")
    assert(ivfRecall >= 0.9, s"q_ann_ivf_topk recall@10 $ivfRecall < 0.9 at gate scale")
    assert(lshRecall >= 0.8, s"q_ann_lsh_topk recall@10 $lshRecall < 0.8 at gate scale")
  }

  test("no shingle df exceeds the default guard at gate scale (sf0.1)") {
    import spark.implicits._
    val maxDf = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (_, t) =>
        Dedup.shingles(graft.analysis.Analyzer.tokenize(t), 3).distinct.toSeq
      }
      .groupByKey(identity).count()
      .map(_._2).reduce(math.max)
    assert(maxDf <= Dedup.DefaultMaxShingleDf,
      s"hottest shingle df=$maxDf exceeds the default guard " +
        s"(${Dedup.DefaultMaxShingleDf}) — q_dedup_ngram_jaccard_bounded's " +
        "shared oracle premise no longer holds")
  }

  test("no 8-token window df exceeds the default guard at gate scale (sf0.1)") {
    import spark.implicits._
    // q_dedup_passage runs the bounded default against the exact oracle —
    // valid only while the hot-window guard is a no-op on this corpus
    val maxDf = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (_, t) =>
        Dedup.tokenWindows(graft.analysis.Analyzer.tokenize(t), 8).distinct.toSeq
      }
      .groupByKey(identity).count()
      .map(_._2).reduce(math.max)
    assert(maxDf <= Dedup.DefaultMaxShingleDf,
      s"hottest 8-token window df=$maxDf exceeds the default guard " +
        s"(${Dedup.DefaultMaxShingleDf}) — q_dedup_passage's exact oracle " +
        "premise no longer holds")
  }
}
