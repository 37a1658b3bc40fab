package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.{Analyzer, functions => ga}
import graft.index.BM25

/** Brute-force BM25 scorer over the raw corpus — the in-repo "reference
  * behavior" for rank-identity tests (SURVEY.md §5.2). Deliberately simple:
  * tokenize → explode → tf → score → deterministic fold. Uses the exact
  * same scalar arithmetic as the WAND evaluator (graft.index.BM25), with
  * per-term contributions folded in ascending term order, so scores are
  * bit-identical, not merely approximately equal.
  */
object OracleScorer {

  /** Exact top-k (doc_id, score) by brute force over docs(doc_id, text). */
  def topK(spark: SparkSession, docs: DataFrame, query: String, k: Int): DataFrame = {
    import spark.implicits._
    val qTerms = Analyzer.tokenize(query).distinct.sorted
    if (qTerms.isEmpty) {
      return spark.createDataFrame(Seq.empty[(Long, Double)]).toDF("doc_id", "score")
    }
    val withToks = docs.select(
      col("doc_id").cast("long").as("doc_id"),
      ga.tokenize(col("text")).as("toks"))
    val corpus = withToks.agg(count(lit(1)), avg(size(col("toks")))).head()
    val nDocs = corpus.getLong(0)
    val avgdl = corpus.getDouble(1)

    val tf = withToks
      .select(col("doc_id"), size(col("toks")).as("doclen"), explode(col("toks")).as("term"))
      .filter(col("term").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("doclen"), col("term"))
      .agg(count(lit(1)).as("tf"))

    val dfMap = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (dfMap.isEmpty) {
      return spark.createDataFrame(Seq.empty[(Long, Double)]).toDF("doc_id", "score")
    }

    val scored = tf.as[(Long, Int, String, Long)]
      .groupByKey(_._1)
      .mapGroups { (docId, rows) =>
        val contribs = rows.map { case (_, dl, term, f) =>
          (term, BM25.score(f, dl.toLong, avgdl, nDocs, dfMap(term)))
        }.toArray.sortBy(_._1)
        var s = 0.0
        contribs.foreach { case (_, c) => s += c }
        (docId, s)
      }
      .toDF("doc_id", "score")

    scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
  }
}
