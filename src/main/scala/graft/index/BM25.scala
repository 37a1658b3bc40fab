package graft.index

/** BM25 with the reference's delegated defaults (SURVEY.md §2.11): the
  * reference never overrides `similarity`, so scoring is OpenSearch/Lucene
  * default BM25 with k1=1.2, b=0.75 and
  * idf = ln(1 + (N - df + 0.5) / (df + 0.5)).
  * Unlike Lucene we use exact doclen (no norm quantization) — the in-repo
  * oracle uses the identical formula so rank-identity is well defined.
  * Ties break by ascending docID everywhere.
  */
object BM25 {
  final val K1 = 1.2
  final val B = 0.75

  @inline def idf(nDocs: Long, df: Long): Double =
    math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))

  /** tf normalization: tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)). */
  @inline def tfNorm(tf: Long, dl: Long, avgdl: Double): Double =
    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))

  @inline def score(tf: Long, dl: Long, avgdl: Double, nDocs: Long, df: Long): Double =
    idf(nDocs, df) * tfNorm(tf, dl, avgdl)
}
