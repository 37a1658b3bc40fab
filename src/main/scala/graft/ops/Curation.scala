package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.{functions => ga}

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/quality: benchmark decontamination, deterministic
  * stratified sampling (domain mixing), and fixed-window sequence
  * chunking. All three are scan-shaped or broadcast-joined — no corpus
  * shuffle — so they compose into the cleaning pass at any scale.
  */
object Curation {

  /** Test-set decontamination: flag corpus documents sharing at least
    * `minOverlap` distinct word `k`-gram shingles with ANY benchmark
    * document (the standard n-gram overlap rule for removing eval
    * contamination from pretraining data).
    *
    * Scale shape: benchmark sets are small (thousands of examples), so
    * their distinct shingle set rides a broadcast join; the corpus side
    * is one scan-shaped flatMap. The only shuffle is the per-doc overlap
    * count, over the matched (doc, shingle) pairs — a vanishing fraction
    * of the corpus when contamination is rare (always at web scale).
    *
    * Returns (idCol, n_hits) for flagged documents.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      shingleK: Int = 3, minOverlap: Long = 1L): DataFrame = {
    // one codegen pass per side (tokenize → k-gram → distinct 128-bit
    // hashes, no typed-Dataset ser/de); the broadcast and the overlap
    // count move 16-byte keys instead of raw shingle strings
    def shingleRows(df: DataFrame) = df
      .select(col(idCol).cast("long").as("id"),
        dedupFunctions.shingleHashes(col(textCol), shingleK, whole = true).as("shs"))
      .select(col("id"), explode(col("shs")).as("s"))
      .select(col("id"), col("s.h1").as("h1"), col("s.h2").as("h2"))
    val benchShingles = shingleRows(benchmark).select("h1", "h2").distinct()
    // spread the corpus scan before the analyze expression: a small
    // corpus arrives as one file split (one core); at scale the input's
    // own splits provide the width and the spread is a no-op. Project to
    // (id, text) FIRST so no unused column rides the spread exchange.
    val parts = corpus.sparkSession.sessionState.conf.numShufflePartitions
    shingleRows(Dedup.spread(corpus.select(col(idCol), col(textCol)), parts, idCol))
      .join(broadcast(benchShingles), Seq("h1", "h2"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minOverlap)
      .select(col("id").as(idCol), col("n_hits"))
  }

  /** Deterministic stratified sampling for domain mixing: keep a
    * per-stratum fraction of rows, decided by a fixed hash of the id —
    * reproducible across runs, partitionings, and engines, unlike
    * Bernoulli RNG sampling (`df.sampleBy`), and exactly the property a
    * training-mix spec needs ("30% of web, 100% of wiki" must mean the
    * SAME documents every rebuild). Pure filter: scan-shaped, pushes
    * into the source when the columns allow.
    *
    * The hash is `((id mod 100003) * 2654435761) mod 1000 < frac*1000`
    * (Knuth multiplicative on a prime-bounded id; all arithmetic exact in
    * 64-bit — cross-engine reproducible by construction). Fractions are
    * quantized to 1/1000.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    val bucket = hashBucket(col(idCol))
    // round, not truncate: (0.3 * 1000).toInt is 299 from the binary-float
    // representation — silently off the documented 1/1000 quantization
    val thresh = fractions.foldLeft(lit(math.round(defaultFraction * 1000).toInt): Column) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(math.round(f * 1000).toInt)).otherwise(acc)
    }
    df.filter(bucket < thresh)
  }

  /** The sampling hash bucket in [0, 1000) — exposed so oracle SQL can
    * mirror it verbatim. Non-negative residue (pmod) so negative ids land
    * in a real bucket instead of always passing the `< threshold` test.
    */
  def hashBucket(id: Column): Column =
    pmod((id.cast("long") % 100003L) * 2654435761L, lit(1000L))

  /** Fixed-size token windows with stride (training sequence chunking):
    * each document explodes into ceil((len - window)/stride) + 1 windows
    * of at most `window` tokens starting every `stride` tokens (overlap =
    * window - stride). Scan-shaped: tokenize + per-row explode, no
    * shuffle; window construction is a codegen'd array slice.
    *
    * Returns (idCol, win_id, chunk, n_tokens).
    */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
      window: Int = 64, stride: Int = 32): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window")
    val toks = ga.tokenize(col(textCol))
    val n = size(toks)
    // ceil((n - window) / stride) + 1, floored at 1 window (short/empty
    // docs); floor() because Column `/` is double division
    val nWin = when(n <= window, lit(1))
      .otherwise(floor((n - window + stride - 1) / stride).cast("int") + 1)
    df.select(col(idCol), toks.as("__toks"), nWin.as("__nwin"))
      .select(col(idCol), col("__toks"),
        posexplode(expr("sequence(0, __nwin - 1)")).as(Seq("win_id", "__i")))
      .select(
        col(idCol),
        col("win_id"),
        concat_ws(" ", slice(col("__toks"), col("win_id") * stride + 1, lit(window)))
          .as("chunk"),
        greatest(least(lit(window), size(col("__toks")) - col("win_id") * stride), lit(0))
          .cast("long").as("n_tokens"))
  }
}
