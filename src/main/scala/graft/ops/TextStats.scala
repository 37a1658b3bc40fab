package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.analysis.{functions => ga}

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword heuristic), quality scoring, token counting, and document
  * fingerprinting. All are pure per-row column expressions (no shuffle,
  * fully codegen) — they stream over 100 TB at scan speed.
  */
object TextStats {

  /** Per-language stopword marker sets for the n-gram/stopword heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "en"))

  private def toks(textCol: Column): Column = ga.tokenize(textCol)

  /** Fraction of tokens that are in `set` (0 for empty docs). */
  def stopwordRatio(textCol: Column, set: Seq[String]): Column = {
    val t = toks(textCol)
    when(size(t) === 0, lit(0.0)).otherwise(
      size(filter(t, x => x.isin(set.map(lit(_)): _*))).cast("double") / size(t))
  }

  /** Language-ID heuristic: argmax of per-language stopword ratios with a
    * minimum evidence floor; deterministic tie-break by language code.
    * Below the floor → "und" (undetermined).
    */
  def langId(textCol: Column, floor: Double = 0.05): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, set) =>
      struct(stopwordRatio(textCol, set).as("ratio"), lit(lang).as("lang"))
    }
    // array_max on struct compares field-by-field: (ratio, lang); equal
    // ratios pick the lexicographically-largest lang — invert via sort to
    // keep smallest-lang determinism: sort desc by ratio, asc by lang.
    val best = sort_array(array(scored: _*), asc = false)(0)
    when(best.getField("ratio") < floor, lit("und"))
      .otherwise(best.getField("lang"))
  }

  def tokenCount(textCol: Column): Column = ga.token_count(textCol)

  /** GPT-style pre-tokenizer pattern: letter runs, digit runs, and
    * non-space symbol runs each count as one token — the cheap,
    * vocabulary-free approximation of a BPE tokenizer's pre-split,
    * good for corpus token budgeting without shipping a merges table.
    */
  final val BpePreTokenPattern = "[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]+"

  /** Approximate BPE token count (pre-tokenizer splits, no merges):
    * a single codegen'd regexp_count — no array materialization.
    */
  def bpeTokenCount(textCol: Column): Column =
    regexp_count(textCol, lit(BpePreTokenPattern))

  /** Quality score in [0,1]: blend of length saturation, alphabetic
    * character ratio, and English stopword presence — the standard cheap
    * web-text quality gates (length/punct/stopword ratios).
    */
  def qualityScore(textCol: Column): Column = {
    val nTok = ga.token_count(textCol).cast("double")
    val lengthScore = least(nTok / lit(64.0), lit(1.0))
    val nChars = length(textCol).cast("double")
    val alphaChars = length(regexp_replace(textCol, "[^A-Za-z]", "")).cast("double")
    val alphaRatio = when(nChars === 0, lit(0.0)).otherwise(alphaChars / nChars)
    val stopScore = least(stopwordRatio(textCol, stopwords("en")) * lit(4.0), lit(1.0))
    round(lit(0.4) * lengthScore + lit(0.4) * alphaRatio + lit(0.2) * stopScore, 6)
  }

  /** Token-level repetition: fraction of tokens that are repeats of an
    * earlier token (1 - distinct/total; 0 for empty docs). One of the
    * standard web-corpus boilerplate/spam signals (Gopher-rule family).
    */
  def dupTokenRatio(textCol: Column): Column = {
    val t = toks(textCol)
    when(size(t) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(t)).cast("double") / size(t))
  }

  /** Fraction of the document's 2-grams occupied by its single most
    * frequent 2-gram (0 when fewer than two tokens) — the "top n-gram
    * fraction" repetition rule for flagging templated/looping text.
    * Pure column expression: sort the row's bigrams, fold once counting
    * the longest equal run (O(n log n) per row, fully codegen, no
    * shuffle) — streams at scan speed like the other quality gates.
    */
  def topBigramFraction(textCol: Column): Column = {
    val t = toks(textCol)
    val n = size(t)
    val bg = transform(sequence(lit(1), n - 1),
      i => concat(element_at(t, i), lit(" "), element_at(t, i + 1)))
    val zero = struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best"))
    val folded = aggregate(
      sort_array(bg),
      zero,
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(n < 2, lit(0.0)).otherwise(folded.cast("double") / (n - 1))
  }

  /** Normalized content fingerprint: md5 of the analyzed token stream —
    * robust to whitespace/punctuation/case variance (near-exact dedup key).
    */
  def fingerprint(textCol: Column): Column =
    md5(array_join(toks(textCol), " "))

  /** Winnowing fingerprint (rolling-hash document sketch): min hash in
    * each sliding window of `window` k-gram hashes, deduplicated — the
    * classic local document fingerprint for plagiarism-style matching.
    */
  def winnow(tokens: Array[String], k: Int = 4, window: Int = 8): Array[Long] = {
    val grams = Dedup.shingles(tokens, k).map(Hash64(_))
    if (grams.isEmpty) return Array.empty
    if (grams.length <= window) return Array(grams.min)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var i = 0
    while (i + window <= grams.length) {
      var m = grams(i)
      var j = i + 1
      while (j < i + window) { if (grams(j) < m) m = grams(j); j += 1 }
      out += m
      i += 1
    }
    out.toArray
  }
}
