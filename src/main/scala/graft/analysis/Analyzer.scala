package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Standard-analyzer-style tokenizer: Unicode letter/number runs, lowercased.
  *
  * Semantics pinned by the reference's delegated Lucene defaults (see
  * SURVEY.md §2.11): the reference never configures a custom analyzer
  * (reference index_cleanup.py:179-184 round-trips mappings untouched), so
  * `text` fields get the standard analyzer = word segmentation + lowercase,
  * no stopwords. We define token characters as Unicode categories L* and N*
  * (the `[\p{L}\p{N}]+` contract, identical to the DuckDB oracle regex),
  * lowercased per code point with the ROOT locale's simple mapping.
  *
  * The kernel is pure and allocation-lean: one pass over code points, no
  * regex. The per-row invariant from the north rule — byte-identical token
  * stream per url across runs and parallelism — holds because this is a
  * deterministic function of the input string only.
  */
object Analyzer {

  private final val TokenCharMask: Int =
    (1 << Character.UPPERCASE_LETTER) |
      (1 << Character.LOWERCASE_LETTER) |
      (1 << Character.TITLECASE_LETTER) |
      (1 << Character.MODIFIER_LETTER) |
      (1 << Character.OTHER_LETTER) |
      (1 << Character.DECIMAL_DIGIT_NUMBER) |
      (1 << Character.LETTER_NUMBER) |
      (1 << Character.OTHER_NUMBER)

  @inline def isTokenChar(cp: Int): Boolean =
    ((TokenCharMask >> Character.getType(cp)) & 1) != 0

  /** Tokenize into lowercase terms. Null-safe (null → empty). */
  def tokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty[String]
    val out = new ArrayBuffer[String](16)
    val sb = new java.lang.StringBuilder(16)
    val n = text.length
    var i = 0
    while (i < n) {
      val cp = text.codePointAt(i)
      if (isTokenChar(cp)) {
        sb.appendCodePoint(Character.toLowerCase(cp))
      } else if (sb.length > 0) {
        out += sb.toString
        sb.setLength(0)
      }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** Number of tokens without materializing them (doclen fast path). */
  def countTokens(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    var count = 0
    var inTok = false
    val n = text.length
    var i = 0
    while (i < n) {
      val cp = text.codePointAt(i)
      if (isTokenChar(cp)) { if (!inTok) { count += 1; inTok = true } }
      else inTok = false
      i += Character.charCount(cp)
    }
    count
  }
}
