package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Common-Crawl-style page row (BASELINE.json input_hint):
  * (url, warc_ts, html, text, lang). `html` is an opaque binary column the
  * index pipeline must never read (column-pruning check).
  */
case class Page(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

/** Deterministic seeded corpus generator (FIXTURES.md §1): generated
  * distributed from `spark.range` — each row is a pure function of
  * (seed, id), so any parallelism level produces byte-identical rows
  * (the per-row invariant the north rule requires). Text is a
  * Zipf-distributed token stream over a fixed vocabulary — head terms land
  * in ~half the docs, exercising postings skew — plus a unique per-doc
  * marker token for exact-hit tests.
  */
object Corpus {

  private final val BaseEpochMs = 1747958400000L // 2025-05-23T00:00:00Z (reference snapshot date)

  val vocabulary: Array[String] = {
    val head = Array("the", "of", "and", "to", "a", "in", "is", "it", "for", "on")
    val mid = Array("web", "page", "data", "index", "search", "query", "score",
      "term", "crawl", "link", "text", "spark", "shard", "merge", "block",
      "posting", "token", "rank", "fast", "slow", "engine", "cache", "store",
      "batch", "scan", "join", "sort", "hash", "key", "value")
    val tail = (0 until 960).map(i => s"w$i").toArray
    head ++ mid ++ tail
  }

  /** Zipf(1.0) cumulative distribution over the vocabulary. */
  private lazy val cdf: Array[Double] = {
    val w = vocabulary.indices.map(i => 1.0 / (i + 1)).toArray
    val total = w.sum
    val out = new Array[Double](w.length)
    var acc = 0.0
    var i = 0
    while (i < w.length) { acc += w(i) / total; out(i) = acc; i += 1 }
    out(w.length - 1) = 1.0
    out
  }

  @inline private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Build one page deterministically from (seed, id). */
  def page(seed: Long, id: Long): Page = {
    var state = splitmix64(seed ^ splitmix64(id))
    def nextLong(): Long = { state = splitmix64(state); state }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16

    val host = math.floorMod(nextLong(), 100L)
    val url = s"https://host$host.example/p/$id"
    val nTokens = 40 + math.floorMod(nextLong(), 120L).toInt
    val sb = new java.lang.StringBuilder(nTokens * 6)
    var i = 0
    while (i < nTokens) {
      val u = nextDouble()
      var idx = java.util.Arrays.binarySearch(cdf, u)
      if (idx < 0) idx = -idx - 1
      if (idx >= vocabulary.length) idx = vocabulary.length - 1
      if (i > 0) sb.append(' ')
      sb.append(vocabulary(idx))
      i += 1
    }
    sb.append(" docmark").append(id) // unique exact-hit marker
    val text = sb.toString
    val lang = {
      val r = math.floorMod(nextLong(), 100L)
      if (r < 90) "en" else if (r < 94) "de" else if (r < 97) "fr" else "es"
    }
    val ts = new Timestamp(BaseEpochMs + math.floorMod(nextLong(), 86400000L))
    val html = ("<html><body>" + text + "</body></html>").getBytes("UTF-8")
    Page(url, ts, html, text, lang)
  }

  def pages(spark: SparkSession, nDocs: Long, seed: Long = 42L): Dataset[Page] = {
    import spark.implicits._
    spark.range(nDocs).map(id => page(seed, id))
  }
}

/** Deterministic dense docID assignment (SURVEY.md §2.8): the Spark
  * analogue of zipWithIndex without RDDs and without a single-partition
  * window. Two passes:
  *   1. bucket rows by a stable hash range of the key; per-bucket counts
  *      → exclusive scan on the driver (bucket count is small and fixed);
  *   2. row_number within each bucket ordered by key + broadcast offset.
  * The resulting IDs are a deterministic permutation (bucket asc, key asc)
  * independent of parallelism — never `monotonically_increasing_id`.
  */
object DocIds {
  def assign(df: DataFrame, keyCol: String, buckets: Int = 1024,
      outCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = pmod(xxhash64(col(keyCol)), lit(buckets)).cast("int")
    val withB = df.withColumn("__bucket", bucket)
    val counts = withB.groupBy("__bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val exclusiveScan = counts.scanLeft(0L)(_ + _._2).dropRight(1)
    val offsetMap = typedlit(counts.map(_._1).zip(exclusiveScan).toMap)
    val w = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
    withB
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn(outCol, element_at(offsetMap, col("__bucket")) + col("__rn") - 1)
      .drop("__bucket", "__rn")
  }
}
