package graft

import org.apache.spark.sql.SparkSession

/** One-off probe: serving phrase qps with/without the hot-phrase
  * decoded-positions cache. Usage: Test/runMain graft.PhraseQpsProbe [sfDir]
  */
object PhraseQpsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val idx = SparkEntry.indexFor(spark, sfDir)
    val phrases = Seq("table hash", "merge group", "slow key")
    def qps(s: graft.query.ServingIndex, n: Int): Double = {
      s.phraseTopK(phrases.head, 10) // warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { s.phraseTopK(phrases(i % phrases.size), 10); i += 1 }
      n / ((System.nanoTime() - t0) / 1e9)
    }
    val cached = graft.query.Serving.open(idx, maxBytes = 2L << 30)
    val uncached = graft.query.Serving.open(idx, maxBytes = 1L) // no headroom
    // interleaved best-of-3 per mode (band noise)
    var (qc, qu) = (0.0, 0.0)
    for (_ <- 1 to 3) {
      qu = math.max(qu, qps(uncached, 400))
      qc = math.max(qc, qps(cached, 2000))
    }
    println(f"[phraseqps] cached=$qc%.0f uncached=$qu%.0f ratio=${qc / qu}%.2f")
    spark.stop()
  }
}
