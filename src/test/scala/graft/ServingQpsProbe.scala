package graft

import org.apache.spark.sql.SparkSession

/** One-off probe: serving term-query qps (single thread), for kernel-level
  * comparisons. Usage: Test/runMain graft.ServingQpsProbe [sfDir]
  */
object ServingQpsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val serving = graft.query.Serving.open(
      SparkEntry.indexFor(spark, sfDir), maxBytes = 2L << 30)
    val qs = Seq("spark index dup", "the data web", "dup", "the web crawl merge")
    def qps(n: Int): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { serving.topK(qs(i % qs.size), 10); i += 1 }
      n / ((System.nanoTime() - t0) / 1e9)
    }
    qps(500) // warm
    val best = (1 to 3).map(_ => qps(3000)).max
    println(f"[servingqps] $best%.0f q/s")
    spark.stop()
  }
}
