package graft
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{IndexBuilder, IndexStore}
object ClusterProbe {
  def buildAt(master: String, shufflePartitions: Int, n: Long): Double = {
    val spark = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.executor.memory", "8g")
      .config("spark.jars", sys.env.getOrElse("GRAFT_JAR", ""))
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      val docs = Corpus.pages(spark, n)
        .withColumn("doc_id", regexp_extract(col("url"), "/p/(\\d+)$", 1).cast("long"))
        .select("doc_id", "url", "text", "lang")
        .repartition(shufflePartitions)
      val store = new IndexStore(Files.createTempDirectory("graft-cl-").toString)
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, docs, store, IndexBuilder.Config(segSize = 1 << 14, blockSize = 128))
      val sec = (System.nanoTime() - t0) / 1e9
      store.dropAll()
      n / sec
    } finally spark.stop()
  }
  def main(args: Array[String]): Unit = {
    val n = 200000L
    for (spec <- args.headOption.getOrElse("1,4").split("\\+")) {
      val Array(execs, cores) = spec.split(",").map(_.toInt)
      val dps = buildAt(s"local-cluster[$execs,$cores,8192]", execs * cores * 4, n)
      println(f"[cluster] execs=$execs cores=$cores docs/sec=$dps%.1f")
    }
  }
}
