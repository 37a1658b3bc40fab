package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val res = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, Long.MaxValue)
    res.collect()
    val p = res.queryExecution.executedPlan.toString
    // partition count of the expansion join stage
    println("[plan] shuffledHashJoin=" + p.contains("ShuffledHashJoin"))
    "partitioning=hashpartitioning\\([^)]*, (\\d+)\\)".r.findAllMatchIn(p).map(_.group(1)).toSeq.distinct
      .foreach(n => println("[plan] hashpartitioning n=" + n))
    println("[plan] AQEShuffleRead coalesced=" + "AQEShuffleRead coalesced".r.findAllIn(p).size)
    spark.stop()
  }
}
