package graft
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
/** Manual harness: drive StreamIngest through the public API. */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val base = Files.createTempDirectory("graft-ssmoke-").toString
    val df = Seq((1L, " a ", 1.0), (2L, "b", 2.0)).toDF("id", "name", "value")
    df.write.parquet(s"$base/src")
    val q = graft.streaming.StreamIngest.docStream(spark, s"$base/src", df.schema,
      s"$base/staging", s"$base/ledger", s"$base/ckpt")
    q.processAllAvailable(); q.stop()
    println(s"[ssmoke] staged=${spark.read.parquet(s"$base/staging").count()}")
    println(s"[ssmoke] ledger=${spark.read.parquet(s"$base/ledger").collect().mkString}")
    // probe: empty second drain (no new files) must be a clean no-op
    val q2 = graft.streaming.StreamIngest.docStream(spark, s"$base/src", df.schema,
      s"$base/staging", s"$base/ledger", s"$base/ckpt")
    q2.processAllAvailable(); q2.stop()
    println(s"[ssmoke] after-noop staged=${spark.read.parquet(s"$base/staging").count()}")
    spark.stop()
  }
}
