package graft
import org.apache.spark.sql.SparkSession
/** Manual harness: drive BulkFormat through the public API. */
object BulkSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val df = Seq(("a1", "x", 1.0), (null, "y", 2.0)).toDF("id", "name", "v")
    graft.ingest.BulkFormat.toBulkNdjson(df, "idx").collect()
      .foreach(e => println(s"[bulk] ${e.replace("\n", " | ")}"))
    // probe: a frame WITHOUT an id column → insert-only actions
    val noId = Seq(("z", 3.0)).toDF("name", "v")
    graft.ingest.BulkFormat.toBulkNdjson(noId, "idx").collect()
      .foreach(e => println(s"[bulk-noid] ${e.replace("\n", " | ")}"))
    spark.stop()
  }
}
