package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Manual harness: drive IVF ANN + header sniffing through the public API. */
object IvfSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val hits = graft.ops.Ann.ivfTopK(emb, emb.filter(col("vec_id") === 0), k = 5)
    hits.collect().foreach(r => println(s"[ivf] $r"))
    // probe: query vector absent from the corpus (synthetic id)
    import spark.implicits._
    val ghost = Seq((999999L, Array.fill(64)(0.1f))).toDF("vec_id", "embedding")
    val g = graft.ops.Ann.ivfTopK(emb, ghost, k = 3)
    println(s"[ivf] ghost-query rows=${g.count()}")
    spark.stop()
  }
}
