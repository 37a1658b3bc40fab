package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Ann
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def t[T](tag: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"[probe] $tag%-22s ${(System.nanoTime()-t0)/1e9}%.2fs") ; r }
    val nPlanes = 6; val nTables = 8; val seed = 42L
    val dim = 64
    val tables = Array.tabulate(nTables)(t => Ann.hyperplanes(dim, nPlanes, seed + 7919L * t))
    val keysOf = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      val keys = Array.newBuilder[Long]
      var t = 0
      while (t < tables.length) {
        val base = Ann.signBucket(arr, tables(t))
        val tag = t.toLong << (nPlanes + 1)
        keys += (tag | base)
        var b = 0
        while (b < nPlanes) { keys += (tag | (base ^ (1L << b))); b += 1 }
        t += 1
      }
      keys.result()
    }
    val vecs = emb.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("vn", sqrt(graft.analysis.functions.dot(col("v"), col("v"))))
      .persist()
    t("vecs count")(vecs.count())
    val entries = vecs.select(col("id"), explode(keysOf(col("v"))).as("key")).persist()
    t("entries")(println("[probe] n_entries=" + entries.count()))
    val okKeys = entries.groupBy("key").agg(count(lit(1)).as("n")).filter(col("n").between(2, 4096)).select("key")
    val bounded = entries.join(okKeys, Seq("key"), "left_semi").repartition(128, col("key")).persist()
    t("bounded")(println("[probe] n_bounded=" + bounded.count()))
    val pairs = bounded.select(col("key"), col("id").as("id_a")).hint("shuffle_hash")
      .join(bounded.select(col("key"), col("id").as("id_b")), "key")
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
    val rawCnt = t("raw pair join")(pairs.count())
    println("[probe] n_rawpairs=" + rawCnt)
    val dp = pairs.distinct().persist()
    t("distinct")(println("[probe] n_pairs=" + dp.count()))
    val verified = dp
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a"), col("vn").as("na")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b"), col("vn").as("nb")), "id_b")
      .withColumn("cosine", graft.analysis.functions.dot(col("v_a"), col("v_b")) / (col("na") * col("nb")))
      .filter(col("cosine") >= 0.4)
    t("verify")(println("[probe] n_out=" + verified.count()))
    spark.stop()
  }
}
