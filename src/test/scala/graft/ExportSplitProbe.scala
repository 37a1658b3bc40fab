package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Round-7 probe for VERDICT #6: split q_bm25_export_shard_top10's cost
  * into export-write vs cluster-open vs query, and compare the exported
  * per-shard open against `Serving.openShard` over the same index.
  *
  *   Test/runMain graft.ExportSplitProbe [sfDir]
  */
object ExportSplitProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val idx = SparkEntry.indexFor(spark, sf)
    val out = Files.createTempDirectory("graft-export-probe-").toString
    val (_, tExport) = timed(
      graft.query.ServingLayout.exportShards(spark, idx.store, out, nShards = 3))
    // open twice: first pays any FS-cache cold costs, second is steady
    val (_, tOpen1) = timed(
      graft.query.ServingLayout.openExportedCluster(spark, out, 2L << 30))
    val (cluster, tOpen2) = timed(
      graft.query.ServingLayout.openExportedCluster(spark, out, 2L << 30))
    val (_, tShardOpen) = timed(
      graft.query.ServingLayout.openExportedShard(spark, out, 0, 2L << 30))
    val (_, tServOpen) = timed(graft.query.Serving.openShard(idx, 0, 3, 2L << 30))
    val (_, tQuery) = timed(cluster.topK("spark index dup", 10))
    val (_, tQuery2) = timed(cluster.topK("spark index dup", 10))
    println(f"[export-split] export=${tExport}%.3fs open1=${tOpen1}%.3fs " +
      f"open2=${tOpen2}%.3fs shardOpen(exported)=${tShardOpen}%.3fs " +
      f"shardOpen(inproc)=${tServOpen}%.3fs query1=${tQuery * 1000}%.2fms " +
      f"query2=${tQuery2 * 1000}%.2fms")
    spark.stop()
  }
}
