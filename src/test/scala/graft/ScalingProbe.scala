package graft
/** Manual harness: isolate the 2-parallelism index-build scaling phase. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "200000").toLong
    val cores = args.headOption.map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(8, 32))
    val res = cores.map(c => c -> Bench.buildThroughput(c, n))
    res.foreach { case (c, dps) => println(f"[scaling] local[$c] docs/sec=$dps%.1f") }
    if (res.size == 2)
      println(f"[scaling] efficiency=${(res(1)._2 / res(0)._2) / (res(1)._1.toDouble / res(0)._1)}%.3f")
  }
}
