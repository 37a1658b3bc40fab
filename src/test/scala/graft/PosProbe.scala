package graft

/** One-off probe: index-build throughput with and without the positional
  * payload, same corpus and width (the Lucene IndexOptions cost, measured).
  * Usage: Test/runMain graft.PosProbe [cores] [nDocs]
  */
object PosProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val n = args.lift(1).map(_.toLong).getOrElse(400000L)
    // warm the JVM off the record, then interleaved best-of-2 per mode —
    // single-shot cross-run comparisons on this host measure the band,
    // not the payload
    Bench.buildThroughput(cores, math.min(n, 50000L), positional = false)
    var (off, on) = (0.0, 0.0)
    for (_ <- 1 to 2) {
      off = math.max(off, Bench.buildThroughput(cores, n, positional = false))
      on = math.max(on, Bench.buildThroughput(cores, n, positional = true))
    }
    println(f"[posprobe] cores=$cores docs/s off=$off%.1f on=$on%.1f ratio=${on / off}%.3f")
  }
}
