package graft

/** One-off probe: build throughput per mode in a caller-chosen order, to
  * separate payload cost from the host's band drift / JVM warm-order
  * effects. Usage: Test/runMain graft.OrderProbe <cores> <nDocs> on,off,on,off
  */
object OrderProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val order = args(2).split(",").toSeq
    Bench.buildThroughput(cores, 50000L, positional = order.head == "on") // JIT warm
    order.foreach { m =>
      val d = Bench.buildThroughput(cores, n, positional = m == "on")
      println(f"[orderprobe] $m%s ${d}%.1f docs/s")
    }
  }
}
