package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{Codecs, PostingBlock, VByte}

/** Eviction policy of the bounded serving decode cache: CLOCK /
  * second-chance, not plain FIFO — a hot block inserted early must
  * survive a cold scan that would have FIFO-thrashed it out.
  */
class CacheSpec extends AnyFunSuite {

  private def block(i: Int, n: Int = 8): PostingBlock = {
    val docs = Array.tabulate(n)(j => (i * 1000 + j * 2).toLong)
    val deltas = VByte.deltasFrom(docs(0), docs)
    PostingBlock(s"t$i", 0, i, n, docs(0), docs(n - 1), 1L, 10, n.toLong,
      Codecs.VB, VByte.encode(deltas), VByte.encode(Array.fill(n)(1L)))
  }

  private def bytes(n: Int) = Serving.decodedBytes(block(0, n))

  test("hot block inserted first survives a cold scan (second chance)") {
    val hot = block(0)
    // budget holds ~4 decoded blocks
    val cache = new ClockDecodeCache(4 * bytes(8))
    val hotDecoded = cache.get(hot)
    assert(hotDecoded._1(0) == 0L)
    // interleave: touch the hot block between cold misses, as a real
    // warm-set workload does — under FIFO the hot block dies at the 4th
    // cold insert regardless of its hits
    val coldHits = (1 to 40).map { i =>
      cache.get(block(i))
      cache.get(hot) eq hotDecoded
    }
    assert(coldHits.forall(identity),
      "a repeatedly-hit block must keep its decoded entry through cold churn")
    assert(cache.loadedBytes <= 4 * bytes(8))
  }

  test("unreferenced entries still evict — budget holds under pure churn") {
    val cache = new ClockDecodeCache(4 * bytes(8))
    (1 to 100).foreach(i => cache.get(block(i)))
    assert(cache.loadedBytes <= 4 * bytes(8))
    // correctness is unconditional: evicted blocks re-decode identically
    val b = block(7)
    assert(cache.get(b)._1.toSeq == VByte.undeltas(b.firstDoc,
      VByte.decode(b.docDeltas, b.n)).toSeq)
  }
}
