package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.VByte

/** Property-style tests with a seeded RNG (deterministic, no extra deps). */
class VByteSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("round-trip: decode(encode(xs)) == xs for non-negative longs") {
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(300)
      val a = Array.fill(n)(rnd.nextLong() & Long.MaxValue)
      assert(VByte.decode(VByte.encode(a), n).toSeq == a.toSeq)
    }
  }

  test("round-trip for small tf-like values") {
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(300)
      val a = Array.fill(n)(1L + rnd.nextInt(1000))
      assert(VByte.decode(VByte.encode(a), n).toSeq == a.toSeq)
    }
  }

  test("delta round-trip for sorted docID runs") {
    for (_ <- 1 to 200) {
      val base = rnd.nextLong() & ((1L << 40) - 1)
      val n = 1 + rnd.nextInt(300)
      val docs = Array.iterate(base + 1 + rnd.nextInt(50), n)(d => d + 1 + rnd.nextInt(100000))
      val rt = VByte.undeltas(base, VByte.deltasFrom(base, docs))
      assert(rt.toSeq == docs.toSeq)
    }
  }

  test("encoded size: single byte for values < 128") {
    val a = Array.tabulate(128)(_.toLong)
    assert(VByte.encode(a).length == 128)
    // boundary: 128 takes two bytes
    assert(VByte.encode(Array(128L)).length == 2)
    assert(VByte.encode(Array(127L)).length == 1)
  }

  test("packInts round-trip incl. negatives and extremes") {
    val fixed = Array(Int.MinValue, -1, 0, 1, Int.MaxValue)
    assert(VByte.unpackInts(VByte.packInts(fixed)).toSeq == fixed.toSeq)
    for (_ <- 1 to 100) {
      val a = Array.fill(rnd.nextInt(200))(rnd.nextInt())
      assert(VByte.unpackInts(VByte.packInts(a)).toSeq == a.toSeq)
    }
  }
}
