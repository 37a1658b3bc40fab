package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{Codecs, PFor, VByte}

class PForSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(7)

  test("round-trip: uniform, skewed, and edge distributions") {
    def check(a: Array[Long]): Unit =
      assert(PFor.decode(PFor.encode(a), a.length).toSeq == a.toSeq, a.take(10).toSeq)
    check(Array.empty[Long])
    check(Array(0L))
    check(Array(Long.MaxValue))
    check(Array.fill(255)(0L))
    check(Array.tabulate(128)(_.toLong))
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(255)
      // skewed: mostly small gaps with occasional huge outliers (the
      // distribution PFor is built for)
      val a = Array.fill(n) {
        if (rnd.nextInt(10) == 0) rnd.nextLong() & Long.MaxValue
        else rnd.nextInt(64).toLong
      }
      check(a)
    }
  }

  test("compresses gap-like data better than VByte") {
    // typical posting deltas: small gaps, rare large jumps
    val gaps = Array.fill(128)(1L + rnd.nextInt(30))
    gaps(17) = 100000L // one outlier must not blow up the width
    val pfor = PFor.encode(gaps).length
    val vb = VByte.encode(gaps).length
    assert(pfor < vb, s"pfor=$pfor vbyte=$vb")
  }

  test("codec registry dispatch + unknown codec rejection") {
    val a = Array(3L, 1L, 4L, 1L, 5L)
    assert(Codecs.decode(Codecs.VB, Codecs.encode(Codecs.VB, a), 5).toSeq == a.toSeq)
    assert(Codecs.decode(Codecs.PFOR, Codecs.encode(Codecs.PFOR, a), 5).toSeq == a.toSeq)
    assert(Codecs.of("vbyte") == Codecs.VB && Codecs.of("pfor") == Codecs.PFOR)
    intercept[IllegalArgumentException](Codecs.of("zstd"))
    intercept[IllegalArgumentException](Codecs.decode(9, Array[Byte](1), 1))
  }

  test("both codecs build rank-identical indexes") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val docs = Corpus.pages(spark, 600)
      .withColumn("doc_id", regexp_extract(col("url"), "/p/(\\d+)$", 1).cast("long"))
      .select("doc_id", "url", "text", "lang")
    val stores = Seq("vbyte", "pfor").map { codec =>
      val store = new graft.index.IndexStore(
        java.nio.file.Files.createTempDirectory(s"graft-$codec-").toString)
      graft.index.IndexBuilder.build(spark, docs, store,
        graft.index.IndexBuilder.Config(segSize = 128, blockSize = 16, codec = codec))
      store.open(spark)
    }
    for (q <- Seq("the web crawl", "docmark42", "posting engine store")) {
      val results = stores.map { idx =>
        graft.query.Wand.topK(spark, idx, q, 20)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }
      assert(results(0) == results(1), s"codec divergence for '$q'")
      assert(results(0).nonEmpty)
    }
  }
}
