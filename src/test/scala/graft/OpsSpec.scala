package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops._

class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical content") {
    val df = docs((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val got = Dedup.exact(df, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L), (3L, 1L))) // (rep_id, n_docs)
  }

  test("shingles: k-grams, short docs fall back to whole-doc shingle") {
    assert(Dedup.shingles(Array("a", "b", "c", "d"), 3).toSeq == Seq("a b c", "b c d"))
    assert(Dedup.shingles(Array("a", "b"), 3).toSeq == Seq("a b"))
    assert(Dedup.shingles(Array.empty[String], 3).isEmpty)
  }

  test("minhash: near-identical docs collide, unrelated don't") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 57).map(i => s"tok$i").mkString(" ") + " altA altB altC"
    val far = (100 to 160).map(i => s"zzz$i").mkString(" ")
    val df = docs((1L, base), (2L, near), (3L, far))
    val got = Dedup.minhashLsh(df, "doc_id", "text", shingleK = 3, m = 128,
      bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("minhash signature is deterministic and similarity-preserving") {
    val a = (1 to 100).map(i => Hash64(s"s$i")).toArray
    val b = (11 to 110).map(i => Hash64(s"s$i")).toArray // 90/110 jaccard ≈ 0.82
    val sa1 = Dedup.minhashSignature(a, 128, 42L)
    val sa2 = Dedup.minhashSignature(a, 128, 42L)
    assert(sa1.toSeq == sa2.toSeq)
    val sb = Dedup.minhashSignature(b, 128, 42L)
    val agree = sa1.zip(sb).count { case (x, y) => x == y } / 128.0
    assert(agree > 0.6 && agree < 1.0)
  }

  test("simhash: identical → distance 0; near docs small distance; pairs found") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "the quick brown fox jumps over the lazy cat again and again"
    val h1 = Dedup.simhash64(graft.analysis.Analyzer.tokenize(t1))
    val h2 = Dedup.simhash64(graft.analysis.Analyzer.tokenize(t2))
    assert(h1 == Dedup.simhash64(graft.analysis.Analyzer.tokenize(t1)))
    val dist = java.lang.Long.bitCount(h1 ^ h2)
    assert(dist < 16, s"near-dup simhash distance was $dist")
    val df = docs((1L, t1), (2L, t2), (3L, "completely unrelated words xylophone quartz"))
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxDist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("ngram jaccard: exact similarity value") {
    // doc1 shingles {a b c, b c d}; doc2 shingles {a b c}; jaccard = 1/2
    val df = docs((1L, "a b c d"), (2L, "a b c"))
    val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", shingleK = 3, threshold = 0.1)
      .collect()
    assert(got.length == 1)
    assert(got(0).getDouble(2) == 0.5)
  }

  test("shared passage pairs: exact k-token windows, short docs yield none, hot windows guarded") {
    // docs 1 and 2 share the verbatim 4-token passage "p q r s" twice-
    // shifted → shared distinct windows with k=4: doc1 windows {p q r s,
    // q r s t}, doc2 windows {o p q r, p q r s} → exactly one in common.
    // doc3 is a 3-token doc: shorter than k → NO window (whole-short-doc
    // equality is exact()'s job, not a passage signal), even though its
    // text is a substring of doc1's.
    val df = docs(
      (1L, "p q r s t"),
      (2L, "o p q r s"),
      (3L, "p q r"))
    val got = Dedup.sharedPassagePairs(df, "doc_id", "text", windowK = 4,
      maxWindowDf = Long.MaxValue).collect()
    assert(got.length == 1)
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2)) == ((1L, 2L, 1L)))
    // hot-window guard: a window shared by MANY docs is boilerplate — a
    // pair whose only common window is hot must drop (loudly), while a
    // pair sharing a rare window survives with the hot one not counted
    val boiler = (1L to 5L).map(i => (10L + i, s"x y z w tail$i"))
    val rare = Seq((20L, "x y z w a b c d"), (21L, "a b c d e"))
    val df2 = docs(boiler ++ rare: _*)
    var drops: Option[graft.ops.DropStats] = None
    val got2 = Dedup.sharedPassagePairs(df2, "doc_id", "text", windowK = 4,
      maxWindowDf = 4L, onDrops = s => drops = Some(s)).collect()
    // "x y z w" has df 6 > 4 → guarded; only the rare "a b c d" pair stays
    assert(got2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((20L, 21L, 1L)))
    assert(drops.exists(_.droppedGroups == 1L), s"drops=$drops")
  }

  test("round-7 codegen kernels match the string-path semantics bit-exactly") {
    import org.apache.spark.unsafe.types.UTF8String
    val text = "The quick brown Fox jumps over the lazy dog the quick brown fox 42"
    val toks = graft.analysis.Analyzer.tokenize(text)
    def pairsOf(a: org.apache.spark.sql.catalyst.util.ArrayData) =
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
    // ShingleHash128 = (Hash64, hash64b) of shingles(...).distinct /
    // tokenWindows(...).distinct — the exact string-path sets, hashed
    for ((whole, k) <- Seq((true, 3), (false, 8), (true, 5), (false, 20))) {
      val expect = (if (whole) Dedup.shingles(toks, k) else Dedup.tokenWindows(toks, k))
        .distinct.map(s => (Hash64(s), DedupKernels.hash64b(s))).toSeq
      val got = pairsOf(DedupKernels.shingleHashes(UTF8String.fromString(text), k, whole))
      assert(got == expect, s"whole=$whole k=$k")
    }
    // empty / null-safe short doc
    assert(DedupKernels.shingleHashes(UTF8String.fromString(""), 3, true).numElements() == 0)
    assert(DedupKernels.shingleHashes(UTF8String.fromString("a b"), 8, false).numElements() == 0)
    // simhash kernel = Dedup.simhash64 over the analyzer stream
    assert(DedupKernels.simhash64(UTF8String.fromString(text)) == Dedup.simhash64(toks))
    // minhash band keys: signatures derive from h1 (= Hash64 of the
    // shingle — bit-identical to the old string path), and band-key
    // equality holds exactly when the r signature rows agree
    val shA = DedupKernels.shingleHashes(UTF8String.fromString(text), 3, true)
    val shB = DedupKernels.shingleHashes(
      UTF8String.fromString(text + " plus further trailing tokens"), 3, true)
    def h1s(a: org.apache.spark.sql.catalyst.util.ArrayData) =
      (0 until a.numElements()).map(i => a.getStruct(i, 2).getLong(0)).toArray
    val (m, bands) = (128, 32)
    val r = m / bands
    val sigA = Dedup.minhashSignature(h1s(shA), m, 42L)
    val sigB = Dedup.minhashSignature(h1s(shB), m, 42L)
    assert(sigA.toSeq == Dedup.minhashSignature(
      Dedup.shingles(toks, 3).distinct.map(Hash64(_)), m, 42L).toSeq)
    val bkA = DedupKernels.minhashBandKeys(shA, m, bands, 42L)
    val bkB = DedupKernels.minhashBandKeys(shB, m, bands, 42L)
    var agreeing = 0
    (0 until bands).foreach { b =>
      val sliceEq = (0 until r).forall(j => sigA(b * r + j) == sigB(b * r + j))
      if (sliceEq) { agreeing += 1; assert(bkA.getLong(b) == bkB.getLong(b)) }
    }
    assert(agreeing > 0, "overlapping docs must agree on some band")
    // cosineById = the hoisted-norm join arithmetic, same fold order
    val va = Array(0.3, -0.2, 0.9, 0.1)
    val vb = Array(0.5, 0.1, -0.4, 0.2)
    def dot(x: Array[Double], y: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }; s
    }
    val (na, nb) = (math.sqrt(dot(va, va)), math.sqrt(dot(vb, vb)))
    val map = new java.util.HashMap[java.lang.Long, (Array[Double], Double)]()
    map.put(1L, (va, na)); map.put(2L, (vb, nb))
    val bc = spark.sparkContext.broadcast(map)
    try assert(AnnKernels.cosineById(1L, 2L, bc) == dot(va, vb) / (na * nb))
    finally bc.destroy()
  }

  test("round-7: empty-set Jaccard and zero-norm cosine never pass the verify filters") {
    // Spark's (non-ANSI) Divide yields NULL on zero divisors, which the
    // old column-form verifies dropped via `>= threshold`; the codegen
    // kernels must preserve the drop (-Inf), NOT raw-Java NaN — Spark
    // compares NaN GREATER than everything
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val empty = new GenericArrayData(Array.empty[AnyRef])
    assert(DedupKernels.jaccard128(empty, empty).isNegInfinity)
    val zmap = new java.util.HashMap[java.lang.Long, (Array[Double], Double)]()
    zmap.put(1L, (Array(0.0, 0.0), 0.0))
    zmap.put(2L, (Array(0.0, 0.0), 0.0))
    val zbc = spark.sparkContext.broadcast(zmap)
    try assert(AnnKernels.cosineById(1L, 2L, zbc).isNegInfinity)
    finally zbc.destroy()
    // end to end: two empty-token docs share all-sentinel minhash
    // signatures (they bucket together in every band) but must emit NO
    // pair even at threshold 0
    val df = docs((1L, ""), (2L, "..."), (3L, "real tokens here alpha beta gamma"))
    assert(Dedup.minhashLsh(df, "doc_id", "text", shingleK = 3, m = 128,
      bands = 32, threshold = 0.0).count() == 0)
    // and two zero vectors (deterministic shared all-ones LSH buckets)
    // must emit no pair at any finite threshold
    import spark.implicits._
    val zvecs = Seq((1L, Array.fill(8)(0.0f)), (2L, Array.fill(8)(0.0f)))
      .toDF("vec_id", "embedding")
    assert(Ann.lshNearDupPairs(zvecs, threshold = -1.0, nPlanes = 4).count() == 0)
  }

  test("ANN brute force: exact neighbors on constructed vectors") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),   // closest to 0
      (2L, Array(0.0f, 1.0f)),   // orthogonal
      (3L, Array(-1.0f, 0.0f))) // opposite
      .toDF("vec_id", "embedding")
    val got = Ann.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSeq.sortBy(_._2)
    assert(got.map(_._1) == Seq(1L, 2L))
  }

  test("ANN LSH: deterministic buckets; same vector → same bucket") {
    val planes = Ann.hyperplanes(4, 8, 42L)
    val v = Array(0.3, -0.2, 0.9, 0.1)
    assert(Ann.signBucket(v, planes) == Ann.signBucket(v.clone(), planes))
    val planes2 = Ann.hyperplanes(4, 8, 42L)
    assert(planes.flatten.toSeq == planes2.flatten.toSeq)
  }

  test("langid: picks the language with the most stopwords; und on no evidence") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog in the house of it is for on"),
      (2L, "der hund und die katze ist nicht ein zu"),
      (3L, "xylophone quartz bogus tokens nothing")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextStats.langId(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "und")
  }

  test("repetition signals: exact top-bigram fraction and dup-token ratio") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a b"),    // bigrams: a b, b a, a b, b a, a b → top 3/5
      (2L, "x y z w"),        // all bigrams unique → 1/3
      (3L, "q"),              // <2 tokens → 0
      (4L, ""),               // empty → 0, 0
      (5L, "t t t t"))        // "t t" ×3 → 3/3; dup tokens 3/4
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextStats.topBigramFraction(col("text")).as("bf"),
      TextStats.dupTokenRatio(col("text")).as("dr"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) == ((3.0 / 5, 1.0 - 2.0 / 6)))
    assert(got(2L) == ((1.0 / 3, 0.0)))
    assert(got(3L) == ((0.0, 0.0)))
    assert(got(4L) == ((0.0, 0.0)))
    assert(got(5L) == ((1.0, 0.75)))
  }

  test("winnow fingerprint: deterministic, subset-robust") {
    val toks = (1 to 100).map(i => s"t$i").toArray
    val f1 = TextStats.winnow(toks)
    val f2 = TextStats.winnow(toks)
    assert(f1.toSeq == f2.toSeq && f1.nonEmpty)
    assert(TextStats.winnow(Array.empty[String]).isEmpty)
  }

  test("multimodal stub: deterministic decode, batch shape preserved") {
    import spark.implicits._
    val df = Seq((1L, "payload one"), (2L, "payload two")).toDF("doc_id", "text")
    val media = Multimodal.fromText(df, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.length == 2)
    assert(feats(0).n_bytes == "payload one".getBytes("UTF-8").length)
    assert(feats(0).feature.length == 8)
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.content_hash).toSeq == again.map(_.content_hash).toSeq)
    assert(Multimodal.frameOffsets(100, 4).toSeq == Seq(0, 25, 50, 75))
    assert(Multimodal.frameOffsets(0, 4).isEmpty)
  }

  test("DocIds: dense deterministic ids independent of partitioning") {
    import spark.implicits._
    val df = (1 to 500).map(i => s"key$i").toDF("url")
    def ids(parts: Int) = DocIds.assign(df.repartition(parts), "url", buckets = 16)
      .select("url", "doc_id").as[(String, Long)].collect().sortBy(_._1).toSeq
    val a = ids(1)
    val b = ids(7)
    assert(a == b)
    val allIds = a.map(_._2).sorted
    assert(allIds == (0L until 500L).toSeq) // dense permutation
  }

  test("multimodal: real container headers parsed (PNG/JPEG/GIF/WAV)") {
    import Multimodal.MediaHeaders
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG: signature + IHDR length/type + width=640, height=480
    val png = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ "IHDR".getBytes ++ bytes(
      0, 0, 2, 0x80, /*640*/ 0, 0, 1, 0xE0 /*480*/, 8, 6, 0, 0, 0)
    assert(MediaHeaders.sniff(png).contains(("image/png", 640, 480, 0)))
    // JPEG: SOI + APP0 (len 16) + SOF0 (precision, h=480, w=640)
    val jpeg = bytes(0xff, 0xd8, 0xff, 0xe0, 0, 16) ++ new Array[Byte](14) ++
      bytes(0xff, 0xc0, 0, 17, 8, 1, 0xE0 /*h=480*/, 2, 0x80 /*w=640*/, 3)
    assert(MediaHeaders.sniff(jpeg).contains(("image/jpeg", 640, 480, 0)))
    // GIF89a: 320 x 200 little-endian
    val gif = "GIF89a".getBytes ++ bytes(0x40, 0x01, 0xC8, 0x00)
    assert(MediaHeaders.sniff(gif).contains(("image/gif", 320, 200, 0)))
    // WAV: RIFF size 36 + 32000 data bytes, byteRate 16000 -> 2000 ms
    val wav = "RIFF".getBytes ++ bytes(0x24 + 0, 0x7D, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ bytes(16, 0, 0, 0, 1, 0, 1, 0,
        0x80, 0x3E, 0, 0 /*16000 sampleRate*/, 0x80, 0x3E, 0, 0 /*byteRate 16000*/,
        2, 0, 16, 0) ++ "data".getBytes ++ bytes(0, 0x7D, 0, 0)
    val sniffed = MediaHeaders.sniff(wav)
    assert(sniffed.exists(_._1 == "audio/wav"))
    assert(sniffed.exists(_._4 == ((0x7D00 + 0x24 - 36) * 1000L / 16000).toInt))
    // garbage → None (falls back to the stub path)
    assert(MediaHeaders.sniff("not an image".getBytes).isEmpty)
    // end-to-end through the pipeline: kind comes from the real header
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(1L, "blob", png)).toDS()
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats(0).kind == "image/png" && feats(0).width == 640 && feats(0).height == 480)
  }

  test("lshNearDupPairs: equals exact nearDupPairs on the test corpus (recall 1, exact precision)") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exact = Ann.nearDupPairs(emb, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshNearDupPairs(emb, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // exact-cosine verify means no false positives; defaults (8 tables x
    // 6 planes, 1-bit probes) give per-pair miss < 1e-3 at cosine 0.4 —
    // and the seeded planes make the outcome deterministic, so this
    // equality is a stable invariant, not a flaky expectation
    assert(lsh == exact, s"lsh=${lsh.size} exact=${exact.size}")
  }

  test("simhashPairs equals brute-force Hamming over all pairs (sf0.01 ground truth)") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val maxDist = 8
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = maxDist)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ground truth: exact O(N²) Hamming scan over the collected sketches
    val sketches = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) => (id, Dedup.simhash64(graft.analysis.Analyzer.tokenize(t))) }
    val truth = (for {
      i <- sketches.indices.iterator
      j <- (i + 1) until sketches.length
      if java.lang.Long.bitCount(sketches(i)._2 ^ sketches(j)._2) <= maxDist
    } yield {
      val (a, b) = (sketches(i)._1, sketches(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    assert(truth.nonEmpty)
    // pigeonhole banding is exact for <= maxDist: no misses, no extras
    assert(got == truth, s"got=${got.size} truth=${truth.size}")
  }

  test("ngram jaccard: default guard drops hot-shingle-only candidate pairs") {
    // every doc shares the ubiquitous shingle "x y z"; no other overlap
    val df = docs((1 to 30).map(i => (i.toLong, s"x y z u$i v$i w$i")): _*)
    val unbounded = Dedup.ngramJaccardPairs(df, "doc_id", "text",
      shingleK = 3, threshold = 0.05, maxShingleDf = Long.MaxValue)
    assert(unbounded.count() == 30L * 29 / 2) // quadratic blow-up, guard off
    val guarded = Dedup.ngramJaccardPairs(df, "doc_id", "text",
      shingleK = 3, threshold = 0.05, maxShingleDf = 5)
    assert(guarded.count() == 0) // hot shingle filtered before the self-join
  }

  test("minhash: one tokenize pass — verify stage reuses the materialized base") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 57).map(i => s"tok$i").mkString(" ") + " altA altB altC"
    val df = docs((1L, base), (2L, near), (3L, "some unrelated words entirely"))
    // the unsealed plan (the public op materializes + releases its caches):
    // both the banding branch and the verify branch must scan the cached
    // (id, shingles, signature) relation instead of re-tokenizing
    val (out, cached, _) = Dedup.minhashLshPlan(df, "doc_id", "text", shingleK = 3,
      m = 128, bands = 32, threshold = 0.5, seed = 42L, maxBucket = 64)
    val plan = out.queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(plan).size >= 2, plan.take(2000))
    cached.foreach(_.unpersist(blocking = true))
    val res = Dedup.minhashLsh(df, "doc_id", "text", shingleK = 3, m = 128,
      bands = 32, threshold = 0.5)
    assert(res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("sketch ops leave no persisted relations behind (scoped cache lifetime)") {
    import spark.implicits._
    val df = docs((1 to 40).map(i => (i.toLong, s"alpha beta gamma d$i e$i f$i")): _*)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.minhashLsh(df, "doc_id", "text").count()
    Dedup.simhashPairs(df, "doc_id", "text").count()
    Dedup.ngramJaccardPairs(df, "doc_id", "text").count()
    Ann.lshNearDupPairs(emb, threshold = 0.4).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"ops left persisted RDDs behind: $leaked")
  }

  test("bounded modes report dropped groups (no silent caps)") {
    // 12 identical docs: every band's bucket holds all 12 ids, so a
    // maxBucket of 8 must drop exactly `bands` buckets of 12 entries each
    val dups = docs((1 to 12).map(i => (i.toLong, "same text for every doc here")): _*)
    var minhashDrops = DropStats(0, 0)
    val mh = Dedup.minhashLsh(dups, "doc_id", "text", shingleK = 3, m = 128,
      bands = 16, threshold = 0.5, maxBucket = 8, onDrops = minhashDrops = _)
    assert(mh.count() == 0, "all candidates lived in over-cap buckets")
    assert(minhashDrops == DropStats(16, 16L * 12), s"got $minhashDrops")

    // hot shingle "x y z" has df 30 > 5: one dropped shingle, 30 entries
    val hot = docs((1 to 30).map(i => (i.toLong, s"x y z u$i v$i w$i")): _*)
    var ngramDrops = DropStats(0, 0)
    Dedup.ngramJaccardPairs(hot, "doc_id", "text", shingleK = 3,
      threshold = 0.05, maxShingleDf = 5, onDrops = ngramDrops = _).count()
    assert(ngramDrops == DropStats(1, 30), s"got $ngramDrops")

    // identical vectors concentrate in one bucket per (table, probe) key
    import spark.implicits._
    val sameVecs = (1 to 10).map(i => (i.toLong, Array.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    var annDrops = DropStats(0, 0)
    val nd = Ann.lshNearDupPairs(sameVecs, threshold = 0.9, nPlanes = 4,
      maxBucket = 4, onDrops = annDrops = _)
    assert(nd.count() == 0)
    assert(annDrops.droppedGroups > 0 && annDrops.droppedEntries >= 10,
      s"got $annDrops")
  }

  test("components: chains, stars, and singleton pairs resolve to min-id representatives") {
    import spark.implicits._
    // chain 1-2-3-4-5-6 (diameter 5), star 10-{11,12,13}, pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L)).toDF("id_a", "id_b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Dedup.components(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
    // keep-one-per-cluster is a filter on id === rep_id
    assert(got.count { case (id, rep) => id == rep } == 3)
    // the distributed label-propagation path (forced via localCap = 0)
    // must agree with the driver union-find exactly
    val distributed = Dedup.components(pairs, localCap = 0)
      .as[(Long, Long)].collect().toMap
    assert(distributed == got)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"components left persisted RDDs: $leaked")
    // non-convergence fails loudly instead of returning partial clusters
    intercept[IllegalArgumentException] {
      Dedup.components(pairs, maxIters = 2, localCap = 0)
    }
  }

  test("decontaminate: n-gram overlap with the benchmark set flags exactly the leaked docs") {
    // doc 1 shares the benchmark 3-grams "a b c"+"b c d" (2 hits, flagged);
    // doc 2 shares only "a b c" (1 hit, below minOverlap=2); doc 3 clean
    val corpus = docs(
      (1L, "a b c d x y"),
      (2L, "a b c q r s"),
      (3L, "u v w x y z"))
    val bench = docs((100L, "a b c d"))
    val got = Curation.decontaminate(corpus, bench, "doc_id", "text",
      shingleK = 3, minOverlap = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L))
    val loose = Curation.decontaminate(corpus, bench, "doc_id", "text",
      shingleK = 3, minOverlap = 1L)
      .collect().map(_.getLong(0)).toSet
    assert(loose == Set(1L, 2L))
  }

  test("stratified sample: deterministic fixed-hash keep decision, per-stratum fractions") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val fr = Map("en" -> 0.5, "de" -> 0.1)
    def run() = Curation.stratifiedSample(df, "lang", "doc_id", fr)
      .select("doc_id").as[Long].collect().toSet
    val first = run()
    assert(run() == first, "same input must keep the SAME documents")
    // membership matches the documented hash rule exactly
    def bucket(id: Long) = (id % 100003L) * 2654435761L % 1000L
    val expect = (0L until 2000L).filter { i =>
      bucket(i) < (if (i % 3 == 0) 500 else 100)
    }.toSet
    assert(first == expect)
    // fractions land near spec (hash equidistribution)
    val en = first.count(_ % 3 == 0).toDouble / (0L until 2000L).count(_ % 3 == 0)
    assert(math.abs(en - 0.5) < 0.1, s"en fraction $en")
  }

  test("chunk windows: exact stride/window arithmetic incl. short and empty docs") {
    val df = docs(
      (1L, "t1 t2 t3 t4 t5 t6 t7"), // 7 tokens, window 4 stride 2 → 3 windows
      (2L, "a b"),                  // short → 1 window of 2
      (3L, ""))                     // empty → 1 window of 0
    val got = Curation.chunkWindows(df, "doc_id", "text", window = 4, stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (1L, 0, "t1 t2 t3 t4", 4L),
      (1L, 1, "t3 t4 t5 t6", 4L),
      (1L, 2, "t5 t6 t7", 3L),
      (2L, 0, "a b", 2L),
      (3L, 0, "", 0L)))
  }

  test("ANN IVF: deterministic training, high recall vs brute force") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val c1 = Ann.trainIvfCentroids(emb, nCells = 16)
    val c2 = Ann.trainIvfCentroids(emb, nCells = 16)
    assert(c1.flatten.toSeq == c2.flatten.toSeq) // deterministic training
    val ivf = Ann.ivfTopK(emb, queries, k = 10, nCells = 16, nProbe = 6)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val brute = Ann.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall too low") // nProbe 6/16 cells
    assert(ivf.size == brute.size)
  }

  test("ANN recall gates: IVF >= 0.9 at nProbe 8; LSH recall reported") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val brute = Ann.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    // nAssign=2 (multi-assignment) recovers cell-boundary neighbors that
    // single assignment misses (0.84 recall) — the standard IVF spill
    val ivf = Ann.ivfTopK(emb, queries, k = 10, nCells = 16, nProbe = 8, nAssign = 2)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val ivfRecall = (ivf & brute).size.toDouble / brute.size
    assert(ivfRecall >= 0.9, s"IVF recall@10 $ivfRecall < 0.9 at nProbe=8, nAssign=2")
    val lsh = Ann.lshTopK(emb, queries, k = 10, nPlanes = 8)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val lshRecall = (lsh & brute).size.toDouble / brute.size
    info(f"LSH recall@10 (8 tables x 8 planes, 2-bit query probes): $lshRecall%.3f")
    assert(lshRecall >= 0.8, s"LSH recall@10 $lshRecall below the multi-probe bar")
  }
}
