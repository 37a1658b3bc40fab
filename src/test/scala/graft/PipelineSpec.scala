package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.IndexStore
import graft.query.{Search, Wand}

/** End-to-end pipeline: raw docs (with planted duplicates and junk) →
  * clean → index → BM25 search, in one call.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ingestAndIndex: dedup + quality gate + index + search end to end") {
    import spark.implicits._
    val good = (0L until 200L).map { i =>
      (i, s"the quick document number n$i talks about spark indexes and the web crawl for it")
    }
    val dups = (200L until 230L).map { i =>
      (i, good((i % 10).toInt)._2) // exact duplicates of the first ten docs
    }
    val junk = (230L until 260L).map(i => (i, "@@@ ### !!!! ~~~~ %%%%"))
    val docs = (good ++ dups ++ junk).toDF("doc_id", "text")
      .withColumn("url", concat(lit("doc://"), col("doc_id")))
      .withColumn("lang", lit("en"))

    val store = new IndexStore(Files.createTempDirectory("graft-pipe-").toString)
    val report = Pipeline.ingestAndIndex(spark, docs, store,
      Pipeline.Config(dedup = true, minQuality = 0.3,
        index = graft.index.IndexBuilder.Config(segSize = 64, blockSize = 16, slices = 2)))

    assert(report.inputDocs == 260)
    assert(report.droppedQuality == 30, report)   // junk fails the quality gate
    assert(report.droppedDuplicates == 30, report) // all 30 planted dups collapse
    assert(report.keptDocs == 200, report)

    // the surviving corpus is immediately searchable, rank-identical path
    val idx = store.open(spark)
    assert(idx.stats.nDocs == 200)
    val hits = Wand.topK(spark, idx, "n7 spark", 5).collect()
    assert(hits.nonEmpty && hits.head.getLong(0) == 7L) // unique marker wins

    // duplicates kept the min-id representative: doc 200+ never indexed
    val all = Search.termSearch(idx.docs, Map.empty, size = Int.MaxValue)
    assert(all.agg(max(col("doc_id"))).head().getLong(0) < 200L)

    // the whole flow composes down to the serving tier
    val serving = graft.query.Serving.open(idx, maxBytes = 2L << 30, withDocs = true)
    val servingHits = serving.topKHits("n7 spark", 5)
    assert(servingHits.nonEmpty && servingHits.head.doc_id == 7L)
    assert(servingHits.head.url == "doc://7")
  }

  test("ingestAndIndex: reused store does not inflate keptDocs (observed cleaned count)") {
    import spark.implicits._
    val docs = (0L until 50L).map(i =>
      (i, s"document number n$i talks about spark indexes and the web for it"))
      .toDF("doc_id", "text")
      .withColumn("url", concat(lit("doc://"), col("doc_id")))
      .withColumn("lang", lit("en"))
    val store = new IndexStore(Files.createTempDirectory("graft-pipe2-").toString)
    // plant a pre-existing committed slice claiming 9999 docs: the report
    // must reflect THIS run's cleaned corpus, not the store's history
    store.commitSlice(graft.index.SliceMeta(7, 0, 0, 9999L, 0, 0, 0, 0))
    val cfg = Pipeline.Config(
      index = graft.index.IndexBuilder.Config(segSize = 64, blockSize = 16, slices = 1))
    val r1 = Pipeline.ingestAndIndex(spark, docs, store, cfg)
    assert(r1.keptDocs == 50 && r1.droppedDuplicates == 0, r1)
    // and a repeat run into the same root reports identically
    val r2 = Pipeline.ingestAndIndex(spark, docs, store, cfg)
    assert(r2 == r1, r2)
  }

  test("clean: language filter keeps only requested langId guesses") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog is in the house for it"),
      (2L, "der hund und die katze ist nicht ein zu haus"),
      (3L, "le chat est dans la maison et les chiens")).toDF("doc_id", "text")
    val kept = Pipeline.clean(docs, Pipeline.Config(dedup = false, keepLangs = Seq("en", "de")))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }
}
