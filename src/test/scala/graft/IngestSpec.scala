package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.index.AliasCatalog
import graft.ingest._

class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("coercion: NaN → null, numeric → double, strings trimmed (reference golden)") {
    // mirrors reference tests/test_file_processor.py:164-180
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("value", DoubleType), StructField("empty", StringType)))
    val rows = Seq(
      Row(1, "  test  ", 42.5, null),
      Row(2, "x", Double.NaN, "  pad  "))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = Coerce.documents(df).collect()
    assert(got(0).getDouble(0) == 1.0)          // numeric → double
    assert(got(0).getString(1) == "test")       // trimmed
    assert(got(0).getDouble(2) == 42.5)
    assert(got(0).isNullAt(3))                  // null preserved
    assert(got(1).isNullAt(2))                  // NaN → null
    assert(got(1).getString(3) == "pad")
  }

  test("mapping-type coercion goldens: date/boolean/ip/geo_point (data_ingestion_requirements.md:104-123)") {
    import spark.implicits._
    import Coerce._
    val df = Seq(
      ("2024-03-01T12:34:56.123456", "TRUE",  "192.168.0.1",   "12.5,-70.25"),
      ("2024-03-01 12:34:56",        "false", "10.0.0.255",    " 89.0 , 179.0 "),
      ("not a date",                 "1",     "256.1.1.1",     "95.0,10.0"),   // bad ip octet; lat out of range
      ("",                           "0",     "1.2.3",         "oops"),
      ("2024-13-45T99:99:99",        "maybe", "01.2.3.4.5",    "1.0"))
      .toDF("d", "b", "ip", "geo")
    val got = withMapping(df, Map(
      "d" -> DateField, "b" -> BooleanField, "ip" -> IpField, "geo" -> GeoPointField))
      .collect()

    def ts(r: Row) = Option(r.getTimestamp(0)).map(_.toString).orNull
    assert(ts(got(0)) == "2024-03-01 12:34:56.123456")
    assert(ts(got(1)) == "2024-03-01 12:34:56.0")
    assert(ts(got(2)) == null && ts(got(3)) == null && ts(got(4)) == null)

    assert(got.map(r => Option(r.get(1)).orNull).toSeq ==
      Seq(true, false, true, false, null))

    assert(got.map(_.getString(2)).toSeq ==
      Seq("192.168.0.1", "10.0.0.255", null, null, null))

    def geo(r: Row) = Option(r.getStruct(3)).map(s => (s.getDouble(0), s.getDouble(1)))
    assert(geo(got(0)).contains((12.5, -70.25)))
    assert(geo(got(1)).contains((89.0, 179.0))) // whitespace-tolerant
    assert(geo(got(2)).isEmpty)                 // |lat| > 90
    assert(geo(got(3)).isEmpty && geo(got(4)).isEmpty)
  }

  test("object/nested mapping types: JSON → struct / array<struct>, null on malformed") {
    import spark.implicits._
    import Coerce._
    val df = Seq(
      ("""{"a": 1, "b": "x"}""", """[{"v": 1}, {"v": 2}]"""),
      ("not json at all", "also not json"),
      ("""{"a": 2}""", "[]"))
      .toDF("obj", "arr")
    val st = new StructType(Array(
      StructField("a", LongType), StructField("b", StringType)))
    val got = withMapping(df, Map(
      "obj" -> ObjectField(st),
      "arr" -> NestedField(new StructType(Array(StructField("v", LongType))))))
      .collect()
    assert(got(0).getStruct(0).getLong(0) == 1L)
    assert(got(0).getStruct(0).getString(1) == "x")
    assert(got(0).getSeq[Row](1).map(_.getLong(0)) == Seq(1L, 2L))
    assert(got(1).isNullAt(0) && got(1).isNullAt(1)) // unparseable → null
    assert(got(2).getStruct(0).getLong(0) == 2L && got(2).getStruct(0).isNullAt(1))
    assert(got(2).getSeq[Row](1).isEmpty)
  }

  test("recreate settings filter strips engine-assigned keys (index_cleanup.py:172-176)") {
    val settings = Map(
      "number_of_shards" -> "3", "number_of_replicas" -> "1",
      "creation_date" -> "1700000000", "uuid" -> "abc123",
      "version" -> "137227827", "provided_name" -> "members")
    assert(Cleanup.recreateSettings(settings) ==
      Map("number_of_shards" -> "3", "number_of_replicas" -> "1"))
  }

  test("upsert: last write wins per id") {
    import spark.implicits._
    val df = Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "c")).toDF("id", "seq", "v")
    val got = Upsert.lastWriteWins(df, "id", Seq("seq"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, "b"), (2L, 1L, "c")))
  }

  test("partial update: non-null update fields win, nulls keep existing, unknown ids ignored (data_ingestion_requirements.md:86-101)") {
    import spark.implicits._
    val current = Seq(
      (1L, "alice", 30L, "CA"),
      (2L, "bob", 40L, "NY"),
      (3L, "carol", 50L, "TX")).toDF("id", "name", "age", "state")
    // update 1's age only; update 2's state only; id 9 doesn't exist
    val updates = Seq(
      (1L, Some(31L), None: Option[String]),
      (2L, None: Option[Long], Some("WA")),
      (9L, Some(99L), Some("ZZ")))
      .toDF("id", "age", "state")
    val got = PartialUpdate(current, updates, "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(got == Set(
      (1L, "alice", 31L, "CA"),   // age updated, name/state untouched
      (2L, "bob", 40L, "WA"),     // state updated, age kept (null in update)
      (3L, "carol", 50L, "TX")))  // no update row
  }

  test("partial update: duplicate keys in the update batch apply last-wins, no row inflation") {
    import spark.implicits._
    val current = Seq((1L, "alice", 30L), (2L, "bob", 40L)).toDF("id", "name", "age")
    // two updates for id 1: with an order column the later one wins
    val updates = Seq((1L, 1L, Some(31L)), (1L, 2L, Some(32L)), (2L, 1L, None: Option[Long]))
      .toDF("id", "seq", "age")
    val got = PartialUpdate(current, updates.select("id", "age"), "id",
      orderCols = Seq.empty) // deterministic tiebreak over non-key cols
    assert(got.count() == 2, "duplicate update keys must not inflate the output")
    val ordered = PartialUpdate(current, updates, "id", orderCols = Seq("seq"))
      .select("id", "name", "age")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(ordered == Set((1L, "alice", 32L), (2L, "bob", 40L)))
  }

  test("alias switch existence guards (switch_alias.py:271-296)") {
    import Guardrails._
    import graft.index.IndexStore
    val dir = Files.createTempDirectory("graft-guard-").toString
    val cat = new AliasCatalog(dir)
    val src = new IndexStore(s"$dir/src")
    val tgt = new IndexStore(s"$dir/tgt")
    // alias missing
    assert(validateSwitchCatalog(cat, "live", src, tgt, 100, 100) ==
      Abort("alias 'live' does not exist"))
    cat.set("live", src.root)
    // indices missing (no committed manifest yet)
    assert(validateSwitchCatalog(cat, "live", src, tgt, 100, 100).isInstanceOf[Abort])
    src.commitSlice(graft.index.SliceMeta(0, 0, 0, 100, 0, 0, 0, 0))
    assert(validateSwitchCatalog(cat, "live", src, tgt, 100, 100) ==
      Abort(s"target index ${tgt.root} does not exist"))
    tgt.commitSlice(graft.index.SliceMeta(0, 0, 0, 100, 0, 0, 0, 0))
    // alias points elsewhere
    cat.set("live", tgt.root)
    assert(validateSwitchCatalog(cat, "live", src, tgt, 100, 100) ==
      Abort(s"alias 'live' points at ${tgt.root}, not the expected source ${src.root}"))
    // the happy path falls through to the count guards
    cat.set("live", src.root)
    assert(validateSwitchCatalog(cat, "live", src, tgt, 100, 100) == Proceed)
    assert(validateSwitchCatalog(cat, "live", src, tgt, 100, 80).isInstanceOf[Abort])
  }

  test("resume anti-join skips ledgered work") {
    import spark.implicits._
    val work = Seq("f1", "f2", "f3", "f4").toDF("fileId")
    val ledger = Seq("f2", "f4").toDF("fileId")
    val got = Ledger.pendingOnly(work, ledger, "fileId")
      .as[String].collect().sorted.toSeq
    assert(got == Seq("f1", "f3"))
  }

  test("alias switch guardrails (reference switch_alias.py semantics)") {
    import Guardrails._
    assert(validateSwitch("idx", "idx", 100, 100) == Abort("source and target are the same index"))
    assert(validateSwitch("a", "b", 100, 0) == Abort("target index is empty"))
    assert(validateSwitch("a", "b", 100, 100) == Proceed)
    assert(validateSwitch("a", "b", 100, 95) == Proceed)      // 5% < 10%
    assert(validateSwitch("a", "b", 100, 89).isInstanceOf[Abort]) // 11% > 10%
    assert(validateSwitch("a", "b", 0, 0) == Proceed)          // both empty
    assert(countDriftPct(100, 110) == 10.0)
    assert(countDriftPct(0, 5) == 100.0)
  }

  test("cleanup cost-based plan: threshold decides delete-all vs recreate") {
    import Cleanup._
    assert(plan(1000000L) == DeleteAllDocuments)   // ≤ threshold
    assert(plan(1000001L) == DropAndRecreate)      // > threshold
    assert(plan(0L) == DeleteAllDocuments)
  }

  test("DLQ chunking: ≤230KB single part, larger split with part numbering") {
    val small = Dlq.chunk("x" * 100)
    assert(small == Seq((1, 1, "x" * 100)))
    val big = Dlq.chunk("y" * 500000)
    assert(big.length == 3)
    assert(big.map(_._1) == Seq(1, 2, 3))
    assert(big.forall(_._2 == 3))
    assert(big.map(_._3).mkString == "y" * 500000)
    assert(big.forall(_._3.getBytes("UTF-8").length <= Dlq.MaxPayloadBytes))
    // multi-byte chars never split mid-sequence
    val uni = Dlq.chunk("é" * 200000) // 2 bytes each
    assert(uni.map(_._3).mkString == "é" * 200000)
  }

  test("alias catalog: atomic set/resolve/switch") {
    val dir = Files.createTempDirectory("graft-alias-").toString
    val cat = new AliasCatalog(dir)
    assert(cat.resolve("live").isEmpty)
    cat.set("live", "/idx/v1")
    assert(cat.resolve("live").contains("/idx/v1"))
    cat.set("live", "/idx/v2") // the zero-downtime switch
    assert(cat.resolve("live").contains("/idx/v2"))
    cat.delete("live")
    assert(cat.resolve("live").isEmpty)
  }

  test("reindex: copies all rows, aborts on empty source") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-src-").toString + "/t"
    val tgt = Files.createTempDirectory("graft-tgt-").toString + "/t"
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.parquet(src)
    assert(Reindex.copy(spark, src, tgt) == 2)
    assert(spark.read.parquet(tgt).count() == 2)
    val empty = Files.createTempDirectory("graft-empty-").toString + "/t"
    Seq.empty[(Int, String)].toDF("k", "v").write.parquet(empty)
    intercept[IllegalArgumentException] { Reindex.copy(spark, empty, tgt) }
  }

  test("bulk NDJSON shape parity (reference test_file_processor.py:182-212)") {
    import spark.implicits._
    import graft.ingest.BulkFormat
    val df = Seq(("doc1", "alice", 10.5), (null, "bob", 20.0))
      .toDF("id", "name", "value")
    val entries = BulkFormat.toBulkNdjson(df, "members").collect().sorted
    // with id: action line carries _id; without: plain index action
    val withId = entries.find(_.contains("alice")).get.split("\n")
    assert(withId(0) == """{"index": {"_index": "members", "_id": "doc1"}}""")
    assert(withId(1).contains(""""name":"alice""""))
    val noId = entries.find(_.contains("bob")).get.split("\n")
    assert(noId(0) == """{"index": {"_index": "members"}}""")
    // batching: 5 docs at batchSize 2 -> 3 batches (one partition)
    val batched = BulkFormat.toBatches(
      BulkFormat.toBulkNdjson(df.union(df).union(df.limit(1)).coalesce(1), "m"),
      batchSize = 2).collect()
    assert(batched.length == 3)
    assert(batched.map(_.count(_ == '\n') + 1).sum == 10) // 5 docs x 2 lines
  }

  test("settings/mappings store: round-trip, immutable identity, recreate filter") {
    val dir = Files.createTempDirectory("graft-settings-").toString
    val store = new graft.index.IndexStore(s"$dir/idx_a")
    store.setSettings(Map("number_of_shards" -> "4", "refresh_interval" -> "30s",
      "uuid" -> "caller-supplied"))
    val s1 = store.settings
    assert(s1("number_of_shards") == "4" && s1("refresh_interval") == "30s")
    assert(s1("uuid") != "caller-supplied", "identity keys are engine-assigned")
    assert(s1.contains("creation_date") && s1("provided_name") == "idx_a")
    // PUT-settings merge: updated key changes, unmentioned keys survive,
    // identity is stable across updates
    store.setSettings(Map("number_of_shards" -> "8"))
    val s2 = store.settings
    assert(s2("number_of_shards") == "8" && s2("refresh_interval") == "30s")
    assert(s2("uuid") == s1("uuid") && s2("creation_date") == s1("creation_date"))
    // mappings round-trip incl. JSON escaping
    val m = Map("ts" -> "date", "geo" -> "geo_point", "weird \"na\\me\"" -> "keyword")
    store.setMappings(m)
    assert(store.mappings == m)
    // drop-and-recreate: user settings round-trip through the filter,
    // engine identity is freshly assigned (index_cleanup.py:172-186)
    val recreated = new graft.index.IndexStore(s"$dir/idx_b")
    recreated.setSettings(Cleanup.recreateSettings(store.settings))
    val s3 = recreated.settings
    assert(s3("number_of_shards") == "8" && s3("refresh_interval") == "30s")
    assert(s3("uuid") != s1("uuid") && s3("provided_name") == "idx_b")
  }

  test("batched ingest: 100-file parity with the serial loop, materially faster") {
    val base = Files.createTempDirectory("graft-batch-ingest-").toString
    // 100 files: 90 CSVs sharing a header (some with in-file duplicate ids
    // and malformed numeric cells), 10 JSON files — the many-small-files
    // shape where the serial driver loop, not the cluster, is the bound
    val csvFiles = (1 to 90).map { i =>
      val p = s"$base/f$i.csv"
      val rows = (1 to 5).map { r =>
        val id = i * 100 + r
        // extra tokens → corrupt under the 3-column schema (a wrong TYPE
        // would just widen inference — the reference's malformed-row case
        // is shape, not type)
        val v = if (i % 7 == 0 && r == 3) s"$r.5,EXTRA,COLS" else s"$r.5"
        val dup = if (r == 5) s"\n${i * 100 + 1},dupname,9.9" else ""
        s"$id,name$id,$v$dup"
      }
      Files.writeString(java.nio.file.Paths.get(p),
        "id,name,value\n" + rows.mkString("\n") + "\n")
      p
    }
    val jsonFiles = (1 to 10).map { i =>
      val p = s"$base/g$i.json"
      Files.writeString(java.nio.file.Paths.get(p),
        s"""[{"id": ${9000 + i}, "name": "j$i", "value": ${i}.25}]""")
      p
    }
    val all: Seq[String] = (csvFiles ++ jsonFiles)

    def run(tag: String, fn: () => FileIngest.IngestSummary) = {
      val t0 = System.nanoTime()
      val s = fn()
      (s, (System.nanoTime() - t0) / 1e9)
    }
    val (serial, tSerial) = run("serial", () =>
      FileIngest.ingest(spark, all, s"$base/t_serial", s"$base/l_serial", s"$base/d_serial"))
    val (batched, tBatched) = run("batched", () =>
      FileIngest.ingestBatched(spark, all, s"$base/t_batch", s"$base/l_batch", s"$base/d_batch"))

    // summary parity: same totals and identical per-file reports
    assert(batched.processedRows == serial.processedRows)
    assert(batched.failedRows == serial.failedRows && batched.failedRows > 0)
    assert(batched.verified && serial.verified)
    assert(batched.files.map(f => (f.file, f.totalRows, f.failedRows, f.status)) ==
      serial.files.map(f => (f.file, f.totalRows, f.failedRows, f.status)))

    // target parity: identical rows (the in-file duplicate id upserted)
    def dump(p: String) = spark.read.parquet(p)
      .collect().map(r => (r.getAs[Double]("id"), r.getAs[String]("name"),
        Option(r.getAs[java.lang.Double]("value")))).toSet
    assert(dump(s"$base/t_batch") == dump(s"$base/t_serial"))

    // ledger parity
    import spark.implicits._
    def ledger(p: String) = spark.read.parquet(p).select("file").as[String].collect().toSet
    assert(ledger(s"$base/l_batch") == ledger(s"$base/l_serial"))

    // DLQ parity: the same failed documents, attributed to the same files
    // under the caller's spelling, with the same kind-specific reason
    def dlq(p: String) = spark.read.parquet(p)
      .select("sourceFile", "docJson", "errorReason").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(dlq(s"$base/d_batch") == dlq(s"$base/d_serial"))

    // resume parity: a second batched run skips everything
    val again = FileIngest.ingestBatched(spark, all,
      s"$base/t_batch", s"$base/l_batch", s"$base/d_batch", resume = true)
    assert(again.files.forall(_.status == "skipped"))

    info(f"serial=${tSerial}%.1fs batched=${tBatched}%.1fs speedup=${tSerial / tBatched}%.1fx")
    assert(tBatched < tSerial * 0.5,
      f"batched ingest must be materially faster: $tBatched%.1fs vs $tSerial%.1fs")
  }

  test("re-ingest idempotency: write-then-ledger crash replay resolves to zero duplicate ids") {
    val dir = Files.createTempDirectory("graft-replay-").toString
    val f1 = s"$dir/f1.csv"
    Files.writeString(java.nio.file.Paths.get(f1),
      "id,name,value\n1,alice,10.5\n2,bob,20.0\n3,carol,30.0\n")
    val (target, ledger, dlq) = (s"$dir/t", s"$dir/l", s"$dir/dlq")

    val s1 = FileIngest.ingest(spark, Seq(f1), target, ledger, dlq)
    assert(s1.processedRows == 3 && s1.verified)
    def resolved() = FileIngest.readResolved(spark, target)
      .select("id", "name", "value").collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2))).toSet
    val clean = resolved()
    assert(clean.size == 3)

    // the documented crash window: target rows appended, ledger row LOST
    // (simulate by deleting the ledger), then a resume re-run replays f1
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(ledger)).iterator().asScala
      .toSeq.reverse.foreach(Files.deleteIfExists(_))
    val s2 = FileIngest.ingest(spark, Seq(f1), target, ledger, dlq, resume = true)
    assert(s2.files.head.status == "success") // replayed, not skipped

    // physical target holds both writes; the LWW-resolved view is exactly
    // the clean single-run content — the reference's `_id` overwrite makes
    // its re-run idempotent the same way (file_processor.py:248-257)
    assert(spark.read.parquet(target).count() == 6)
    assert(resolved() == clean, "replay must be invisible in the resolved view")

    // compaction-time LWW removes the physical duplicates: zero dup ids
    val n = FileIngest.compactTarget(spark, target)
    assert(n == 3)
    val phys = spark.read.parquet(target)
    assert(phys.count() == 3)
    assert(phys.select("id").distinct().count() == 3, "zero duplicate ids after compaction")
    assert(resolved() == clean)

    // genuine update (NOT a replay): a later file re-indexes id=2 with new
    // content — the resolved view takes the LATEST write (README.md:192-198)
    val f2 = s"$dir/f2.csv"
    Files.writeString(java.nio.file.Paths.get(f2),
      "id,name,value\n2,bob-v2,21.0\n")
    FileIngest.ingest(spark, Seq(f2), target, ledger, dlq)
    val after = resolved()
    assert(after.size == 3)
    assert(after.contains((2.0, "bob-v2", 21.0)), s"latest write must win: $after")
    assert(!after.exists { case (i, nm, _) => i == 2.0 && nm == "bob" })

    // batched path stamps the same sequence semantics: replay under the
    // batched reader resolves identically
    val (t2, l2, d2) = (s"$dir/t2", s"$dir/l2", s"$dir/d2")
    FileIngest.ingestBatched(spark, Seq(f1), t2, l2, d2)
    Files.walk(java.nio.file.Paths.get(l2)).iterator().asScala
      .toSeq.reverse.foreach(Files.deleteIfExists(_))
    FileIngest.ingestBatched(spark, Seq(f1), t2, l2, d2, resume = true)
    assert(spark.read.parquet(t2).count() == 6)
    val resolved2 = FileIngest.readResolved(spark, t2)
      .select("id", "name", "value").collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2))).toSet
    assert(resolved2 == clean)
  }

  test("duplicate paths within one call ingest once — serial and batched agree") {
    val dir = Files.createTempDirectory("graft-duppath-").toString
    val f1 = s"$dir/a.csv"
    Files.writeString(java.nio.file.Paths.get(f1),
      "id,name,value\n1,alice,10.5\n2,bob,20.0\n")
    val in = Seq(f1, f1, f1)
    val s = FileIngest.ingest(spark, in, s"$dir/ts", s"$dir/ls", s"$dir/ds")
    val b = FileIngest.ingestBatched(spark, in, s"$dir/tb", s"$dir/lb", s"$dir/db")
    for (sum <- Seq(s, b)) {
      assert(sum.processedRows == 2, sum)
      assert(sum.files.map(_.status) == Seq("success", "skipped", "skipped"), sum.files)
    }
    assert(spark.read.parquet(s"$dir/ts").count() == 2)
    assert(spark.read.parquet(s"$dir/tb").count() == 2)

    // duplicate path + cross-file id collision: the duplicated path must
    // keep its FIRST occurrence's write sequence in both paths, so LWW
    // resolves the colliding id identically (a last-occurrence seq would
    // flip the winner between serial and batched)
    val f2 = s"$dir/b.csv"
    Files.writeString(java.nio.file.Paths.get(f2),
      "id,name,value\n1,alice-v2,11.0\n")
    val in2 = Seq(f1, f2, f1) // f1 ingests at seq(index 0), f2 at seq(1)
    def resolved(t: String, l: String, d: String) = {
      FileIngest.ingest(spark, in2, t, l, d) // serial variant reused per target
      FileIngest.readResolved(spark, t).select("id", "name")
        .collect().map(r => (r.getDouble(0), r.getString(1))).toSet
    }
    val rs = resolved(s"$dir/t2s", s"$dir/l2s", s"$dir/d2s")
    FileIngest.ingestBatched(spark, in2, s"$dir/t2b", s"$dir/l2b", s"$dir/d2b")
    val rb = FileIngest.readResolved(spark, s"$dir/t2b").select("id", "name")
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSet
    assert(rs == rb, s"serial=$rs batched=$rb")
    assert(rs.contains((1.0, "alice-v2")), s"later file must win the id: $rs")
  }

  test("driver-side retry with backoff: transient sink failures recover with no duplicate rows") {
    val dir = Files.createTempDirectory("graft-retry-").toString
    val f1 = s"$dir/r1.csv"
    Files.writeString(java.nio.file.Paths.get(f1),
      "id,name,value\n1,alice,10.5\n2,bob,oops,EXTRA,COLS\n3,carol,30.0\n")
    val attempts = scala.collection.mutable.Map.empty[String, Int]
    sys.props("graft.ingest.retryBaseMs") = "1"
    // every sink's FIRST attempt throws (the reference's transient-failure
    // model, opensearch_base_manager.py:97-132); the retry must recover
    Retry.injectFault = (label, attempt) => {
      attempts.synchronized { attempts(label) = attempts.getOrElse(label, 0) + 1 }
      attempt == 1
    }
    try {
      val s = FileIngest.ingest(spark, Seq(f1), s"$dir/t", s"$dir/l", s"$dir/dlq")
      assert(s.files.head.status == "partial") // the corrupt row went to DLQ
      assert(s.processedRows == 2 && s.failedRows == 1 && s.verified)
      assert(spark.read.parquet(s"$dir/t").count() == 2, "retry must not duplicate rows")
      assert(spark.read.parquet(s"$dir/dlq").count() == 1)
      assert(spark.read.parquet(s"$dir/l").count() == 1)
      // every sink's stage write AND its publish renames took one injected
      // failure each — and all recovered without duplicating a row
      assert(attempts.keySet == Set("target", "dlq", "ledger",
        "target-publish", "dlq-publish", "ledger-publish"), s"faults hit: $attempts")
    } finally {
      Retry.injectFault = null
      sys.props.remove("graft.ingest.retryBaseMs")
    }

    // attempts exhausted → the failure surfaces as a failed file report
    Retry.injectFault = (label, _) => label == "target"
    sys.props("graft.ingest.retryBaseMs") = "1"
    try {
      val s2 = FileIngest.ingest(spark, Seq(f1), s"$dir/t3", s"$dir/l3", s"$dir/d3")
      assert(s2.files.head.status.startsWith("failed"))
      assert(s2.processedRows == 0)
      // staged append: the failed attempts left NOTHING visible in the
      // target (no partially-committed rows a retry could double) and no
      // stage residue beside it
      val t3 = java.nio.file.Paths.get(s"$dir/t3")
      if (Files.exists(t3))
        assert(!Files.list(t3).iterator().asScala.exists(_.getFileName.toString
          .startsWith("part-")), "failed append leaked part files into the target")
      assert(!Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
        .exists(_.getFileName.toString.contains(".__stage-")),
        "failed append leaked a stage directory")
    } finally {
      Retry.injectFault = null
      sys.props.remove("graft.ingest.retryBaseMs")
    }
  }

  test("compactTarget crash window auto-recovers: target rolls back with data AND seq counter") {
    import java.nio.file.{Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft-compactrec-").toString
    def csv(p: String, rows: String): String = {
      Files.writeString(Paths.get(p), rows); p
    }
    val t = s"$dir/t"
    FileIngest.ingest(spark, Seq(csv(s"$dir/a.csv", "id,name\n1,alice\n2,bob\n")),
      t, s"$dir/l", s"$dir/d")
    FileIngest.ingest(spark, Seq(csv(s"$dir/b.csv", "id,name\n1,alice-v2\n")),
      t, s"$dir/l", s"$dir/d")
    assert(spark.read.parquet(t).count() == 3) // physical dup of id 1

    // simulate compactTarget crashing between its two moves: move 1 only —
    // the target is absent, everything lives in .__compact_old
    Files.move(Paths.get(t), Paths.get(t + ".__compact_old"), StandardCopyOption.ATOMIC_MOVE)
    assert(!Files.exists(Paths.get(t)))

    // the next read heals the window: full data back, LWW intact
    val rows = FileIngest.readResolved(spark, t).select("id", "name")
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSet
    assert(rows == Set((1.0, "alice-v2"), (2.0, "bob")))
    assert(!Files.exists(Paths.get(t + ".__compact_old")))
    // the seq counter came back with the data — the next write still wins
    assert(Files.readString(Paths.get(s"$t/_graft_seq")).trim.toLong == 2L)
    FileIngest.ingest(spark, Seq(csv(s"$dir/c.csv", "id,name\n1,alice-v3\n")),
      t, s"$dir/l", s"$dir/d")
    assert(FileIngest.readResolved(spark, t).filter(col("id") === 1.0)
      .head().getAs[String]("name") == "alice-v3")

    // the OTHER crash point — swap done, cleanup not — heals too
    val junk = Paths.get(t + ".__compact_old")
    Files.createDirectories(junk)
    Files.writeString(junk.resolve("leftover.parquet"), "junk")
    val n = FileIngest.compactTarget(spark, t)
    assert(n == 2L && !Files.exists(junk))
    assert(FileIngest.readResolved(spark, t).count() == 2)
  }

  test("seq counter single-writer: a held lock aborts loudly; concurrent ingests never interleave sequence values") {
    import java.nio.file.Paths
    val dir = Files.createTempDirectory("graft-seqlock-").toString
    def csv(p: String, rows: String): String = { Files.writeString(Paths.get(p), rows); p }
    val t = s"$dir/t"
    Files.createDirectories(Paths.get(t))

    // a FRESH lock held by another driver → this driver must abort loudly,
    // before anything is written
    Files.writeString(Paths.get(s"$t/_graft_seq.lock"), "other-driver")
    sys.props("graft.ingest.seqLockTimeoutMs") = "300"
    try {
      val e = intercept[IllegalStateException] {
        FileIngest.ingest(spark, Seq(csv(s"$dir/a.csv", "id,name\n1,a\n")),
          t, s"$dir/l", s"$dir/d")
      }
      assert(e.getMessage.contains("single-writer"))
      assert(!Files.exists(Paths.get(s"$t/_graft_seq"))) // nothing advanced
    } finally sys.props.remove("graft.ingest.seqLockTimeoutMs")

    // a STALE lock (crashed owner) breaks after the stale window
    sys.props("graft.ingest.seqLockStaleMs") = "1"
    try {
      Thread.sleep(5)
      val s = FileIngest.ingest(spark, Seq(csv(s"$dir/b.csv", "id,name\n2,b\n")),
        t, s"$dir/l", s"$dir/d")
      assert(s.processedRows == 1 && s.verified)
    } finally sys.props.remove("graft.ingest.seqLockStaleMs")

    // CONCURRENT ingest drivers: the lock serializes reservation, so the
    // stamped __seq values are disjoint across drivers — LWW stays
    // unambiguous (the round-5 read-advance-rename lost reservations
    // here, and Hadoop's local check-then-create lock let two drivers in
    // simultaneously until the O_EXCL fix; 8 drivers hit that reliably)
    val fs = (0 until 8).map(i => csv(s"$dir/c$i.csv", s"id,name\n${10 + i},c$i\n"))
    val threads = fs.map(f => new Thread(() => {
      FileIngest.ingest(spark, Seq(f), t, s"$dir/l", s"$dir/d"); ()
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    val seqs = spark.read.parquet(t).select("__seq").collect().map(_.getLong(0)).toSeq
    assert(seqs.distinct.size == seqs.size,
      s"concurrent drivers stamped overlapping sequence values: $seqs")
    // counter = 9 reservations of 1 (the lock-abort attempt advanced nothing)
    assert(Files.readString(Paths.get(s"$t/_graft_seq")).trim.toLong == 9L)
    // the shared LEDGER also survives concurrency: staged appends give each
    // driver its own write directory, so no job clobbers another's
    // _temporary output — all 9 completed ingests (stale-break + 8
    // concurrent) leave exactly their file rows behind
    val ledger = spark.read.parquet(s"$dir/l").select("file")
      .collect().map(_.getString(0)).toSeq
    assert(ledger.size == 9 && ledger.distinct.size == 9,
      s"concurrent ledger appends lost or duplicated rows: $ledger")
  }

  test("staged append: publish renames retry idempotently; a partial publish keeps the stage") {
    import java.nio.file.Paths
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-staged-").toString
    sys.props("graft.ingest.retryBaseMs") = "1"
    // transient publish failure: the first attempt of each publish rename
    // throws; the retry finds the source still unrenamed and lands it —
    // no duplicate, no loss, stage cleaned
    Retry.injectFault = (label, attempt) => label == "t-publish" && attempt == 1
    try {
      StagedAppend(Seq(1, 2, 3).toDF("v"), s"$dir/t", "t")
      assert(spark.read.parquet(s"$dir/t").count() == 3)
      assert(!Files.list(Paths.get(dir)).iterator().asScala
        .exists(_.getFileName.toString.contains(".__stage-")),
        "stage must be cleaned after a successful publish")
    } finally Retry.injectFault = null
    // persistent publish failure: the error surfaces, and the stage is
    // KEPT — deleting it would destroy the unpublished part files while
    // published siblings may already be visible in the target
    Retry.injectFault = (label, _) => label == "t2-publish"
    try {
      intercept[Exception](StagedAppend(Seq(4).toDF("v"), s"$dir/t2", "t2"))
      assert(Files.list(Paths.get(dir)).iterator().asScala
        .exists(_.getFileName.toString.contains(".__stage-")),
        "a partially-published stage must be kept for recovery")
    } finally {
      Retry.injectFault = null
      sys.props.remove("graft.ingest.retryBaseMs")
    }
    // orphaned stages are garbage (the failed unit re-ingests under
    // resume) — the grace-window vacuum reclaims aged ones and spares a
    // concurrent driver's fresh in-flight stage. Staleness is the newest
    // mtime across the stage's WHOLE tree: a stage whose root is old but
    // whose files are fresh is a LIVE long-running write, not garbage.
    val orphan = Files.list(Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.startsWith("t2.__stage-")).get
    val fresh = Paths.get(s"$dir/t2.__stage-fresh123")
    Files.createDirectories(fresh)
    val aged = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 7200_000L)
    // age the orphan's entire tree (root + every descendant)
    Files.walk(orphan).iterator().asScala.foreach(Files.setLastModifiedTime(_, aged))
    // a stage with an OLD root but a FRESH file deep inside = in-flight write
    val inflight = Paths.get(s"$dir/t2.__stage-inflight1")
    Files.createDirectories(inflight.resolve("_temporary").resolve("0"))
    Files.writeString(inflight.resolve("_temporary").resolve("0").resolve("part-x"), "w")
    Files.setLastModifiedTime(inflight, aged)
    Files.setLastModifiedTime(inflight.resolve("_temporary"), aged)
    StagedAppend.vacuumStages(s"$dir/t2", minAgeMs = 3600_000L)
    assert(!Files.exists(orphan), "aged orphan stage must be vacuumed")
    assert(Files.exists(fresh), "fresh (possibly in-flight) stage must be spared")
    assert(Files.exists(inflight),
      "a stage with any fresh descendant is a live write and must be spared")
  }

  test("crashed counter advance (tmp is the only copy) heals: promoted to main, never truncated in place") {
    import java.nio.file.Paths
    val dir = Files.createTempDirectory("graft-seqpromote-").toString
    def csv(p: String, rows: String): String = { Files.writeString(Paths.get(p), rows); p }
    val t = s"$dir/t"
    // a crash between delete(main) and rename(tmp→main) leaves the TMP as
    // the counter's ONLY copy
    Fs.mkdirs(t)
    Fs.writeString(s"$t/_graft_seq.tmp", "5")
    val s = FileIngest.ingest(spark, Seq(csv(s"$dir/a.csv", "id,name\n1,a\n")),
      t, s"$dir/l", s"$dir/d")
    assert(s.processedRows == 1)
    // the reservation resumed at the reserved-range bound (5), not 0 —
    // and the advance completed: main holds 6, no orphan tmp remains
    assert(spark.read.parquet(t).select("__seq").head().getLong(0) == 5L)
    assert(Files.readString(Paths.get(s"$t/_graft_seq")).trim.toLong == 6L)
    assert(!Files.exists(Paths.get(s"$t/_graft_seq.tmp")))
  }

  test("corrupt seq counter aborts loudly; a torn reservation tmp is safe by protocol") {
    import java.nio.file.Paths
    val dir = Files.createTempDirectory("graft-seqcorrupt-").toString
    def csv(p: String, rows: String): String = { Files.writeString(Paths.get(p), rows); p }
    val t = s"$dir/t"
    FileIngest.ingest(spark, Seq(csv(s"$dir/a.csv", "id,name\n1,a\n")),
      t, s"$dir/l", s"$dir/d")
    // the MAIN counter unparseable = real corruption: silently reading 0
    // would hand out low seq values and invert LWW — must abort loudly
    Files.writeString(Paths.get(s"$t/_graft_seq"), "not-a-number")
    val e = intercept[IllegalStateException] {
      FileIngest.ingest(spark, Seq(csv(s"$dir/b.csv", "id,name\n2,b\n")),
        t, s"$dir/l", s"$dir/d")
    }
    assert(e.getMessage.contains("corrupt"))
    assert(!Files.exists(Paths.get(s"$t/_graft_seq.lock"))) // lock released on abort
    // a torn TMP is the one unparseable state a crash can legitimately
    // produce (main survives until tmp is fully written) — reads as 0,
    // ingest proceeds from main. Restore main through the Fs layer (keeps
    // the local-FS checksum sidecar consistent — a java.nio rewrite would
    // read as ChecksumException corruption, which is the strict case above)
    graft.ingest.Fs.writeString(s"$t/_graft_seq", "1")
    graft.ingest.Fs.writeString(s"$t/_graft_seq.tmp", "")
    val s2 = FileIngest.ingest(spark, Seq(csv(s"$dir/c.csv", "id,name\n3,c\n")),
      t, s"$dir/l", s"$dir/d")
    assert(s2.processedRows == 1)
    assert(Files.readString(Paths.get(s"$t/_graft_seq")).trim.toLong == 2L)
  }
}
