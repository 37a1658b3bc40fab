package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One committed build slice: a contiguous docID-segment range with its
  * lineage + metrics (the north rule's per-partition checkpoint record).
  */
case class SliceMeta(
    sliceId: Int,
    segLo: Int,
    segHi: Int,
    docs: Long,
    postings: Long,
    blocks: Long,
    bytes: Long,
    committedAtMs: Long)

/** Parquet-backed index storage with a JSON manifest committed by atomic
  * rename. Layout:
  * {{{
  *   <root>/manifest.json
  *   <root>/postings/slice=<id>/  (parquet)
  *   <root>/docs/slice=<id>/      (parquet)
  *   <root>/norms/slice=<id>/     (parquet)
  *   <root>/terms/slice=<id>/     (parquet; partial df/cf, merged on read)
  * }}}
  * Only slices listed in the manifest are visible to readers — a crashed
  * build leaves orphan files that the next run overwrites. This is the
  * resume ledger (reference bulkupdate.py:137-219 semantics): completed
  * slices are skipped on restart, in-flight slices are rebuilt.
  */
final class IndexStore(val root: String) {
  private val rootPath: Path = Paths.get(root)
  private def manifestPath = rootPath.resolve("manifest.json")

  def exists: Boolean = Files.exists(manifestPath)

  def committedSlices: Seq[SliceMeta] =
    if (!exists) Seq.empty else ManifestJson.parse(Files.readString(manifestPath))._1

  /** Key-value facts that must commit ATOMICALLY with a slice (e.g. the
    * streaming replay guard's `stream.lastBatchId`) ride the manifest
    * itself — one rename covers both the slice list and the props, so no
    * crash window can separate them (unlike the settings file, a second
    * rename).
    */
  def manifestProps: Map[String, String] =
    if (!exists) Map.empty else ManifestJson.parse(Files.readString(manifestPath))._2

  /** Commit a slice: append to the manifest via write-tmp + atomic rename.
    * `props` merge into the manifest's props map in the SAME commit.
    */
  def commitSlice(meta: SliceMeta, props: Map[String, String] = Map.empty): Unit = {
    requireUnreservedKeys(props)
    val (slices, oldProps) =
      if (!exists) (Seq.empty[SliceMeta], Map.empty[String, String])
      else ManifestJson.parse(Files.readString(manifestPath))
    val updated = slices.filterNot(_.sliceId == meta.sliceId) :+ meta
    // committing an id REVIVES it: drop any dead-list entry for it in the
    // SAME rename. A fixed-id rebuild over a previously-merged store (the
    // builder always allocates slice ids 0..n-1) overwrites the dead
    // slice's files with live data — leaving the stale dead entry would
    // let a later vacuum ripen it and delete the LIVE slice's files.
    writeManifest(updated.sortBy(_.sliceId),
      (oldProps ++ props) - s"$DeadPrefix${meta.sliceId}")
  }

  /** Keys under `dead.` are RESERVED for the slice GC's dead-list (see
    * `deadSlices`): a caller prop like `dead.7` would read as "slice 7
    * superseded at t=…" and make `vacuum` delete a LIVE slice's files.
    * Every caller-facing prop entry point (`commitSlice`,
    * `setManifestProps`) routes through this guard; only the GC itself
    * (`mergeSlices` via `commitReplaceSlices`, `vacuum`) writes dead keys.
    */
  private def requireUnreservedKeys(props: Map[String, String]): Unit = {
    val reserved = props.keys.filter(_.startsWith(DeadPrefix))
    require(reserved.isEmpty,
      s"manifest prop keys under '$DeadPrefix' are reserved for the slice " +
        s"GC dead-list: ${reserved.mkString(", ")}")
  }

  /** Replace the manifest's slice list (merge/compaction commit); props
    * survive the rewrite and `addProps` merge in the SAME atomic rename —
    * the dead-list entries for superseded slices must become visible in
    * exactly the commit that supersedes them.
    */
  private[index] def commitReplaceSlices(
      metas: Seq[SliceMeta], addProps: Map[String, String] = Map.empty): Unit =
    // same revive rule as commitSlice: the manifest must never hold an id
    // both committed and dead (vacuum would delete a live slice's files)
    writeManifest(metas.sortBy(_.sliceId),
      (manifestProps ++ addProps) -- metas.map(m => s"$DeadPrefix${m.sliceId}"))

  /** Merge props into the manifest without touching the slice list.
    * `dead.` keys are rejected — see `requireUnreservedKeys`.
    */
  def setManifestProps(props: Map[String, String]): Unit = {
    requireUnreservedKeys(props)
    val (slices, oldProps) =
      if (!exists) (Seq.empty[SliceMeta], Map.empty[String, String])
      else ManifestJson.parse(Files.readString(manifestPath))
    writeManifest(slices, oldProps ++ props)
  }

  private def writeManifest(slices: Seq[SliceMeta], props: Map[String, String]): Unit = {
    Files.createDirectories(rootPath)
    val tmp = rootPath.resolve(s"manifest.json.tmp")
    Files.write(tmp, ManifestJson.render(slices, props).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Segment-merge compaction — the `_forcemerge` analogue (reference
    * opensearch_base_manager.py:379-387): rewrite all committed slices as
    * one snapshot with postings globally sorted by (term, seg, blk), so a
    * term's blocks are contiguous across the whole index and row-group
    * min/max stats prune term lookups maximally. Slice contents are
    * disjoint in (term, seg) — docID slices partition segments — so this
    * is a re-layout, not a re-block. Commit is atomic via manifest rename;
    * old slice files are NOT deleted here (concurrent readers hold
    * pre-compaction snapshots — see `mergeSlices`): they land on the
    * manifest dead-list, and callers reclaim the disk with
    * `vacuum(minAgeMs)` once in-flight readers have drained. A batch
    * caller that never vacuums keeps every superseded generation on disk.
    */
  def compact(spark: SparkSession): SliceMeta =
    mergeSlices(spark, committedSlices.map(_.sliceId))

  /** Merge a SUBSET of committed slices into one — the tiered-merge
    * primitive a continuously-indexed corpus needs (every micro-batch
    * append lands a fresh slice; unmerged, a term query touches N× more
    * files and serving holds N× more block objects). Slices partition
    * docID segments, so any subset's (term, seg) contents are disjoint and
    * the merge is a pure re-layout — blocks are never re-encoded, norms
    * never recomputed. Commit is atomic (manifest rename).
    *
    * Superseded slice FILES are NOT deleted here: a concurrent reader —
    * a distributed-path `OpenIndex` whose lazy Datasets still point at the
    * old slice paths, or a `ServingNode` mid-refresh — may hold a
    * pre-merge snapshot, and deleting under it fails its queries mid-
    * flight (the reference's OpenSearch holds deleted segments open until
    * readers drain). Instead the superseded ids land on a dead-list
    * carried in the SAME manifest commit; `vacuum(minAgeMs)` reclaims
    * them once every snapshot older than the grace window has drained.
    */
  def mergeSlices(spark: SparkSession, sliceIds: Seq[Int]): SliceMeta = {
    import org.apache.spark.sql.functions.{col, count => cnt, lit, sum => fsum}
    val all = committedSlices
    require(all.nonEmpty, s"nothing to compact at $root")
    val idSet = sliceIds.toSet
    val old = all.filter(s => idSet.contains(s.sliceId))
    require(old.map(_.sliceId).toSet == idSet,
      s"mergeSlices: not all of $sliceIds are committed at $root")
    val newId = all.map(_.sliceId).max + 1
    def readSub(table: String): DataFrame =
      spark.read.parquet(old.map(s => slicePath(table, s.sliceId)): _*)

    readSub("postings")
      .repartitionByRange(col("term"), col("seg"))
      .sortWithinPartitions(col("term"), col("seg"), col("blk"))
      .write.mode("overwrite").parquet(slicePath("postings", newId))
    readSub("terms")
      .groupBy("term")
      .agg(fsum("df").as("df"), fsum("cf").as("cf"))
      .write.mode("overwrite").parquet(slicePath("terms", newId))
    readSub("norms")
      .write.mode("overwrite").parquet(slicePath("norms", newId))
    readSub("docs")
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(slicePath("docs", newId))

    val nDocs = spark.read.parquet(slicePath("docs", newId)).count()
    val agg = spark.read.parquet(slicePath("postings", newId))
      .agg(fsum("n"), cnt(lit(1))).head()
    // real on-disk posting bytes (like the builder's dirBytes) — a zero
    // here would let any compacted index slip past serving memory budgets
    val postingBytes = {
      val p = Paths.get(slicePath("postings", newId))
      if (!Files.exists(p)) 0L
      else Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
    }
    val now = System.currentTimeMillis()
    val meta = SliceMeta(newId, old.map(_.segLo).min, old.map(_.segHi).max,
      nDocs, agg.getLong(0), agg.getLong(1),
      postingBytes, now)
    // supersede + dead-list in ONE atomic commit; files stay on disk for
    // in-flight readers until vacuum's grace window passes
    commitReplaceSlices(
      all.filterNot(s => idSet.contains(s.sliceId)) :+ meta,
      old.map(s => s"$DeadPrefix${s.sliceId}" -> now.toString).toMap)
    meta
  }

  private val DeadPrefix = "dead."

  /** Superseded-but-undeleted slices: sliceId → supersededAtMs. Parses
    * defensively — only `dead.<int>` → `<long>` entries count, so a
    * malformed key that slipped past `setManifestProps`' guard (e.g. a
    * hand-edited manifest) degrades to "not a dead entry" instead of
    * crashing every vacuum tick of the streaming loop.
    */
  def deadSlices: Map[Int, Long] =
    manifestProps.iterator.flatMap { case (k, v) =>
      if (!k.startsWith(DeadPrefix)) None
      else for {
        id <- k.stripPrefix(DeadPrefix).toIntOption
        at <- v.toLongOption
      } yield id -> at
    }.toMap

  /** Grace-period GC: delete the files of dead slices superseded at least
    * `minAgeMs` ago, then drop them from the dead-list. Any reader whose
    * manifest snapshot is younger than the grace window completes against
    * intact files; the streaming loop calls this each tick with a window
    * sized to the deployment's longest query. Returns (slices reclaimed,
    * bytes reclaimed). Crash-safe: deletion happens BEFORE the dead-list
    * entry is dropped, so a crash in between re-deletes a no-op next time.
    * Same single-writer model as merge/append: vacuum runs on the ONE
    * maintenance thread (the streaming loop), so the dead-list rewrite
    * here cannot race a merge commit — a second concurrent manifest
    * writer could lose dead-list entries added between this method's
    * re-read and its write.
    */
  def vacuum(minAgeMs: Long, nowMs: Long = System.currentTimeMillis()): (Int, Long) = {
    // Defense-in-depth against a manifest holding an id both committed and
    // dead (commit paths strip revived ids, but a pre-fix or hand-edited
    // manifest may still carry one): NEVER delete a committed id's files —
    // they are live data (a fixed-id rebuild overwrote the dead slice) —
    // just heal the manifest by dropping the stale dead entry.
    val live = committedSlices.map(_.sliceId).toSet
    val dead = deadSlices
    val revived = dead.keySet.filter(live)
    val ripe = dead.filter { case (id, at) => !live(id) && nowMs - at >= minAgeMs }
    var bytes = 0L
    ripe.keys.foreach { id =>
      Seq("postings", "terms", "norms", "docs").foreach { t =>
        val p = Paths.get(slicePath(t, id))
        if (Files.exists(p)) {
          val files = Files.walk(p).iterator().asScala.toSeq.reverse
          bytes += files.filter(Files.isRegularFile(_)).map(Files.size).sum
          files.foreach(Files.deleteIfExists(_))
        }
      }
    }
    if (ripe.nonEmpty || revived.nonEmpty) {
      val (slices, props) = ManifestJson.parse(Files.readString(manifestPath))
      writeManifest(slices,
        props -- (ripe.keys ++ revived).map(id => s"$DeadPrefix$id"))
    }
    (ripe.size, bytes)
  }

  /** Tiered merge policy: when more than `maxSlices` slices are committed,
    * repeatedly merge the `mergeFactor` smallest-by-bytes slices into one
    * until at most `maxSlices` remain. Like Lucene's TieredMergePolicy,
    * the big base slice is only rewritten when it is itself among the
    * smallest, so total rewrite work stays O(N log N) bytes over the life
    * of a continuously-appended index, while query-visible slice count —
    * and with it files-per-term-lookup and serving block objects — stays
    * bounded.
    */
  def maybeMerge(
      spark: SparkSession,
      maxSlices: Int = 16,
      mergeFactor: Int = 8): Seq[SliceMeta] = {
    require(maxSlices >= 1 && mergeFactor >= 2, "maxSlices >= 1, mergeFactor >= 2")
    val merged = scala.collection.mutable.ArrayBuffer.empty[SliceMeta]
    while (committedSlices.size > maxSlices) {
      val victims = committedSlices.sortBy(s => (s.bytes, s.sliceId))
        .take(math.min(mergeFactor, committedSlices.size - maxSlices + 1))
      merged += mergeSlices(spark, victims.map(_.sliceId))
    }
    merged.toSeq
  }

  def dropAll(): Unit = {
    if (Files.exists(rootPath)) {
      Files.walk(rootPath).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  def slicePath(table: String, sliceId: Int): String =
    s"$root/$table/slice=$sliceId"

  private def committedPaths(table: String): Seq[String] =
    committedSlices.map(s => slicePath(table, s.sliceId))

  private def readTable(spark: SparkSession, table: String): DataFrame = {
    val paths = committedPaths(table)
    require(paths.nonEmpty, s"index at $root has no committed slices")
    spark.read.parquet(paths: _*)
  }

  def open(spark: SparkSession): OpenIndex = {
    import spark.implicits._
    val postings = readTable(spark, "postings").as[PostingBlock]
    // norms and term stats are tiny relative to postings (one row per seg /
    // per distinct term); cache them so per-query idf lookups and the
    // seg-cogroup probe side don't re-scan parquet on every search
    val norms = readTable(spark, "norms").as[SegNorms].cache()
    // per-slice partial term stats merge to global df/cf (slices partition
    // docs, so per-term partials are additive)
    val terms = readTable(spark, "terms")
      .groupBy("term")
      .agg(sum("df").as("df"), sum("cf").as("cf"))
      .as[TermStat]
      .cache()
    val docs = readTable(spark, "docs")
    val slices = committedSlices
    OpenIndex(this, postings, norms, terms, docs, slices)
  }

  // ---- settings / mappings management surface (the reference's
  // get-settings / get-mappings / get-aliases getters,
  // opensearch_base_manager.py:484-534; aliases live in AliasCatalog).
  // Stored as flat JSON next to the manifest, committed by atomic rename,
  // so drop-and-recreate can round-trip user settings through
  // `Cleanup.recreateSettings` without the caller re-supplying them. ----

  private def kvPath(kind: String) = rootPath.resolve(s"$kind.json")

  private def writeKv(kind: String, m: Map[String, String]): Unit = {
    Files.createDirectories(rootPath)
    val tmp = rootPath.resolve(s"$kind.json.tmp")
    Files.write(tmp, FlatJson.render(m).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, kvPath(kind), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def readKv(kind: String): Map[String, String] =
    if (!Files.exists(kvPath(kind))) Map.empty
    else FlatJson.parse(Files.readString(kvPath(kind)))

  /** Engine-assigned identity settings, stamped at first write (the
    * reference's creation_date/uuid/provided_name class — exactly what
    * `Cleanup.recreateSettings` must strip on recreate).
    */
  def setSettings(settings: Map[String, String]): Unit = {
    val existing = readKv("settings")
    // engine-assigned identity: stamped once at first write, never
    // caller-writable afterwards (the reference's immutable class)
    val identity =
      if (existing.isEmpty) Map(
        "creation_date" -> System.currentTimeMillis().toString,
        "uuid" -> java.util.UUID.randomUUID().toString,
        "provided_name" -> rootPath.getFileName.toString)
      else existing.view.filterKeys(immutableKey).toMap
    // merge semantics (the reference's PUT-settings): supplied keys update,
    // unmentioned user keys survive, immutable keys are never writable
    val user = existing.view.filterKeys(k => !immutableKey(k)).toMap ++
      settings.view.filterKeys(k => !immutableKey(k)).toMap
    writeKv("settings", user ++ identity)
  }

  private def immutableKey(k: String) =
    graft.ingest.Cleanup.ImmutableSettings.contains(k)

  def settings: Map[String, String] = readKv("settings")

  /** Field-name → mapping-type-name table (the reference's mappings
    * getter; the type names are the `Coerce.FieldType` vocabulary).
    */
  def setMappings(mappings: Map[String, String]): Unit = writeKv("mappings", mappings)
  def mappings: Map[String, String] = readKv("mappings")

  /** Corpus stats derived from committed slice metrics + docs table. */
  def stats(spark: SparkSession): IndexStats = {
    // distinct: per-slice partial term rows merge to one global term each
    val nTerms = readTable(spark, "terms").select("term").distinct().count()
    IndexStats.fromDocs(readTable(spark, "docs"), nTerms)
  }
}

case class OpenIndex(
    store: IndexStore,
    postings: Dataset[PostingBlock],
    norms: Dataset[SegNorms],
    terms: Dataset[TermStat],
    docs: DataFrame,
    slices: Seq[SliceMeta]) {
  lazy val stats: IndexStats = store.stats(docs.sparkSession)

  /** Norms broadcast for the low-latency query path: collected once per
    * open index when the segment count is modest (norms are ~5 bytes/doc;
    * 4096 segs of 64Ki docs ≈ 1.3 GB corpus-side but only the doclen
    * payload travels). Indexes beyond the threshold fall back to the
    * cogroup path — at 10^12 docs the norms table is executor-side state,
    * not driver-broadcastable.
    */
  /** Driver-side term→df lookup for the low-latency query path: resolves
    * query-term stats without a per-query Spark job (one cached collect at
    * first use). Bounded: past the threshold (web-scale vocabularies don't
    * fit driver memory) queries fall back to the filtered-collect path,
    * which row-group stats keep cheap on the compacted terms table.
    */
  lazy val termsLocal: Option[Map[String, Long]] = {
    val spark = docs.sparkSession
    val maxTerms = spark.conf.getOption("graft.query.localTermsMaxCount")
      .map(_.toLong).getOrElse(1L << 20)
    if (terms.count() <= maxTerms)
      Some(terms.collect().map(t => t.term -> t.df).toMap)
    else None
  }

  lazy val normsBroadcast: Option[org.apache.spark.broadcast.Broadcast[Map[Int, SegNorms]]] = {
    val spark = docs.sparkSession
    val maxSegs = spark.conf.getOption("graft.query.broadcastNormsMaxSegs")
      .map(_.toInt).getOrElse(4096)
    if (norms.count() <= maxSegs)
      Some(spark.sparkContext.broadcast(norms.collect().map(n => n.seg -> n).toMap))
    else None
  }
}

/** Flat string→string JSON object (settings/mappings files, no deps). */
private[index] object FlatJson {
  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case o => sb += o; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  def render(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")

  private val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
  def parse(json: String): Map[String, String] =
    pair.findAllMatchIn(json).map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
}

/** Minimal hand-rolled JSON for the manifest (flat schema, no deps). */
private[index] object ManifestJson {
  def render(slices: Seq[SliceMeta], props: Map[String, String] = Map.empty): String = {
    val items = slices.map { s =>
      s"""{"sliceId":${s.sliceId},"segLo":${s.segLo},"segHi":${s.segHi},"docs":${s.docs},""" +
        s""""postings":${s.postings},"blocks":${s.blocks},"bytes":${s.bytes},"committedAtMs":${s.committedAtMs}}"""
    }
    val propsPart = if (props.isEmpty) "" else s""""props":${FlatJson.render(props)},"""
    s"""{"format":"graft-index-v1",$propsPart"slices":[${items.mkString(",")}]}"""
  }

  private val num = """"(\w+)"\s*:\s*(-?\d+)""".r
  def parse(json: String): (Seq[SliceMeta], Map[String, String]) = {
    // props object (flat string map) sits between "props":{ and its
    // matching } — scan string-aware so a '}' inside a value can't truncate
    val (props, propsEnd) = {
      val tag = "\"props\":{"
      val at = json.indexOf(tag)
      if (at < 0) (Map.empty[String, String], 0)
      else {
        var i = at + tag.length
        var inStr = false
        var esc = false
        var end = -1
        while (end < 0 && i < json.length) {
          val c = json.charAt(i)
          if (esc) esc = false
          else if (inStr && c == '\\') esc = true
          else if (c == '"') inStr = !inStr
          else if (!inStr && c == '}') end = i
          i += 1
        }
        (FlatJson.parse(json.substring(at + tag.length - 1, end + 1)), end + 1)
      }
    }
    // anchor the slice array AFTER the props object — a prop VALUE is an
    // open caller-extensible string and may itself contain the literal
    // "slices": (render order is format, props, slices, so the first
    // post-props occurrence is the real one)
    val body = json.substring(json.indexOf('[', json.indexOf("\"slices\":", propsEnd)),
      json.lastIndexOf(']') + 1)
    val objs = mutable.ArrayBuffer.empty[SliceMeta]
    var depth = 0
    var start = -1
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '{' => if (depth == 0) start = i; depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) {
            val fields = num.findAllMatchIn(body.substring(start, i + 1))
              .map(m => m.group(1) -> m.group(2).toLong).toMap
            objs += SliceMeta(
              fields("sliceId").toInt, fields("segLo").toInt, fields("segHi").toInt,
              fields("docs"), fields("postings"), fields("blocks"), fields("bytes"),
              fields("committedAtMs"))
          }
        case _ =>
      }
      i += 1
    }
    (objs.toSeq, props)
  }
}

/** Alias = atomic indirection pointer (reference switch_alias.py:306-329):
  * a tiny JSON manifest mapping alias → index root, switched by atomic
  * rename so readers never observe a half-switch.
  */
final class AliasCatalog(dir: String) {
  private val dirPath = Paths.get(dir)
  private def path(alias: String) = dirPath.resolve(s"$alias.alias.json")

  def resolve(alias: String): Option[String] =
    if (!Files.exists(path(alias))) None
    else {
      val s = Files.readString(path(alias))
      val m = """"target"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(s)
      m.map(_.group(1))
    }

  def set(alias: String, target: String): Unit = {
    Files.createDirectories(dirPath)
    val tmp = dirPath.resolve(s"$alias.alias.json.tmp")
    Files.write(tmp, s"""{"alias":"$alias","target":"$target"}""".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path(alias), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def delete(alias: String): Unit = Files.deleteIfExists(path(alias))
}
