package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The reference's `_bulk` NDJSON wire contract
  * (reference file_processor.py:235-261): each document becomes an action
  * line + a source line,
  * {{{
  *   {"index": {"_index": "<idx>", "_id": "<id>"}}   // _id only when present
  *   {"field": ..., ...}
  * }}}
  * Provided for interoperability (exporting a Spark pipeline's output to
  * an OpenSearch-compatible consumer) and as the shape-parity surface for
  * the reference's bulk-request tests (test_file_processor.py:182-212).
  * Pure column expressions — renders distributed at scan speed.
  */
object BulkFormat {

  /** Render each row as the two-line bulk entry. `idCol`, when present in
    * the schema and non-null, becomes `_id` (upsert semantics); rows
    * without it get insert-only actions (reference README.md:192-198).
    */
  def toBulkNdjson(df: DataFrame, indexName: String, idCol: String = "id"): Dataset[String] = {
    import df.sparkSession.implicits._
    val hasId = df.columns.contains(idCol)
    val action =
      if (hasId)
        when(col(idCol).isNotNull,
          concat(lit(s"""{"index": {"_index": "$indexName", "_id": """"),
            col(idCol).cast("string"), lit("\"}}")))
          .otherwise(lit(s"""{"index": {"_index": "$indexName"}}"""))
      else lit(s"""{"index": {"_index": "$indexName"}}""")
    // the reference's json.dumps keeps null fields (file_processor.py:259);
    // Spark's to_json drops them by default — disable that for parity
    val source = to_json(struct(df.columns.map(col).toIndexedSeq: _*),
      Map("ignoreNullFields" -> "false"))
    df.select(concat(action, lit("\n"), source).as("entry")).as[String]
  }

  /** Group entries into batches of `batchSize` docs (reference default
    * 10,000, file_processor.py:33), each batch one NDJSON payload.
    * Batching is per-partition (a request buffer is a worker-local
    * concern); batch boundaries are deterministic within a partition.
    */
  def toBatches(entries: Dataset[String], batchSize: Int = 10000): Dataset[String] = {
    import entries.sparkSession.implicits._
    entries.mapPartitions(_.grouped(batchSize).map(_.mkString("\n")))
  }
}
