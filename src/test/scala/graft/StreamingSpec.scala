package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamIngest

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("docStream: micro-batch staging ingest with coercion + ledger") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream-").toString
    val src = s"$base/src"
    val df1 = Seq((1L, "  alpha  ", 1.5), (2L, "beta", 2.5)).toDF("id", "name", "value")
    df1.write.mode("append").parquet(src)

    val q = StreamIngest.docStream(spark, src, df1.schema,
      s"$base/staging", s"$base/ledger", s"$base/ckpt")
    q.processAllAvailable()
    q.stop()

    val staged = spark.read.parquet(s"$base/staging")
    assert(staged.count() == 2)
    // coercion applied in-stream: trimmed strings, numerics → double
    assert(staged.filter(col("id") === 1.0).head().getAs[String]("name") == "alpha")
    assert(spark.read.parquet(s"$base/ledger").agg(sum("rows")).head().getLong(0) == 2)

    // second micro-batch: new file arrives, checkpoint resumes, no rework
    Seq((3L, "gamma", 3.5)).toDF("id", "name", "value")
      .write.mode("append").parquet(src)
    val q2 = StreamIngest.docStream(spark, src, df1.schema,
      s"$base/staging", s"$base/ledger", s"$base/ckpt")
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(s"$base/staging").count() == 3) // only the new row appended
  }

  test("eventCounts: watermarked windowed aggregation over a stream") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream-ev-").toString
    val events = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), "buy", 5.0))
      .toDF("ts", "event_type", "value")
    events.write.parquet(s"$base/src")

    val stream = spark.readStream.schema(events.schema).parquet(s"$base/src")
    val agg = StreamIngest.eventCounts(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ev_out")
      .option("checkpointLocation", s"$base/ckpt").start()
    q.processAllAvailable()
    q.stop()

    val out = spark.sql("SELECT event_type, n, total_value FROM ev_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set(("click", 2L, 3.0), ("buy", 1L, 5.0)))
  }
}
