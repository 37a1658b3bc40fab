package graft.ingest

/** Bounded driver-side retry with exponential backoff for transient sink
  * failures — the reference retries its bulk/ledger HTTP calls 3 times at
  * 1s/2s/4s before failing the unit (opensearch_base_manager.py:97-132).
  * Spark task retries already cover executor-side work; this covers the
  * DRIVER-side ledger/DLQ/target writes, where a transient FS hiccup would
  * otherwise fail the whole file/group.
  *
  * Safety: retrying a Spark parquet append is duplicate-free at the job
  * level (FileOutputCommitter v1 publishes output only in commitJob, so a
  * failed attempt leaves nothing visible), and for id-keyed targets even a
  * partially-committed attempt resolves away under the seq-stamped LWW
  * view (`FileIngest.resolveLww`) — the same property that makes the
  * reference's `_id` bulk retries idempotent.
  */
object Retry {

  /** Test-only fault injection: return true to make (label, attempt)
    * throw before the body runs. Null in production.
    */
  @volatile var injectFault: (String, Int) => Boolean = null

  def apply[T](label: String, attempts: Int = 3)(f: => T): T = {
    val base = sys.props.get("graft.ingest.retryBaseMs").map(_.toLong).getOrElse(1000L)
    var attempt = 1
    var out: Option[T] = None
    while (out.isEmpty) {
      try {
        val inj = injectFault
        if (inj != null && inj(label, attempt))
          throw new RuntimeException(s"injected fault: $label attempt $attempt")
        out = Some(f)
      } catch {
        case e: Exception =>
          if (attempt >= attempts) throw e
          Thread.sleep(base << (attempt - 1)) // 1s, 2s, 4s at the default base
          attempt += 1
      }
    }
    out.get
  }
}

/** Filesystem probes through Spark's Hadoop FS layer — `java.io.File`
  * checks silently report false on hdfs:// / s3a:// paths, turning guards
  * into unconditional aborts (and resume into a ledger-ignoring no-op).
  */
object Fs {
  private def conf = org.apache.spark.sql.SparkSession.getActiveSession
    .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
    .map(_.sparkContext.hadoopConfiguration)
    .getOrElse(new org.apache.hadoop.conf.Configuration())

  def exists(path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf).exists(p)
  }

  /** Small sidecar writes/reads (e.g. a layout's stats.json) through the
    * same FS the data uses — java.nio would silently target the LOCAL fs
    * for an hdfs:///s3a:// layout and fail only after the heavy writes.
    */
  def writeString(path: String, s: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readString(path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(conf).open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}
