package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]). Two paths:
  *  - brute-force cosine top-k: the correctness baseline. All arithmetic
  *    in double precision via `zip_with`/`aggregate` (codegen-friendly
  *    higher-order functions, no UDF).
  *  - LSH-bucketed (random hyperplanes): the scale path. Each vector maps
  *    to a deterministic sign-bit bucket; queries probe only their bucket
  *    (optionally with multi-probe), turning the O(N·Q) scan into a
  *    bucket-local join.
  */
object Ann {

  /** Cosine similarity of two array<double> columns, computed in a fixed
    * sequential fold order (index ascending) for cross-engine parity.
    * Uses the codegen'd DotProduct expression (graft.analysis).
    */
  def cosine(a: Column, b: Column): Column =
    graft.analysis.functions.dot(a, b) /
      (sqrt(graft.analysis.functions.dot(a, a)) * sqrt(graft.analysis.functions.dot(b, b)))

  /** Cosine with the norms precomputed per row (hoisted out of pair
    * joins: dot(v,v) per vector once, not per pair — same arithmetic,
    * same bits, ~3× less work on dense pair scans).
    */
  private def cosineHoisted(a: Column, normA: Column, b: Column, normB: Column): Column =
    graft.analysis.functions.dot(a, b) / (normA * normB)

  private def withNorm(df: DataFrame, idCol: String, idAs: String, vecAs: String): DataFrame =
    df.select(col(idCol).cast("long").as(idAs),
      col("__vec").as(vecAs), col("__norm").as(vecAs + "_norm"))

  private def prep(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__vec"))
      .withColumn("__norm", sqrt(graft.analysis.functions.dot(col("__vec"), col("__vec"))))

  /** Brute-force exact top-k neighbors for each query vector.
    * `queries` is expected to be small (it is broadcast); the big side
    * streams once with no shuffle until the final per-query top-k, which
    * Spark plans as partial top-k + merge via window rank.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = withNorm(prep(corpus, idCol, vecCol), idCol, "nbr_id", "v_c")
    val q = withNorm(prep(queries, idCol, vecCol), idCol, "query_id", "v_q")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineHoisted(col("v_q"), col("v_q_norm"), col("v_c"), col("v_c_norm")))
      .select("query_id", "nbr_id", "cosine")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cosine", "rank")
  }

  /** Deterministic random hyperplanes: nPlanes vectors of dim entries in
    * [-1, 1), derived from splitmix64(seed, plane, coord).
    */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { d =>
        val h = Hash64.splitmix64(seed + p.toLong * 131071L + d)
        (h >>> 11) * 1.1102230246251565e-16 * 2.0 - 1.0
      }
    }

  /** Sign-bit LSH bucket id of a vector under the given hyperplanes. */
  def signBucket(vec: Array[Double], planes: Array[Array[Double]]): Long = {
    var key = 0L
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      val pl = planes(p)
      var i = 0
      val n = math.min(vec.length, pl.length)
      while (i < n) { dot += vec(i) * pl(i); i += 1 }
      if (dot >= 0) key |= (1L << p)
      p += 1
    }
    key
  }

  /** LSH-bucketed ANN: join queries to corpus within matching buckets and
    * rank by exact cosine inside the bucket. Recall < 1 by construction;
    * `nPlanes` trades recall vs bucket size.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 12, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val planes = hyperplanes(dim, nPlanes, seed)
    val bucketOf = udf((v: Seq[Double]) => signBucket(v.toArray, planes))

    def withBucket(df: DataFrame, id: String, vec: String) = df
      .select(col(idCol).cast("long").as(id),
        col(vecCol).cast("array<double>").as(vec))
      .withColumn("bucket", bucketOf(col(vec)))

    val c = withBucket(corpus, "nbr_id", "v_c")
    val q = withBucket(queries, "query_id", "v_q")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    c.join(broadcast(q), "bucket")
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("v_q"), col("v_c")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cosine", "rank")
  }

  /** Deterministic k-means coarse quantizer for IVF: trains on a bounded
    * sample (first `trainCap` by id — deterministic), L2-normalized so
    * euclidean cells align with cosine similarity. Returns centroids.
    */
  def trainIvfCentroids(df: DataFrame, nCells: Int, iters: Int = 8,
      seed: Long = 42L, trainCap: Int = 10000,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    val sample = df.orderBy(col(idCol)).limit(trainCap)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty training sample")
    def normalize(v: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
      v.map(_ * inv)
    }
    val data = sample.map(normalize)
    val k = math.min(nCells, data.length)
    // seeded distinct-index init
    var centroids = {
      val picked = scala.collection.mutable.LinkedHashSet.empty[Int]
      var s = seed
      while (picked.size < k) {
        s = Hash64.splitmix64(s)
        picked += math.floorMod(s, data.length.toLong).toInt
      }
      picked.toArray.map(i => data(i).clone())
    }
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        while (i < v.length) { val x = v(i) - cs(c)(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](data(0).length))
      val counts = new Array[Int](k)
      data.foreach { v =>
        val c = nearest(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // keep empty cells stable
        else normalize(sums(c).map(_ / counts(c)))
      }
      it += 1
    }
    centroids
  }

  /** IVF ANN: assign corpus vectors to their nearest centroid cell, probe
    * the `nProbe` nearest cells per query, rank by exact cosine within the
    * probed cells. The cell assignment is the partition key at scale —
    * queries touch nProbe/nCells of the corpus.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val centroids = trainIvfCentroids(corpus, nCells, seed = seed,
      idCol = idCol, vecCol = vecCol)
    val bc = spark.sparkContext.broadcast(centroids)
    val cellOf = udf { (v: Seq[Double]) =>
      val cs = bc.value
      var s = 0.0; v.foreach(x => s += x * x)
      val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
      val n = v.map(_ * inv).toArray
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        while (i < n.length) { val x = n(i) - cs(c)(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    val probesOf = udf { (v: Seq[Double]) =>
      val cs = bc.value
      var s = 0.0; v.foreach(x => s += x * x)
      val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
      val n = v.map(_ * inv).toArray
      cs.indices.map { c =>
        var d = 0.0; var i = 0
        while (i < n.length) { val x = n(i) - cs(c)(i); d += x * x; i += 1 }
        (d, c)
      }.sortBy(_._1).take(nProbe).map(_._2)
    }
    val c = withNorm(prep(corpus, idCol, vecCol), idCol, "nbr_id", "v_c")
      .withColumn("cell", cellOf(col("v_c")))
    val q = withNorm(prep(queries, idCol, vecCol), idCol, "query_id", "v_q")
      .withColumn("cell", explode(probesOf(col("v_q"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    c.join(broadcast(q), "cell")
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineHoisted(col("v_q"), col("v_q_norm"), col("v_c"), col("v_c_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cosine", "rank")
  }

  /** Embedding near-duplicate pairs: all (a < b) with cosine ≥ threshold.
    * Exact quadratic form for oracle parity; the scale path buckets by
    * LSH first (`lshNearDupPairs`).
    */
  def nearDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = prep(df, idCol, vecCol)
    val a = withNorm(p, idCol, "id_a", "v_a")
    val b = withNorm(p, idCol, "id_b", "v_b")
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        cosineHoisted(col("v_a"), col("v_a_norm"), col("v_b"), col("v_b_norm")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
