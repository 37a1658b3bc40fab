package graft.ops

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.analysis.Analyzer

/** Static kernels for the dedup sketch expressions. Standalone object —
  * NOT a companion — so the generated Java's static calls survive Janino
  * (see graft.analysis.Kernels).
  *
  * The 128-bit shingle hash (h1, h2) combines TWO hash families: h1 is
  * the existing polynomial `Hash64` (the minhash permutations are seeded
  * from it, so signatures stay bit-identical to the string path) and h2
  * an xxhash64-family block hash. Downstream equality on (h1, h2)
  * collides only when both collide — ~2^(80-128) expected colliding
  * PAIRS at 100 TB (~2^40 distinct shingles), where a single 64-bit key
  * would already collide for ~2^16 pairs — and the mixed families mean
  * no known adversarial construction (anti-polynomial Thue-Morse
  * strings break every odd-base polynomial mod 2^64 at once) collides
  * both.
  */
object DedupKernels {

  /** h2: xxhash64 over the UTF-8 bytes — a DIFFERENT hash family from
    * the polynomial h1, deliberately: two polynomial hashes mod 2^64
    * share the classic anti-polynomial collision constructions
    * (Thue-Morse-style strings collide for every odd base at once), so
    * "128-bit" equality from two polynomials degrades to one family
    * under adversarial text. An avalanche-based block hash has no known
    * joint collision family with the polynomial.
    */
  def hash64b(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }

  /** Exact Jaccard of two DISTINCT 128-bit shingle-hash arrays in
    * O(|A|+|B|) via one hash set — `array_intersect`/`array_union` on
    * struct elements fall off Spark's fast path (structs have no "proper
    * equals" there) into O(|A|·|B|) ordering scans per pair.
    *
    * Two EMPTY sets return -Infinity: Spark's (non-ANSI) Divide yields
    * NULL on a zero divisor, which the miner's `>= threshold` filter
    * dropped — raw Java 0/0 would give NaN, and Spark compares NaN
    * GREATER than everything, silently passing the filter. -Inf fails
    * every finite threshold exactly as the old NULL did.
    */
  def jaccard128(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val seen = new java.util.HashSet[(Long, Long)](math.max(16, na * 2))
    var i = 0
    while (i < na) {
      val r = a.getStruct(i, 2)
      seen.add((r.getLong(0), r.getLong(1)))
      i += 1
    }
    var common = 0
    i = 0
    while (i < nb) {
      val r = b.getStruct(i, 2)
      if (seen.contains((r.getLong(0), r.getLong(1)))) common += 1
      i += 1
    }
    val union = na + nb - common
    if (union == 0) Double.NegativeInfinity else common.toDouble / union.toDouble
  }

  private val shType = new StructType()
    .add("h1", LongType, nullable = false)
    .add("h2", LongType, nullable = false)
  val shingleArrayType: ArrayType = ArrayType(shType, containsNull = false)

  /** Distinct 128-bit hashes of the k-token shingles (`whole = true`:
    * `Dedup.shingles` semantics — a short doc yields its whole token
    * stream as one shingle; `whole = false`: `Dedup.tokenWindows` — a doc
    * shorter than k yields nothing). The string distinct runs FIRST, so
    * the set is exactly `shingles(...).distinct` hashed; first-occurrence
    * order preserved.
    */
  def shingleHashes(s: UTF8String, k: Int, whole: Boolean): ArrayData = {
    val toks = Analyzer.tokenize(s.toString)
    val sh =
      if (whole) Dedup.shingles(toks, k).distinct
      else Dedup.tokenWindows(toks, k).distinct
    val out = new Array[AnyRef](sh.length)
    var i = 0
    while (i < sh.length) {
      val str = sh(i)
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](Hash64(str), hash64b(str)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Band keys of the minhash signature derived from the h1 components of
    * a 128-bit shingle-hash array: sig = minhashSignature(h1s, m, seed)
    * (bit-identical to the string path — Hash64 of the shingle IS h1),
    * then one 64-bit polynomial fold per band of r = m/bands rows. Band
    * equality ⟺ the r signature rows are equal, modulo fold collisions —
    * which only ADD candidate pairs (merged buckets) that the exact
    * Jaccard verify removes, never remove true ones.
    */
  def minhashBandKeys(sh: ArrayData, m: Int, bands: Int, seed: Long): ArrayData = {
    val n = sh.numElements()
    val h1 = new Array[Long](n)
    var i = 0
    while (i < n) { h1(i) = sh.getStruct(i, 2).getLong(0); i += 1 }
    val sig = Dedup.minhashSignature(h1, m, seed)
    val r = m / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < r) { h = (h ^ sig(b * r + j)) * Hash64.Base; j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  def simhash64(s: UTF8String): Long =
    Dedup.simhash64(Analyzer.tokenize(s.toString))
}

/** Codegen'd distinct k-token shingle/window 128-bit hashes — ONE pass
  * per document replacing the typed-Dataset tokenize+shingle flatMap (no
  * Row ser/de hop, no raw shingle strings downstream: the pair miners
  * shuffle 16-byte keys instead of 50-100-byte token strings).
  */
case class ShingleHash128(child: Expression, k: Int, whole: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = DedupKernels.shingleArrayType
  override def prettyName: String = "graft_shingle_hash128"

  override def nullSafeEval(input: Any): Any =
    DedupKernels.shingleHashes(input.asInstanceOf[UTF8String], k, whole)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.DedupKernels.shingleHashes($c, $k, $whole);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash128 =
    copy(child = newChild)
}

/** Codegen'd minhash band keys over a 128-bit shingle-hash array. */
case class MinhashBandKeys(child: Expression, m: Int, bands: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override def nullSafeEval(input: Any): Any =
    DedupKernels.minhashBandKeys(input.asInstanceOf[ArrayData], m, bands, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.DedupKernels.minhashBandKeys($c, $m, $bands, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): MinhashBandKeys =
    copy(child = newChild)
}

/** Codegen'd O(|A|+|B|) exact Jaccard over 128-bit shingle-hash arrays. */
case class JaccardHash128(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard128"

  override def nullSafeEval(a: Any, b: Any): Any =
    DedupKernels.jaccard128(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ops.DedupKernels.jaccard128($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardHash128 =
    copy(left = l, right = r)
}

/** Codegen'd tokenize + SimHash-64 in one pass. */
case class SimhashText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    DedupKernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.DedupKernels.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimhashText =
    copy(child = newChild)
}

private[ops] object dedupFunctions {
  def shingleHashes(c: Column, k: Int, whole: Boolean): Column =
    GraftBridge.column(ShingleHash128(
      GraftBridge.expression(c.cast("string")), k, whole))
  def minhashBandKeys(c: Column, m: Int, bands: Int, seed: Long): Column =
    GraftBridge.column(MinhashBandKeys(GraftBridge.expression(c), m, bands, seed))
  def simhash64(c: Column): Column =
    GraftBridge.column(SimhashText(GraftBridge.expression(c.cast("string"))))
  def jaccard128(a: Column, b: Column): Column =
    GraftBridge.column(JaccardHash128(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
