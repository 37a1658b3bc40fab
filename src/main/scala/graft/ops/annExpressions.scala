package graft.ops

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static kernels for the ANN bucket-key expressions. Standalone object —
  * NOT a companion — so the generated Java's static calls survive Janino
  * (Scala emits no static forwarders when a companion class exists; see
  * graft.analysis.Kernels).
  */
object AnnKernels {

  /** Sign-bit bucket of a vector under one table's hyperplanes; identical
    * arithmetic and fold order to `Ann.signBucket`.
    */
  def signBucket(v: ArrayData, planes: Array[Array[Double]]): Long = {
    var key = 0L
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      val pl = planes(p)
      var i = 0
      val n = math.min(v.numElements(), pl.length)
      while (i < n) { dot += v.getDouble(i) * pl(i); i += 1 }
      if (dot >= 0) key |= (1L << p)
      p += 1
    }
    key
  }

  /** All (table-tagged) bucket keys of a vector: per table the base key,
    * plus every ≤`probeBits`-bit-flip probe key (query-side multi-probe).
    * `probeBits = 0` is the corpus-side single-key-per-table form.
    */
  def lshKeys(v: ArrayData, tables: Array[Array[Array[Double]]], probeBits: Int): ArrayData = {
    val nPlanes = if (tables.length == 0) 0 else tables(0).length
    var perTable = 1
    if (probeBits >= 1) perTable += nPlanes
    if (probeBits >= 2) perTable += nPlanes * (nPlanes - 1) / 2
    val out = new Array[Long](tables.length * perTable)
    var w = 0
    var t = 0
    while (t < tables.length) {
      val tag = t.toLong << (nPlanes + 1)
      val base = signBucket(v, tables(t))
      out(w) = tag | base; w += 1
      if (probeBits >= 1) {
        var i = 0
        while (i < nPlanes) {
          out(w) = tag | (base ^ (1L << i)); w += 1
          if (probeBits >= 2) {
            var j = i + 1
            while (j < nPlanes) { out(w) = tag | (base ^ (1L << i) ^ (1L << j)); w += 1; j += 1 }
          }
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Exact cosine of two corpus vectors looked up by id from a broadcast
    * (vector, norm) map — the LSH verify stage's kernel. Identical
    * arithmetic and fold order to `Ann.cosine` with hoisted norms
    * (ascending-index dot, then one divide by the norm product), so the
    * result is bit-identical to the former broadcast-join formulation —
    * without materializing two array<double> payload copies per candidate
    * row through two hash joins.
    */
  def cosineById(a: Long, b: Long, bcObj: AnyRef): Double = {
    val m = bcObj.asInstanceOf[org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[java.lang.Long, (Array[Double], Double)]]].value
    val ea = m.get(a)
    val eb = m.get(b)
    // every candidate id comes from the same relation the map was built
    // over — a miss means the invariant broke (e.g. a recomputed cache
    // block over a changed source); name the id instead of MatchError
    require(ea != null && eb != null,
      s"vector id ${if (ea == null) a else b} missing from the broadcast verify map")
    val (va, na) = ea
    val (vb, nb) = eb
    val n = math.min(va.length, vb.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += va(i) * vb(i); i += 1 }
    // zero-norm pair: Spark's Divide made the join-form cosine NULL and
    // the threshold filter dropped it; raw 0/0 would be NaN, which Spark
    // compares GREATER than everything — -Inf preserves the drop
    val d = na * nb
    if (d == 0.0) Double.NegativeInfinity else s / d
  }

  /** Indices of the `n` nearest centroids to the L2-normalized vector,
    * ordered by (distance asc, index asc) — bit-identical to the former
    * UDF's normalize + squared-distance + stable sortBy.
    */
  def ivfCells(v: ArrayData, centroids: Array[Array[Double]], n: Int): ArrayData = {
    val len = v.numElements()
    var s = 0.0
    var i = 0
    while (i < len) { val x = v.getDouble(i); s += x * x; i += 1 }
    val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
    val nv = new Array[Double](len)
    i = 0
    while (i < len) { nv(i) = v.getDouble(i) * inv; i += 1 }
    val ds = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      var d = 0.0
      val ct = centroids(c)
      var k = 0
      while (k < len) { val x = nv(k) - ct(k); d += x * x; k += 1 }
      ds(c) = d
      c += 1
    }
    val idx = Array.range(0, centroids.length)
    val sorted = idx.sortBy(ci => (ds(ci), ci))
    new GenericArrayData(sorted.take(math.min(n, sorted.length)))
  }
}

/** Codegen'd LSH bucket-key generation — the corpus-side hot path of
  * `Ann.lshTopK`/`lshNearDupPairs` runs this over every row at scale, so
  * it must stay inside whole-stage codegen instead of paying the ScalaUDF
  * serialization hop. The hyperplane tables ride the plan as a reference
  * object (`ctx.addReferenceObj`), exactly how Spark ships literal arrays.
  */
case class LshBucketKeys(child: Expression,
    tables: Array[Array[Array[Double]]], probeBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_keys"

  override def nullSafeEval(input: Any): Any =
    AnnKernels.lshKeys(input.asInstanceOf[ArrayData], tables, probeBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshTables", tables, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.AnnKernels.lshKeys($c, $ref, $probeBits);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketKeys =
    copy(child = newChild)
}

/** Codegen'd IVF cell assignment (nearest-`n` centroid indices) — the
  * corpus-side counterpart for `Ann.ivfTopK`.
  */
case class IvfCells(child: Expression, centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ivf_cells"

  override def nullSafeEval(input: Any): Any =
    AnnKernels.ivfCells(input.asInstanceOf[ArrayData], centroids, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.AnnKernels.ivfCells($c, $ref, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCells =
    copy(child = newChild)
}

/** Codegen'd exact-cosine verify by id lookup against a broadcast
  * (vector, norm) map — replaces two broadcast hash joins that copied the
  * full vector payload into every candidate row. Only used when the
  * vector table fits the broadcast budget (the same condition the join
  * form required); the handle is a real Spark Broadcast, so executors
  * fetch the map once, not per task closure.
  */
case class CosineByIds(left: Expression, right: Expression,
    vecs: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[java.lang.Long, (Array[Double], Double)]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_by_id"

  override def nullSafeEval(a: Any, b: Any): Any =
    AnnKernels.cosineById(a.asInstanceOf[Long], b.asInstanceOf[Long], vecs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineVecsBc", vecs,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ops.AnnKernels.cosineById($a, $b, $ref);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineByIds =
    copy(left = l, right = r)
}

private[ops] object annFunctions {
  def lshKeys(c: Column, tables: Array[Array[Array[Double]]], probeBits: Int): Column =
    GraftBridge.column(LshBucketKeys(
      GraftBridge.expression(c.cast("array<double>")), tables, probeBits))
  def ivfCells(c: Column, centroids: Array[Array[Double]], n: Int): Column =
    GraftBridge.column(IvfCells(
      GraftBridge.expression(c.cast("array<double>")), centroids, n))
  def cosineByIds(a: Column, b: Column,
      vecs: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[java.lang.Long, (Array[Double], Double)]]): Column =
    GraftBridge.column(CosineByIds(
      GraftBridge.expression(a.cast("long")),
      GraftBridge.expression(b.cast("long")), vecs))
}
