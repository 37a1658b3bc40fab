package graft.analysis

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-native tokenizer expression (codegen'd, no UDF serialization).
  *
  * Stays inside whole-stage codegen: the generated code is a single static
  * call into the pure Scala kernel, so tokenize → explode → aggregate
  * pipelines keep one WholeStageCodegen span.
  */
case class Tokenize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokenize"

  override def nullSafeEval(input: Any): Any =
    Kernels.tokenizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.analysis.Kernels.tokenizeUtf8($c);")

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

/** Static kernels shared by the interpreted and codegen paths.
  *
  * Deliberately NOT a companion of any expression case class: Scala emits
  * no static forwarders when a companion class exists (the instance
  * `eval(InternalRow)` shadows them), so generated Java calling
  * `Tokenize.eval(...)` failed Janino compilation and Spark silently fell
  * back to interpreter mode — codegen only works against a standalone
  * object like this one.
  */
object Kernels {
  def tokenizeUtf8(s: UTF8String): ArrayData = {
    val toks = Analyzer.tokenize(s.toString)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** Token count without materializing the array (doclen computation). */
case class TokenCount(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(input: Any): Any =
    Analyzer.countTokens(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.analysis.Analyzer.countTokens($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** Dot product of two array<double> columns in ascending index order —
  * the vector-similarity hot path. A single codegen'd static loop instead
  * of interpreted zip_with+aggregate lambdas (~10× on dense pair joins);
  * the summation order is identical to a sequential fold, so results stay
  * bit-identical to the SQL-oracle formulation.
  */
case class DotProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.analysis.Kernels.dot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Column-level API for the analysis expressions. Inputs are cast to
  * the expressions' expected child types.
  */
object functions {
  def tokenize(c: Column): Column =
    GraftBridge.column(Tokenize(GraftBridge.expression(c.cast("string"))))
  def token_count(c: Column): Column =
    GraftBridge.column(TokenCount(GraftBridge.expression(c.cast("string"))))
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a.cast("array<double>")),
      GraftBridge.expression(b.cast("array<double>"))))
}
