package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the numeric hot path.
  *
  * A Scala UDF over array<double> converts every element through the
  * boxing boundary (12.5M pairs × 128 boxed doubles for the embedding
  * all-pairs query); this expression reads the UnsafeArrayData in place
  * inside whole-stage codegen — no conversion, no allocation, no
  * virtual dispatch per element. This is preference tier (b) from the
  * design notes: a custom Expression where built-ins can't express the
  * semantics efficiently.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // no inputTypes override (AbstractDataType is private[sql]); callers
  // pass array<double> and checkInputDataTypes enforces it
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Called from generated code — reads ArrayData in place, no boxing.
    * Length mismatch THROWS: silently truncating to the shorter array
    * would turn a dimension-corrupt embedding into a plausible-looking
    * cosine that no gate can catch.
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: array length mismatch ($n vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      // null ELEMENTS throw like length mismatches do — getDouble on a
      // null slot reads 0.0 and would turn a corrupt embedding into a
      // plausible cosine (containsNull=true is parquet's default, so the
      // type check can't exclude them)
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_dot: null element at index $i")
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

/** Order-preserving key encoding as native expressions (SURVEY.md §4:
  * the codec is the designated custom-Expression surface). Children are
  * the key elements; internal values (UTF8String, Int/Long/Double/Bool)
  * convert once per row — no struct packing, no UDF converter layer.
  */
abstract class KeyCodecExpression extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def nullable: Boolean = false

  protected def elems(input: org.apache.spark.sql.catalyst.InternalRow): Seq[Any] =
    children.map { c =>
      c.eval(input) match {
        case null => null
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        // toDouble is DELIBERATE, not lossy by accident: the codec's key
        // model is JS numbers (KeyCodec.toDouble collapses every numeric
        // the same way, reference keys are JSON values) — integers above
        // 2^53 lose distinctness uniformly across the whole key surface
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case other => other // Boolean / numeric primitives pass through
      }
    }
}

case class KeyEncode(children: Seq[Expression]) extends KeyCodecExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "graft_key_bytes"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    graft.core.KeyCodec.encode(elems(input))
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KeyEncode = copy(children = newChildren)
}

case class KeyJson(children: Seq[Expression]) extends KeyCodecExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_key_json"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      graft.core.KeyCodec.json(elems(input)))
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KeyJson = copy(children = newChildren)
}

/** Cluster packaging: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * injects the native functions at session build time on every driver.
  * [[Native.ensureRegistered]] remains the self-contained path for
  * single-JVM tools (Verify/Bench/tests) on an already-built session.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    Native.injections.foreach(ext.injectFunction)
}

/** Session registration for the native expressions (idempotent). */
object Native {
  private val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      exprs => DotProduct(exprs.head, exprs(1))),
    (FunctionIdentifier("graft_key_bytes"),
      new ExpressionInfo(classOf[KeyEncode].getName, "graft_key_bytes"),
      exprs => KeyEncode(exprs)),
    (FunctionIdentifier("graft_key_json"),
      new ExpressionInfo(classOf[KeyJson].getName, "graft_key_json"),
      exprs => KeyJson(exprs)))

  private[functions] def injections: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    registrations

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    registrations.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }

  /** Native array<double> dot product column. */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_dot", a, b)
  }

  /** Order-preserving key bytes / canonical key JSON over element columns. */
  def keyBytes(spark: SparkSession, elems: Seq[Column]): Column = {
    ensureRegistered(spark)
    call_function("graft_key_bytes", elems: _*)
  }

  def keyJson(spark: SparkSession, elems: Seq[Column]): Column = {
    ensureRegistered(spark)
    call_function("graft_key_json", elems: _*)
  }
}
