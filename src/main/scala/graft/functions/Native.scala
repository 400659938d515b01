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

/** Bloom-filter membership probe as a native expression — the pre-filter
  * of the incremental-dedup scale path (Dedup.scala C30b). The serialized
  * filter rides in the expression (ships once per task like Spark's own
  * runtime bloom join filters) and deserializes lazily once per executor;
  * the probe itself stays inside whole-stage codegen — a Scala UDF here
  * would box every key on the corpus-scan hot path.
  *
  * Sizing envelope: a 3%-fpp filter costs ~7.3 bits/key (~90 MB at 1e8
  * keys) — fine as a plan-shipped object to ~1e8 corpus keys; beyond
  * that, partition the digest space into per-range filters or fall back
  * to the plain anti-join.
  */
case class BloomMightContainLong(child: Expression, bytes: Array[Byte])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_contains expects a bigint key, got ${other.simpleString}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))

  /** Called from generated code. */
  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(v: Any): Any =
    mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this, classOf[BloomMightContainLong].getName)
    defineCodeGen(ctx, ev, v => s"$ref.mightContain($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)

  // case-class equality would compare the Array[Byte] by REFERENCE, so
  // two semantically identical probes never canonicalize equal (missed
  // subexpression elimination; equals can flip after plan copies) —
  // compare the filter bytes by content instead
  override def equals(other: Any): Boolean = other match {
    case o: BloomMightContainLong =>
      // cheap content pre-check first: Catalyst compares expressions
      // repeatedly during optimization, and the full byte compare is
      // O(filter size) (hundreds of KB at corpus scale)
      child == o.child && bytesHash == o.bytesHash &&
        java.util.Arrays.equals(bytes, o.bytes)
    case _ => false
  }
  // content hash computed ONCE — the filter bytes are immutable, and
  // Expression.hashCode is called many times per optimizer pass
  @transient private lazy val bytesHash: Int = java.util.Arrays.hashCode(bytes)
  override def hashCode(): Int = 31 * child.hashCode() + bytesHash
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
      exprs => KeyJson(exprs)),
    (FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomMightContainLong].getName, "graft_bloom_contains"),
      exprs => {
        // arg 0 carries the serialized filter as a foldable binary literal
        // (the registry builder only sees Expressions); it folds to bytes
        // HERE, once at resolution — not per row
        require(exprs.length == 2, "graft_bloom_contains(filterBytes, key)")
        require(exprs.head.foldable &&
          exprs.head.dataType == org.apache.spark.sql.types.BinaryType,
          "graft_bloom_contains: the filter argument must be a binary literal")
        val bytes = exprs.head.eval(null)
        require(bytes != null,
          "graft_bloom_contains: the filter literal must not be null")
        BloomMightContainLong(exprs(1), bytes.asInstanceOf[Array[Byte]])
      }))

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

  /** Codegen'd membership probe of a driver-built bloom filter over a
    * bigint key column — see [[BloomMightContainLong]] for the sizing
    * envelope.
    */
  def bloomMightContain(
      spark: SparkSession,
      bloom: org.apache.spark.util.sketch.BloomFilter,
      key: Column): Column = {
    ensureRegistered(spark)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    call_function("graft_bloom_contains",
      org.apache.spark.sql.functions.lit(bos.toByteArray), key)
  }
}
