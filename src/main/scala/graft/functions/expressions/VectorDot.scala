package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Dot product of two ARRAY<DOUBLE> columns in ONE fused, codegen-friendly
 * loop — the hot kernel of the whole vector-similarity family (cosine,
 * norms, ADC lookups, SemDeDup, kNN verify).
 *
 * Replaces the higher-order-function spelling
 * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, (acc, v) => acc + v)`:
 * HOFs are CodegenFallback in Spark — every row paid an interpreted
 * zip_with (allocating the products array) plus an interpreted left fold,
 * per dot product. A 2k-vector pair join (~2M pairs × 3 dots for cosine)
 * spent ~2 s in that interpreter; this loop is the same arithmetic with
 * zero allocation.
 *
 * Semantics are bit-identical to the HOF form:
 *  - either operand NULL → NULL;
 *  - length mismatch → NULL (zip_with pads with NULL, NULL×x poisons the
 *    fold);
 *  - any NULL element → NULL (same poisoning);
 *  - both empty → 0.0;
 *  - accumulation is the same left-to-right IEEE double fold
 *    ((0.0 + a0·b0) + a1·b1) + … .
 */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_dot needs (array<double>, array<double>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorDot.dotOf(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = VectorDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |java.lang.Double ${ev.value}_r = $cls.dotOf($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Shared by interpreted eval and generated code. Returns null (boxed)
    * exactly where the HOF formulation yields NULL. */
  def dotOf(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def build(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => VectorDot(a, b)
    case other => throw new IllegalArgumentException(
      s"vector_dot(a, b) — got ${other.size} args")
  }

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("vector_dot")
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
        (args: Seq[Expression]) => build(args))
  }
}
