package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode normalization as a NATIVE Catalyst expression (Cypher 5
 * `normalize(s[, form])`, reference front-end Normalize function /
 * CIP-100): NFC/NFD/NFKC/NFKD via java.text.Normalizer, with full
 * whole-stage-codegen support (`doGenCode` emits a direct static call — no
 * UDF boxing, stays inside the generated loop).
 */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form), s"unknown normal form $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)
}

object NormalizeUnicode {
  /** Builder for registry injection: normalize(str[, 'NFC'|'NFD'|…]). */
  private def build(args: Seq[Expression]): Expression = args match {
    case Seq(s)                      => NormalizeUnicode(s, "NFC")
    case Seq(s, Literal(f, StringType)) =>
      NormalizeUnicode(s, f.toString.toUpperCase)
    case _ => throw new IllegalArgumentException(
      "unicode_normalize(string[, form-literal])")
  }

  /** SparkSessionExtensions hook (GraftSession wires this in), making the
    * expression callable as `unicode_normalize(...)` from SQL and via
    * functions.call_function. */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[NormalizeUnicode].getName, "unicode_normalize"),
      (args: Seq[Expression]) => build(args)))

  /** Idempotent per-session registration for sessions not built through
    * GraftSession.builder (the Cypher planner calls this lazily so
    * normalize() works against any SparkSession). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("unicode_normalize")
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[NormalizeUnicode].getName, "unicode_normalize"),
        (args: Seq[Expression]) => build(args))
  }
}
