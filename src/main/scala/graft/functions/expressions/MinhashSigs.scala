package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * All k MinHash signature values in ONE fused loop over the pre-hashed
 * shingle array — the PortableLshBucket treatment applied to the Dedup
 * sketch kernel.
 *
 * Semantics are identical to the column-per-coefficient spelling it
 * replaces (Dedup.minhashCandidates / docSketches):
 *   array(j = 0..k-1)( array_min(transform(hs, x => pmod(x*a_j + b_j, P))) )
 * with (a_j, b_j) drawn from scala.util.Random(42) exactly as before
 * (a = 1 + nextInt(P-1), b = nextInt(P)) and P = 2^31−1. That spelling
 * paid k interpreted transform passes (each allocating a k-element copy
 * of the shingle array) plus k array_min scans per row; this expression
 * reads each shingle hash once and updates all k minima in a tight
 * primitive loop inside whole-stage codegen.
 *
 * NULL semantics preserved: a NULL input array → NULL; NULL elements are
 * skipped (transform maps them to NULL, array_min ignores NULLs); an
 * empty array (or all-NULL elements) → every signature slot NULL.
 */
case class MinhashSigs(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  // a NULL input yields [NULL × k] — exactly what the replaced spelling
  // produced (array_min(transform(NULL, …)) is NULL per slot, but the
  // outer array() literal is itself never NULL) — so this never is
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs needs array<long>, got $other")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinhashSigs.nullSigs(k)
    else MinhashSigs.sigsOf(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val cls = MinhashSigs.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull} ? $cls.nullSigs($k)
                             : $cls.sigsOf(${childGen.value}, $k);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSigs {
  val Prime = 2147483647L // 2^31−1, the minhash universe (Dedup.Prime)

  /** (a_j, b_j) exactly as Dedup's seeded PRNG draws them. */
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def coeffsFor(k: Int): Array[Long] =
    coeffCache.computeIfAbsent(k, { kk =>
      val rng = new scala.util.Random(42)
      val flat = new Array[Long](kk * 2)
      var j = 0
      while (j < kk) {
        flat(2 * j) = 1L + rng.nextInt((Prime - 1).toInt)
        flat(2 * j + 1) = rng.nextInt(Prime.toInt).toLong
        j += 1
      }
      flat
    })

  /** [NULL × k] — what the replaced spelling produced for a NULL input. */
  def nullSigs(k: Int): ArrayData = new GenericArrayData(Array.fill[Any](k)(null))

  /** Shared by interpreted eval and generated code. */
  def sigsOf(hs: ArrayData, k: Int): ArrayData = {
    val co = coeffsFor(k)
    val n = hs.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        any = true
        val x = hs.getLong(i)
        var j = 0
        while (j < k) {
          // pmod(x*a + b, P): x ∈ [0, P) in practice, but replicate pmod
          // for any long input (sign-safe mod)
          val m = (x * co(2 * j) + co(2 * j + 1)) % Prime
          val v = if (m < 0) m + Prime else m
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins.map(java.lang.Long.valueOf(_): Any))
  }

  def build(args: Seq[Expression]): Expression = args match {
    case Seq(hs, Literal(n: Int, IntegerType)) => MinhashSigs(hs, n)
    case Seq(hs, Literal(n: Long, LongType)) => MinhashSigs(hs, n.toInt)
    case other => throw new IllegalArgumentException(
      s"minhash_sigs(hs, k literal) — got $other")
  }

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("minhash_sigs")
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[MinhashSigs].getName, "minhash_sigs"),
        (args: Seq[Expression]) => build(args))
  }
}
