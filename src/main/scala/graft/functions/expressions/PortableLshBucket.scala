package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Random-hyperplane LSH bucket id under the PORTABLE (md5-derived,
 * exact-i64) weight scheme — all nBits sign bits in ONE codegen'd loop
 * over the vector.
 *
 * Semantics are bit-identical to the interpreted formulation the DuckDB
 * oracle replays (Similarity.lshBucketPortable): component
 * floor(v[d]·10⁶) times weight w(j,d) = md5("j:d")-derived value in
 * [-500001, 500001], summed exactly in i64; bit j set iff the sum is
 * ≥ 0. The higher-order-function spelling paid one interpreted
 * zip_with + aggregate pass per bit per row (the q_cosine_near_dup r12
 * cost); this expression quantizes each element once and accumulates all
 * nBits dot products in a single fused loop, inside whole-stage codegen.
 *
 * Reference semantics attribution: sign-LSH near-duplicate blocking
 * (Charikar 2002 SimHash family); the reference engine has no LSH — this
 * is part of the training-data-pipeline surplus surface.
 */
case class PortableLshBucket(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "portable_lsh_bucket"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"portable_lsh_bucket needs array<double>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    PortableLshBucket.bucketOf(arr, nBits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = PortableLshBucket.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.bucketOf($c, $nBits);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableLshBucket {
  /** weights for dims beyond this cap are never needed in practice; the
    * guard in bucketOf raises rather than mis-hash should they ever be */
  val MaxDims = 2048
  private val MaxBits = 24

  /** w(j,d): md5("j:d") first 15 hex digits mod 1000003, shifted to
    * [-500001, 500001] — identical to Dedup.portableHash64 ∘ pmod and the
    * DuckDB replay's arithmetic. */
  private def weight(j: Int, d: Int): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$d".getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(
      md5.map("%02x".format(_)).mkString.take(15), 16)
    ((h % 1000003L) + 1000003L) % 1000003L - 500001L
  }

  private lazy val weightMatrix: Array[Array[Long]] =
    Array.tabulate(MaxBits, MaxDims)(weight)

  /** Shared by interpreted eval and generated code (called per row from
    * whole-stage codegen — one virtual call, then a tight primitive loop). */
  def bucketOf(arr: ArrayData, nBits: Int): Long = {
    val n = arr.numElements()
    require(n <= MaxDims, s"portable LSH supports <= $MaxDims dims")
    require(nBits <= MaxBits, s"portable LSH supports <= $MaxBits bits")
    val w = weightMatrix
    val sums = new Array[Long](nBits)
    var d = 0
    while (d < n) {
      val qd = math.floor(arr.getDouble(d) * 1000000d).toLong
      var j = 0
      while (j < nBits) { sums(j) += qd * w(j)(d); j += 1 }
      d += 1
    }
    var bucket = 0L
    var j = 0
    while (j < nBits) { if (sums(j) >= 0) bucket |= 1L << j; j += 1 }
    bucket
  }

  def build(args: Seq[Expression]): Expression = args match {
    case Seq(vec, Literal(n: Int, IntegerType)) => PortableLshBucket(vec, n)
    case Seq(vec, Literal(n: Long, LongType)) => PortableLshBucket(vec, n.toInt)
    case other => throw new IllegalArgumentException(
      s"portable_lsh_bucket(vec, nBits literal) — got $other")
  }

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("portable_lsh_bucket")
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[PortableLshBucket].getName,
          "portable_lsh_bucket"),
        (args: Seq[Expression]) => build(args))
  }
}
