package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Fused codegen kernels for the vector-quantization family (IVF cell
 * assignment, PQ encode/LUT/ADC, euclidean scoring) — the same
 * HOF-to-compiled-kernel treatment as [[VectorDot]] (r15): Spark's
 * higher-order functions (`transform`/`aggregate`/`zip_with`) are
 * CodegenFallback, so every row paid an interpreted tree walk per centroid
 * (256 per subspace for PQ, nList for IVF). Each kernel below is one
 * virtual call from whole-stage codegen into a tight primitive loop with
 * zero per-element allocation, decision-for-decision identical to the HOF
 * spelling it replaces (strictly-greater argmax from (MinValue, -1), a
 * NULL dot — length mismatch or null element — never beats the
 * accumulator, left-to-right IEEE double folds).
 */
object VectorKernels {

  def isCentsLike0(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(fs), _) if fs.length == 2 =>
      fs(0).dataType == IntegerType &&
        (fs(1).dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        })
    case _ => false
  }

  def isCodebookLike0(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(fs), _) if fs.length == 2 =>
      fs(0).dataType == IntegerType && isCentsLike0(fs(1).dataType)
    case _ => false
  }

  /** dot(v[off..off+len), cv) with the HOF's null poisoning: null (boxed)
    * on any null element or when cv.length != len or v is too short. */
  def sliceDot(v: ArrayData, off: Int, len: Int,
      cv: ArrayData): java.lang.Double = {
    if (cv == null || cv.numElements() != len || off + len > v.numElements())
      return null
    var acc = 0.0
    var i = 0
    while (i < len) {
      if (v.isNullAt(off + i) || cv.isNullAt(i)) return null
      acc += v.getDouble(off + i) * cv.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Argmax cid over cents of dot(v[off..off+len), cv) — strictly-greater
    * wins from (Double.MinValue, -1); a null dot never wins. */
  def argmaxSliceDot(v: ArrayData, off: Int, len: Int, cents: ArrayData): Int = {
    var bestS = Double.MinValue
    var bestC = -1
    val n = cents.numElements()
    var i = 0
    while (i < n) {
      if (!cents.isNullAt(i)) {
        val cen = cents.getStruct(i, 2)
        val s = sliceDot(v, off, len, if (cen.isNullAt(1)) null else cen.getArray(1))
        if (s != null && s.doubleValue() > bestS) {
          bestS = s.doubleValue()
          bestC = cen.getInt(0)
        }
      }
      i += 1
    }
    bestC
  }
}

/** argmax_dot(v ARRAY<DOUBLE>, cents ARRAY<STRUCT<cid INT, cv ARRAY<DOUBLE>>>)
  * → INT: the cid whose cv has the (strictly) largest dot with v — the IVF
  * / k-means cell assignment inner loop (Similarity.assignCells). */
case class ArgmaxDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "argmax_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), dt)
          if VectorKernels.isCentsLike0(dt) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"argmax_dot needs (array<double>, array<struct<cid int, cv array<double>>>), got $other")
    }

  override protected def nullSafeEval(v: Any, cents: Any): Any = {
    val va = v.asInstanceOf[ArrayData]
    VectorKernels.argmaxSliceDot(va, 0, va.numElements(),
      cents.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val cls = VectorKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.argmaxSliceDot($v, 0, $v.numElements(), $c);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArgmaxDot {
  def build(args: Seq[Expression]): Expression = args match {
    case Seq(v, c) => ArgmaxDot(v, c)
    case other => throw new IllegalArgumentException(
      s"argmax_dot(v, cents) — got ${other.size} args")
  }
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("argmax_dot")
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[ArgmaxDot].getName, "argmax_dot"),
        (args: Seq[Expression]) => build(args))
  }
}

/** pq_encode(v, codebook, sub) → ARRAY<INT>: per codebook entry j (in
  * array order), the argmax-dot cid of v's j-th length-`sub` slice against
  * that entry's centroids — the PQ encode stage in one compiled pass
  * (m × nCents × sub multiply-adds, no slice/struct allocation). */
case class PqEncode(left: Expression, right: Expression, sub: Int)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), dt)
          if VectorKernels.isCodebookLike0(dt) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode needs (array<double>, array<struct<j int, cents array<struct<cid int, cv array<double>>>>>), got $other")
    }

  override protected def nullSafeEval(v: Any, cb: Any): Any =
    PqEncode.encode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val cls = PqEncode.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.encode($v, $cb, $sub);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  def encode(v: ArrayData, cb: ArrayData, sub: Int): ArrayData = {
    val m = cb.numElements()
    val codes = new Array[Int](m)
    var i = 0
    while (i < m) {
      if (cb.isNullAt(i)) codes(i) = -1
      else {
        val je = cb.getStruct(i, 2)
        val j = je.getInt(0)
        codes(i) =
          if (je.isNullAt(1)) -1
          else VectorKernels.argmaxSliceDot(v, j * sub, sub, je.getArray(1))
      }
      i += 1
    }
    new GenericArrayData(codes)
  }
  def build(args: Seq[Expression]): Expression = args match {
    case Seq(v, cb, Literal(s: Int, IntegerType)) => PqEncode(v, cb, s)
    case other => throw new IllegalArgumentException(
      s"pq_encode(v, codebook, sub literal) — got $other")
  }
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("pq_encode")
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
        (args: Seq[Expression]) => build(args))
  }
}

/** pq_lut(qv, codebook, sub) → ARRAY<ARRAY<DOUBLE>>: per codebook entry j,
  * the dot of qv's j-th slice against each centroid (in centroid array
  * order) — the per-query ADC lookup table in one compiled pass. A null
  * dot (short query vector / malformed centroid) stays null, exactly like
  * the nested-transform HOF spelling. */
case class PqLut(left: Expression, right: Expression, sub: Int)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = true), containsNull = true)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), dt)
          if VectorKernels.isCodebookLike0(dt) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_lut needs (array<double>, array<struct<j int, cents array<struct<cid int, cv array<double>>>>>), got $other")
    }

  override protected def nullSafeEval(v: Any, cb: Any): Any =
    PqLut.lut(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val cls = PqLut.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.lut($v, $cb, $sub);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqLut {
  def lut(v: ArrayData, cb: ArrayData, sub: Int): ArrayData = {
    val m = cb.numElements()
    val rows = new Array[Any](m)
    var i = 0
    while (i < m) {
      if (!cb.isNullAt(i)) {
        val je = cb.getStruct(i, 2)
        val j = je.getInt(0)
        if (!je.isNullAt(1)) {
          val cents = je.getArray(1)
          val n = cents.numElements()
          val out = new Array[Any](n)
          var ci = 0
          while (ci < n) {
            if (!cents.isNullAt(ci)) {
              val cen = cents.getStruct(ci, 2)
              out(ci) = VectorKernels.sliceDot(v, j * sub, sub,
                if (cen.isNullAt(1)) null else cen.getArray(1))
            }
            ci += 1
          }
          rows(i) = new GenericArrayData(out)
        }
      }
      i += 1
    }
    new GenericArrayData(rows)
  }
  def build(args: Seq[Expression]): Expression = args match {
    case Seq(v, cb, Literal(s: Int, IntegerType)) => PqLut(v, cb, s)
    case other => throw new IllegalArgumentException(
      s"pq_lut(qv, codebook, sub literal) — got $other")
  }
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("pq_lut")
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[PqLut].getName, "pq_lut"),
        (args: Seq[Expression]) => build(args))
  }
}

/** pq_adc(code ARRAY<INT>, lut ARRAY<ARRAY<DOUBLE>>) → DOUBLE:
  * Σ_j lut[j][code[j]] — the ADC scoring loop. Null exactly where the
  * `aggregate(zip_with(code, lut, element_at))` HOF was null: length
  * mismatch, null code, null table, or null table entry. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs (array<int>, array<array<double>>), got $other")
    }

  override protected def nullSafeEval(code: Any, lut: Any): Any =
    PqAdc.adc(code.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val cls = PqAdc.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |java.lang.Double ${ev.value}_r = $cls.adc($c, $l);
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

object PqAdc {
  def adc(code: ArrayData, lut: ArrayData): java.lang.Double = {
    val m = code.numElements()
    if (m != lut.numElements()) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (code.isNullAt(j) || lut.isNullAt(j)) return null
      val row = lut.getArray(j)
      val cd = code.getInt(j)
      // out-of-range mirrors ANSI element_at: the HOF spelling would have
      // raised; codes from pq_encode are always in range
      if (cd < 0 || cd >= row.numElements())
        throw new IllegalArgumentException(
          s"pq_adc: code $cd out of range for a ${row.numElements()}-entry table")
      if (row.isNullAt(cd)) return null
      acc += row.getDouble(cd)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }
  def build(args: Seq[Expression]): Expression = args match {
    case Seq(c, l) => PqAdc(c, l)
    case other => throw new IllegalArgumentException(
      s"pq_adc(code, lut) — got ${other.size} args")
  }
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("pq_adc")
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
        (args: Seq[Expression]) => build(args))
  }
}

/** vector_sqdist(a, b) → DOUBLE: Σ (aᵢ−bᵢ)² with [[VectorDot]]'s exact
  * null semantics (either side null, length mismatch, or any null element
  * → NULL; both empty → 0.0; left-to-right IEEE fold). */
case class VectorSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_sqdist"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vector_sqdist needs (array<double>, array<double>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorSqDist.sqDistOf(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = VectorSqDist.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |java.lang.Double ${ev.value}_r = $cls.sqDistOf($a, $b);
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

object VectorSqDist {
  def sqDistOf(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
  def build(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => VectorSqDist(a, b)
    case other => throw new IllegalArgumentException(
      s"vector_sqdist(a, b) — got ${other.size} args")
  }
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("vector_sqdist")
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[VectorSqDist].getName, "vector_sqdist"),
        (args: Seq[Expression]) => build(args))
  }
}
