package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-document PORTABLE shingle hashes in ONE fused loop:
 * exactly `transform(shinglesOf(toks, n), s => portableHash64(s))`
 * (TextFunctions.shinglesOf ∘ Dedup.portableHash64), where
 *   shinglesOf(toks, n) = [array_join(toks, " ")]           if size < n
 *                       = [join(toks[i..i+n-1], " ")]_i      otherwise
 *   portableHash64(s)   = conv(substring(md5(s), 1, 15), 16, 10) :: LONG
 *                         (= the top 60 bits of the MD5 digest).
 *
 * The HOF spelling evaluated interpreted per shingle — a slice, an
 * array_join allocation, an md5 hex string, a substring and a base-16
 * parse for every one of the ~|tokens| shingles of every row. This loop
 * reuses one MessageDigest, builds each shingle's UTF-8 bytes directly
 * (token bytes + 0x20 separators — identical bytes to
 * array_join(…, " ") which skips NULL elements), and reads the top 60
 * bits straight from the digest bytes, so the value is bit-identical to
 * the hex-string parse (digest[0..7] as unsigned big-endian >>> 4).
 */
case class PortableShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "portable_shingle_hashes"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"portable_shingle_hashes needs array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    PortableShingleHashes.hashesOf(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = PortableShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.hashesOf($c, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableShingleHashes {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val space = Array[Byte](' ')

  /** top 60 bits of md5 over the given UTF-8 byte chunks — identical to
    * parsing the first 15 hex digits of the hex digest in base 16. */
  private def md5Top60(chunks: java.util.ArrayList[Array[Byte]]): Long = {
    val md = mdLocal.get()
    md.reset()
    var i = 0
    while (i < chunks.size()) { md.update(chunks.get(i)); i += 1 }
    val d = md.digest()
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    v >>> 4
  }

  /** join tokens [from, until) with single spaces, NULL elements skipped
    * (array_join semantics), and hash. */
  private def shingleHash(toks: ArrayData, from: Int, until: Int): Long = {
    val chunks = new java.util.ArrayList[Array[Byte]](2 * (until - from))
    var first = true
    var i = from
    while (i < until) {
      if (!toks.isNullAt(i)) {
        if (!first) chunks.add(space)
        chunks.add(toks.getUTF8String(i).getBytes)
        first = false
      }
      i += 1
    }
    md5Top60(chunks)
  }

  def hashesOf(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) {
      // degenerate shingle: the whole token list joined
      new GenericArrayData(Array(shingleHash(toks, 0, sz)))
    } else {
      val m = sz - n + 1
      val out = new Array[Long](m)
      var i = 0
      while (i < m) { out(i) = shingleHash(toks, i, i + n); i += 1 }
      new GenericArrayData(out)
    }
  }

  def build(args: Seq[Expression]): Expression = args match {
    case Seq(toks, Literal(n: Int, IntegerType)) => PortableShingleHashes(toks, n)
    case Seq(toks, Literal(n: Long, LongType)) => PortableShingleHashes(toks, n.toInt)
    case other => throw new IllegalArgumentException(
      s"portable_shingle_hashes(toks, n literal) — got $other")
  }

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("portable_shingle_hashes")
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[PortableShingleHashes].getName,
          "portable_shingle_hashes"),
        (args: Seq[Expression]) => build(args))
  }
}
