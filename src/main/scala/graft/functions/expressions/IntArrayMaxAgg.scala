package graft.functions.expressions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/**
 * Elementwise max-merge of fixed-width INT arrays as a native aggregate —
 * the HyperBall register union (Boldi–Vigna 2013, "ball(v) ∪= ball(u)")
 * and, generally, any per-key union of HLL-style register vectors.
 *
 * Why not `aggregate(collect_list(c), zero, zip_with(max))`: collect_list
 * BUFFERS every input array per group before folding, so a hub node with
 * in-degree d holds d × m ints on the heap at once — at web-graph scale
 * (d in the millions, m = 256) that is an executor OOM, and there is no
 * map-side partial aggregation because the list must be complete before
 * the fold runs. This TypedImperativeAggregate instead folds each input
 * into a single m-int buffer as rows stream through, gets partial
 * (map-side) aggregation for free, and runs under hash aggregation
 * (ObjectHashAggregateExec) — constant memory per group regardless of
 * degree.
 *
 * The buffer is sized lazily from the first non-null input, so callers
 * don't pass m; all inputs in a group must share one length (enforced).
 * Null inputs are skipped; a group with only nulls yields NULL.
 */
case class IntArrayMaxAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "int_array_max"

  // length-0 marks "no input yet" — register arrays are never empty
  override def createAggregationBuffer(): Array[Int] = Array.emptyIntArray

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buffer.length == 0) {
      arr.toIntArray()
    } else {
      require(buffer.length == n,
        s"int_array_max: mixed array lengths in one group (${buffer.length} vs $n)")
      var i = 0
      while (i < n) {
        val x = arr.getInt(i)
        if (x > buffer(i)) buffer(i) = x
        i += 1
      }
      buffer
    }
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    if (other.length == 0) return buffer
    if (buffer.length == 0) return other
    require(buffer.length == other.length,
      s"int_array_max: mixed array lengths in one group (${buffer.length} vs ${other.length})")
    var i = 0
    while (i < buffer.length) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Int]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * buffer.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.asIntBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length / 4)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asIntBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): IntArrayMaxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): IntArrayMaxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): IntArrayMaxAgg =
    copy(child = newChild)
}

object IntArrayMaxAgg {
  private def build(args: Seq[Expression]): Expression = args match {
    case Seq(a) => IntArrayMaxAgg(a)
    case _ => throw new IllegalArgumentException("int_array_max(array<int>)")
  }

  private val id = FunctionIdentifier("int_array_max")
  private val info =
    new ExpressionInfo(classOf[IntArrayMaxAgg].getName, "int_array_max")

  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((id, info, (args: Seq[Expression]) => build(args)))

  /** Idempotent per-session registration (mirrors NormalizeUnicode). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(id))
      reg.registerFunction(id, info, (args: Seq[Expression]) => build(args))
  }
}
