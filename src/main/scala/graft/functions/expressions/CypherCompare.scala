package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Cypher TERNARY comparison semantics (`= <> < <= > >=` returning
 * true/false/null) over arbitrary value shapes — reference
 * community/cypher/.../operations/CypherBoolean.java and
 * values/.../AnyValue#ternaryCompareTo / ternaryEquals:
 *
 *  - comparing across value categories (list vs string, map vs int):
 *    `=` is FALSE, ordering is NULL;
 *  - lists compare lexicographically, a null-involving element comparison
 *    makes the result NULL unless a decisive difference appears first;
 *  - maps compare by size, then sorted keys, then per-key values (equality:
 *    differing key sets are FALSE, a null-valued shared key is NULL);
 *  - durations and points have no order: `<`/`>` are NULL, `<=`/`>=` are
 *    TRUE only on equality and NULL otherwise; equality is componentwise;
 *  - any null operand (or null point component) makes every operator NULL.
 *
 * The planner routes comparisons through this expression ONLY when a side
 * is structured (array/struct/map) or the static types differ — atomic
 * same-type comparisons stay on Spark's codegen'd native operators, so the
 * 100 TB hot path is unchanged. This expression is CodegenFallback: it
 * evaluates per row without codegen, acceptable for the structured-value
 * comparisons it serves.
 */
case class CypherCompare(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  import CypherCompare._

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "cypher_compare"
  // no common-input-type constraint: cross-type comparison is the point
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) return null
    op match {
      case "=" => eq3(l, left.dataType, r, right.dataType)
      case "<>" => eq3(l, left.dataType, r, right.dataType) match {
        case null => null
        case b: java.lang.Boolean => java.lang.Boolean.valueOf(!b.booleanValue)
      }
      case _ => cmp(l, left.dataType, r, right.dataType) match {
        case Undef  => null
        case EqOnly => if (op == "<=" || op == ">=") java.lang.Boolean.TRUE else null
        case Ord(i) => op match {
          case "<"  => java.lang.Boolean.valueOf(i < 0)
          case "<=" => java.lang.Boolean.valueOf(i <= 0)
          case ">"  => java.lang.Boolean.valueOf(i > 0)
          case ">=" => java.lang.Boolean.valueOf(i >= 0)
          case other => throw new IllegalArgumentException(s"op $other")
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CypherCompare =
    copy(left = newLeft, right = newRight)
}

object CypherCompare {

  // ---- comparison lattice -------------------------------------------------
  sealed trait Cmp
  /** totally ordered result */
  final case class Ord(i: Int) extends Cmp
  /** equal, but the type has no strict order (duration, point) */
  case object EqOnly extends Cmp
  /** incomparable / null-involving */
  case object Undef extends Cmp

  // ---- value categories ---------------------------------------------------
  private final val NUM = 1; private final val STR = 2; private final val BOOL = 3
  private final val DATE = 4; private final val ZDT = 5; private final val LDT = 6
  private final val DUR = 7; private final val PT = 8
  private final val LIST = 9; private final val MAP = 10; private final val OTHER = 11

  private val durFields = Array("months", "days", "seconds", "nanos")

  private def cat(dt: DataType): Int = dt match {
    case _: NumericType => NUM
    case StringType     => STR
    case BooleanType    => BOOL
    case DateType       => DATE
    case TimestampType  => ZDT
    case TimestampNTZType => LDT
    case s: StructType if s.fieldNames.sameElements(durFields) => DUR
    case s: StructType if s.fieldNames.contains("srid")        => PT
    case _: ArrayType   => LIST
    case _: StructType | _: MapType => MAP
    case _ => OTHER
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def toLong(v: Any): Long = v match {
    case b: Byte => b.toLong; case s: Short => s.toLong
    case i: Int => i.toLong; case l: Long => l
    case d: Decimal => d.toLong
    case other => throw new IllegalStateException(s"not integral: $other")
  }
  private def toDouble(v: Any): Double = v match {
    case b: Byte => b.toDouble; case s: Short => s.toDouble
    case i: Int => i.toDouble; case l: Long => l.toDouble
    case f: Float => f.toDouble; case d: Double => d
    case d: Decimal => d.toDouble
    case other => throw new IllegalStateException(s"not numeric: $other")
  }

  /** Exact long-vs-double comparison (reference MathUtil
    * .compareLongAgainstDouble): beyond 2^53 a double cannot represent
    * every long, so rounding through toDouble would declare
    * 9007199254740993 = 9007199254740992.0 — the comparison goes through
    * BigDecimal instead (both conversions are exact). Caller excludes NaN. */
  private def cmpLongDouble(l: Long, d: Double): Int =
    if (d == Double.PositiveInfinity) -1
    else if (d == Double.NegativeInfinity) 1
    else if (l > -(1L << 53) && l < (1L << 53))
      java.lang.Double.compare(l.toDouble, d)
    else new java.math.BigDecimal(l).compareTo(new java.math.BigDecimal(d))

  /** map-like value normalized to (sorted keys, per-key value+type) */
  private def mapEntries(v: Any, dt: DataType): Seq[(String, Any, DataType)] =
    (v, dt) match {
      case (row: InternalRow, s: StructType) =>
        s.fields.zipWithIndex.map { case (f, i) =>
          (f.name, if (row.isNullAt(i)) null else row.get(i, f.dataType), f.dataType)
        }.sortBy(_._1).toSeq
      case (m: MapData, MapType(kt, vt, _)) =>
        val ks = m.keyArray(); val vs = m.valueArray()
        (0 until m.numElements()).map { i =>
          val k = ks.get(i, kt) match {
            case u: UTF8String => u.toString
            case other => String.valueOf(other)
          }
          (k, if (vs.isNullAt(i)) null else vs.get(i, vt), vt)
        }.sortBy(_._1)
      case other => throw new IllegalStateException(s"not map-like: $other")
    }

  // ---- variant-encoded operands -------------------------------------------
  // A side may be the Orderability struct {rank,s,b,d,l,repr} (a mixed
  // column / heterogeneous-list element): unwrap it to its native value +
  // type before comparing, so `encoded = 3` and `encodedList = []` follow
  // value semantics instead of struct-as-map semantics.

  /** entity/opaque payloads surfaced from the encoding — equality by
    * payload, no order across categories */
  private final case class OrdEntity(kind: Int, key: UTF8String)
  private final case class OrdOpaque(rank: Int, repr: UTF8String)

  private def isOrdStruct(dt: DataType): Boolean = dt match {
    case st: StructType =>
      val fn = st.fieldNames.toSeq
      fn == graft.functions.Orderability.StructFields ||
        fn == Seq("rank", "s", "b", "d", "repr") // deepest level has no l
    case _ => false
  }

  /** decode an encoded value to (native value, native type); lists keep
    * their ord-struct elements — recursion through eq3/cmp unwraps them */
  private def unwrapOrd(v: Any, dt: DataType): (Any, DataType) = {
    val O = graft.functions.Orderability
    val st = dt.asInstanceOf[StructType]
    val r = v.asInstanceOf[InternalRow]
    val idx = st.fieldNames.zipWithIndex.toMap
    def f(n: String): Any =
      if (!idx.contains(n) || r.isNullAt(idx(n))) null
      else r.get(idx(n), st.fields(idx(n)).dataType)
    val rank = f("rank") match { case i: Int => i; case _ => -1 }
    rank match {
      case O.RankNull => (null, NullType)
      case O.RankString => (f("s"), StringType)
      case O.RankBoolean => (f("b"), BooleanType)
      case O.RankNumber =>
        // repr disambiguates INTEGER from FLOAT (both ride in `d`) AND
        // carries the exact decimal digits — parse the long from repr so
        // |value| > 2^53 keeps exact equality/order (the `d` payload is
        // rounded), falling back to d only if repr is absent/unparsable
        val d = f("d").asInstanceOf[Double]
        val repr = Option(f("repr")).map(_.toString).getOrElse("")
        if (repr.nonEmpty && !repr.exists(ch => ch == '.' || ch == 'e' ||
          ch == 'E' || ch == 'I' || ch == 'N'))
          (try java.lang.Long.parseLong(repr) catch {
            case _: NumberFormatException => d.toLong
          }, LongType)
        else (d, DoubleType)
      case O.RankList =>
        idx.get("l").map { i =>
          (f("l"), ArrayType(st.fields(i).dataType
            .asInstanceOf[ArrayType].elementType))
        }.getOrElse((null, NullType))
      case O.RankNode | O.RankRel | O.RankPath =>
        (OrdEntity(rank, f("s").asInstanceOf[UTF8String]), NullType)
      case _ => // Map/Duration/Point encodings: repr is functionally
        // determined by the value — equality-exact, order undefined here
        (OrdOpaque(rank, f("repr").asInstanceOf[UTF8String]), NullType)
    }
  }

  /** ternary equality; null operands yield null, cross-category FALSE */
  def eq3(a0: Any, ta0: DataType, b0: Any, tb0: DataType): java.lang.Boolean = {
    if (a0 == null || b0 == null) return null
    if (isOrdStruct(ta0) || isOrdStruct(tb0)) {
      val (a, ta) = if (isOrdStruct(ta0)) unwrapOrd(a0, ta0) else (a0, ta0)
      val (b, tb) = if (isOrdStruct(tb0)) unwrapOrd(b0, tb0) else (b0, tb0)
      if (a == null || b == null) return null
      (a, b) match {
        case (OrdEntity(k1, s1), OrdEntity(k2, s2)) =>
          return java.lang.Boolean.valueOf(k1 == k2 && s1 == s2)
        case (OrdOpaque(r1, x1), OrdOpaque(r2, x2)) =>
          return java.lang.Boolean.valueOf(r1 == r2 && x1 == x2)
        case (_: OrdEntity | _: OrdOpaque, _) |
             (_, _: OrdEntity | _: OrdOpaque) =>
          return java.lang.Boolean.FALSE // cross-category
        case _ => return eq3(a, ta, b, tb)
      }
    }
    eq3Native(a0, ta0, b0, tb0)
  }

  private def eq3Native(a: Any, ta: DataType, b: Any,
      tb: DataType): java.lang.Boolean = {
    if (a == null || b == null) return null
    val (ca, cb) = (cat(ta), cat(tb))
    if (ca != cb) return java.lang.Boolean.FALSE
    ca match {
      case NUM =>
        if (isIntegral(ta) && isIntegral(tb))
          java.lang.Boolean.valueOf(toLong(a) == toLong(b))
        else if (isIntegral(ta) || isIntegral(tb)) {
          val (l, d) = if (isIntegral(ta)) (toLong(a), toDouble(b))
            else (toLong(b), toDouble(a))
          java.lang.Boolean.valueOf(!d.isNaN && cmpLongDouble(l, d) == 0)
        } else java.lang.Boolean.valueOf(toDouble(a) == toDouble(b))
      case STR | BOOL => java.lang.Boolean.valueOf(a == b)
      case DATE | ZDT | LDT =>
        java.lang.Boolean.valueOf(toLong(a) == toLong(b))
      case DUR =>
        val (ra, rb) = (a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
        var i = 0
        while (i < 4) {
          if (ra.isNullAt(i) || rb.isNullAt(i)) return null
          if (ra.getLong(i) != rb.getLong(i)) return java.lang.Boolean.FALSE
          i += 1
        }
        java.lang.Boolean.TRUE
      case PT => pointCmp(a, ta, b, tb) match {
        case EqOnly => java.lang.Boolean.TRUE
        case Ord(_) => java.lang.Boolean.FALSE
        case Undef  => null
      }
      case LIST =>
        val (aa, ab) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
        val (ea, eb) = (ta.asInstanceOf[ArrayType].elementType,
          tb.asInstanceOf[ArrayType].elementType)
        if (aa.numElements() != ab.numElements()) return java.lang.Boolean.FALSE
        var sawNull = false
        var i = 0
        while (i < aa.numElements()) {
          val va = if (aa.isNullAt(i)) null else aa.get(i, ea)
          val vb = if (ab.isNullAt(i)) null else ab.get(i, eb)
          if (va == null || vb == null) sawNull = true
          else eq3(va, ea, vb, eb) match {
            case null => sawNull = true
            case jb: java.lang.Boolean if !jb.booleanValue =>
              return java.lang.Boolean.FALSE
            case _ =>
          }
          i += 1
        }
        if (sawNull) null else java.lang.Boolean.TRUE
      case MAP =>
        val ma = mapEntries(a, ta); val mb = mapEntries(b, tb)
        if (ma.map(_._1) != mb.map(_._1)) return java.lang.Boolean.FALSE
        var sawNull = false
        ma.zip(mb).foreach { case ((_, va, dta), (_, vb, dtb)) =>
          if (va == null || vb == null) sawNull = true
          else eq3(va, dta, vb, dtb) match {
            case null => sawNull = true
            case jb: java.lang.Boolean if !jb.booleanValue =>
              return java.lang.Boolean.FALSE
            case _ =>
          }
        }
        if (sawNull) null else java.lang.Boolean.TRUE
      case _ => java.lang.Boolean.valueOf(a == b)
    }
  }

  private def pointCmp(a: Any, ta: DataType, b: Any, tb: DataType): Cmp = {
    val (sa, sb) = (ta.asInstanceOf[StructType], tb.asInstanceOf[StructType])
    val (ra, rb) = (a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
    def comp(r: InternalRow, s: StructType, n: String): Option[Any] = {
      val i = s.fieldNames.indexOf(n)
      if (i < 0 || r.isNullAt(i)) None else Some(r.get(i, s.fields(i).dataType))
    }
    val parts = Seq("srid", "x", "y").map(n =>
      (comp(ra, sa, n), comp(rb, sb, n)))
    if (parts.exists { case (x, y) => x.isEmpty || y.isEmpty }) return Undef
    val eq = parts.forall {
      case (Some(x), Some(y)) => toDouble(x) == toDouble(y)
      case _ => false
    }
    if (eq) EqOnly else Ord(1) // unequal; ordering undefined at call site
  }

  /** ternary ordering; Ord only for totally ordered categories */
  def cmp(a0: Any, ta0: DataType, b0: Any, tb0: DataType): Cmp = {
    if (a0 == null || b0 == null) return Undef
    if (isOrdStruct(ta0) || isOrdStruct(tb0)) {
      val (a, ta) = if (isOrdStruct(ta0)) unwrapOrd(a0, ta0) else (a0, ta0)
      val (b, tb) = if (isOrdStruct(tb0)) unwrapOrd(b0, tb0) else (b0, tb0)
      if (a == null || b == null) return Undef
      (a, b) match {
        case (OrdEntity(k1, s1), OrdEntity(k2, s2)) if k1 == k2 =>
          return Ord(s1.compareTo(s2)) // deterministic id order within kind
        case (OrdOpaque(r1, x1), OrdOpaque(r2, x2)) if r1 == r2 =>
          return (if (x1 == x2) EqOnly else Undef)
        case (_: OrdEntity | _: OrdOpaque, _) |
             (_, _: OrdEntity | _: OrdOpaque) => return Undef
        case _ => return cmp(a, ta, b, tb)
      }
    }
    cmpNative(a0, ta0, b0, tb0)
  }

  private def cmpNative(a: Any, ta: DataType, b: Any, tb: DataType): Cmp = {
    if (a == null || b == null) return Undef
    val (ca, cb) = (cat(ta), cat(tb))
    if (ca != cb) return Undef
    ca match {
      case NUM =>
        // IEEE/ternary: an ordering involving NaN is NULL (the planner's
        // scalar path compiles the same false-on-NaN conjunctions) — NOT
        // Double.compare's NaN-greater-than-everything
        if ((!isIntegral(ta) && toDouble(a).isNaN) ||
            (!isIntegral(tb) && toDouble(b).isNaN)) Undef
        else if (isIntegral(ta) && isIntegral(tb))
          Ord(java.lang.Long.compare(toLong(a), toLong(b)))
        else if (isIntegral(ta)) Ord(cmpLongDouble(toLong(a), toDouble(b)))
        else if (isIntegral(tb)) Ord(-cmpLongDouble(toLong(b), toDouble(a)))
        else {
          val (da, db) = (toDouble(a), toDouble(b))
          // == first: Double.compare would order -0.0 < 0.0
          if (da == db) Ord(0) else Ord(java.lang.Double.compare(da, db))
        }
      case STR =>
        Ord(a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]))
      case BOOL =>
        Ord(java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean]))
      case DATE | ZDT | LDT => Ord(java.lang.Long.compare(toLong(a), toLong(b)))
      case DUR => eq3(a, ta, b, tb) match {
        case null => Undef
        case jb: java.lang.Boolean => if (jb.booleanValue) EqOnly else Undef
      }
      case PT => pointCmp(a, ta, b, tb) match {
        case EqOnly => EqOnly
        case _      => Undef
      }
      case LIST =>
        val (aa, ab) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
        val (ea, eb) = (ta.asInstanceOf[ArrayType].elementType,
          tb.asInstanceOf[ArrayType].elementType)
        val n = math.min(aa.numElements(), ab.numElements())
        var i = 0
        while (i < n) {
          val va = if (aa.isNullAt(i)) null else aa.get(i, ea)
          val vb = if (ab.isNullAt(i)) null else ab.get(i, eb)
          cmp(va, ea, vb, eb) match {
            case Undef          => return Undef
            case Ord(x) if x != 0 => return Ord(x)
            case _              => // equal (or EqOnly): keep walking
          }
          i += 1
        }
        Ord(java.lang.Integer.compare(aa.numElements(), ab.numElements()))
      case MAP =>
        val ma = mapEntries(a, ta); val mb = mapEntries(b, tb)
        if (ma.size != mb.size) return Ord(java.lang.Integer.compare(ma.size, mb.size))
        // sorted key sequences decide before values (reference MapValue
        // comparator: size, keys, then per-key values)
        ma.zip(mb).foreach { case ((ka, _, _), (kb, _, _)) =>
          val kc = ka.compareTo(kb)
          if (kc != 0) return Ord(kc)
        }
        ma.zip(mb).foreach { case ((_, va, dta), (_, vb, dtb)) =>
          cmp(va, dta, vb, dtb) match {
            case Undef            => return Undef
            case Ord(x) if x != 0 => return Ord(x)
            case _                =>
          }
        }
        Ord(0)
      case _ => Undef
    }
  }

  // ---- registration --------------------------------------------------------
  private def build(args: Seq[Expression]): Expression = args match {
    case Seq(l, r, Literal(op, StringType)) => CypherCompare(l, r, op.toString)
    case _ => throw new IllegalArgumentException(
      "cypher_compare(lhs, rhs, op-literal)")
  }

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("cypher_compare")
    if (!reg.functionExists(id))
      reg.registerFunction(id,
        new ExpressionInfo(classOf[CypherCompare].getName, "cypher_compare"),
        (args: Seq[Expression]) => build(args))
  }
}
