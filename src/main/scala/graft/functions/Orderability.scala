package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Cypher cross-type orderability (reference community/values
 * AnyValues.COMPARATOR, openCypher CIP "Comparability and orderability"):
 * ascending global order runs Map < Node < Relationship < List < Path <
 * temporals < Duration < String < Boolean < Number, with NULL LAST
 * (and first under DESC).
 *
 * Columnar encoding: a STRUCT(rank, s, b, d, repr). Spark compares structs
 * field by field, so ordering the encoded value reproduces the global order
 * with no custom comparator, no UDF, full codegen:
 *  - `rank` separates types (type-rank order above);
 *  - exactly one payload field (`s` string / `b` boolean / `d` double) is
 *    non-null per value, so same-rank values compare by payload while the
 *    other payload fields tie as NULL = NULL;
 *  - `repr` trails the comparison fields (it is functionally determined by
 *    them, so it never influences ordering) and carries the display text
 *    that toString() returns.
 *
 * Numbers compare numerically across Long/Double via the `d` field —
 * exactly the reference's cross-numeric-type comparison.
 */
object Orderability {

  /** field layout of the encoded struct — used to recognize encoded columns */
  val StructFields: Seq[String] = Seq("rank", "s", "b", "d", "repr")

  // type ranks per the CIP order; only the relative order matters
  private val RankString = 12
  private val RankBoolean = 13
  private val RankNumber = 14
  private val RankNull = 15 // null sorts last ascending, first descending

  def string(c: Column): Column =
    enc(lit(RankString), c, nullBool, nullDouble, c)

  def boolean(c: Column): Column =
    enc(lit(RankBoolean), nullStr, c, nullDouble, c.cast("string"))

  def number(c: Column): Column =
    enc(lit(RankNumber), nullStr, nullBool, c.cast("double"), c.cast("string"))

  def nullValue: Column =
    enc(lit(RankNull), nullStr, nullBool, nullDouble, lit("null"))

  /** display text of an encoded value (Cypher toString semantics). */
  def repr(c: Column): Column = c.getField("repr")

  def isEncoded(dt: DataType): Boolean = dt match {
    case st: StructType => st.fieldNames.toSeq == StructFields
    case _              => false
  }

  private def nullStr = lit(null).cast("string")
  private def nullBool = lit(null).cast("boolean")
  private def nullDouble = lit(null).cast("double")

  private def enc(rank: Column, s: Column, b: Column, d: Column, repr: Column): Column =
    struct(rank.as("rank"), s.as("s"), b.as("b"), d.as("d"), repr.as("repr"))
}
