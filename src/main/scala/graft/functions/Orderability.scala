package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, MapType,
  NullType, NumericType, StringType, StructType}

/**
 * Cypher cross-type orderability (reference community/values
 * AnyValues.COMPARATOR, openCypher CIP "Comparability and orderability"):
 * ascending global order runs Map < Node < Relationship < List < Path <
 * temporals < Duration < String < Boolean < Number, with NULL LAST
 * (and first under DESC).
 *
 * Columnar encoding: a STRUCT(rank, s, b, d, l, repr). Spark compares
 * structs field by field, so ordering the encoded value reproduces the
 * global order with no custom comparator, no UDF, full codegen:
 *  - `rank` separates types (type-rank order above);
 *  - exactly one payload field (`s` string / `b` boolean / `d` double /
 *    `l` nested list) is non-null per value, so same-rank values compare
 *    by payload while the other payload fields tie as NULL = NULL;
 *  - `repr` trails the comparison fields (it is functionally determined by
 *    them, so it never influences ordering) and carries the display text
 *    that toString() returns.
 *
 * Numbers compare numerically across Long/Double via the `d` field —
 * exactly the reference's cross-numeric-type comparison (and Spark puts
 * double NaN after +Infinity, matching the reference's NaN placement).
 *
 * NESTING: `l` holds an array of element structs with the SAME field
 * layout, recursively, down to [[MaxDepth]] payload levels (the deepest
 * level is scalar-only). Spark orders arrays element-wise with
 * shorter-prefix-first — exactly Cypher's list orderability — and a
 * struct containing an array field remains orderable, so one
 * field-by-field struct comparison reproduces the global order for
 * arbitrarily mixed lists of lists. MAPS (reference MapValue
 * .unsafeCompareTo: size first, then keys in sorted order, then values in
 * sorted-key order) encode as rank Map, `d` = size, and `l` = the sorted
 * key elements followed by the corresponding value elements — the struct
 * comparison then replays exactly that sequence. Value mixes nested
 * deeper than MaxDepth levels remain a compile-time rejection.
 */
object Orderability {

  /** payload levels below the column struct: level 0 is the column, its
    * list elements are level 1, theirs level 2, …; the level-MaxDepth
    * struct is scalar-only. Depth 4 covers the deepest shapes in the
    * reference's acceptance corpus (`[null, [null, {a: null}], {b: [null,
    * {c: [null]}]}]` — list→map→list→map→list) — beyond it the planner
    * rejects at compile time, as before for any nesting. */
  val MaxDepth = 4

  /** field layout of the encoded struct — used to recognize encoded
    * columns. */
  val StructFields: Seq[String] = Seq("rank", "s", "b", "d", "l", "repr")

  /** graft's duration struct layout (Durations.scala) — recognized so a
    * duration is encoded as a DURATION (ValueGroup.java:51), not a MAP. */
  val DurationFields: Seq[String] = Seq("months", "days", "seconds", "nanos")

  /** graft's path value layout (Planner named paths) — recognized so a
    * path is encoded as a PATH, not a MAP. */
  val PathStructFields: Seq[String] = Seq("nodes", "rels", "length")

  /** graft's point struct layout (Spatial.scala) — recognized so a point
    * is encoded as GEOMETRY (ValueGroup.java:45), not a MAP. */
  val PointFields: Seq[String] = Seq("x", "y", "srid")

  /** graft's time-of-day layouts (Planner time()/localTime() — reference
    * values/storable/TimeValue.java, LocalTimeValue.java): nanos since
    * midnight, plus the zone offset in seconds for the zoned kind. */
  val ZonedTimeFields: Seq[String] = Seq("tnanos", "toffset")
  val LocalTimeFields: Seq[String] = Seq("tnanos")

  /** HH:mm:ss(.fraction) text of a nanos-since-midnight column. */
  def timeOfDayRepr(tn: Column): Column = {
    def two(c: Column) = lpad(c.cast("string"), 2, "0")
    val h = (tn / lit(3600000000000L)).cast("long")
    val mi = ((tn / lit(60000000000L)) % 60).cast("long")
    val se = ((tn / lit(1000000000L)) % 60).cast("long")
    val frac = (tn % lit(1000000000L)).cast("long")
    val base = concat(two(h), lit(":"), two(mi), lit(":"), two(se))
    when(frac > 0, concat(base, lit("."),
      regexp_replace(lpad(frac.cast("string"), 9, "0"), "0+$", "")))
      .otherwise(base)
  }

  /** ±HH:MM (or Z) text of an offset-seconds column. */
  def zoneOffsetRepr(off: Column): Column = {
    def two(c: Column) = lpad(c.cast("string"), 2, "0")
    val a = abs(off)
    when(off === 0, lit("Z")).otherwise(concat(
      when(off < 0, lit("-")).otherwise(lit("+")),
      two((a / 3600).cast("long")), lit(":"),
      two(((a / 60) % 60).cast("long"))))
  }

  private def ztimeAt(depth: Int, c: Column): Column =
    nullAware(depth, c, encAt(depth, lit(RankZonedTime),
      // secondary: offset (UTC-equal instants order by offset, reference
      // ZonedTimeValue comparison)
      lpad((c.getField("toffset") + 64800).cast("string"), 6, "0"),
      nullBool,
      // primary sort key: the UTC instant (nanos)
      (c.getField("tnanos") -
        c.getField("toffset").cast("long") * 1000000000L).cast("double"),
      nullListAt(depth),
      concat(timeOfDayRepr(c.getField("tnanos")),
        zoneOffsetRepr(c.getField("toffset")))))

  private def ltimeAt(depth: Int, c: Column): Column =
    nullAware(depth, c, encAt(depth, lit(RankLocalTime), nullStr, nullBool,
      c.getField("tnanos").cast("double"), nullListAt(depth),
      timeOfDayRepr(c.getField("tnanos"))))

  // type ranks per the CIP order; only the relative order matters.
  // PUBLIC: the result layer decodes entity ranks back through the graph
  // snapshot (an id alone cannot render a node).
  val RankMap = 5 // Map < Node < Relationship < List (AnyValues :42)
  val RankNode = 6
  val RankRel = 7
  val RankList = 8 // List < Path < temporals < … < String per the CIP
  val RankPath = 9
  val RankPoint = 10 // GEOMETRY before temporals (ValueGroup.java:45)
  val RankZdt = 11 // ZONED_DATE_TIME (ValueGroup.java:46)
  val RankLdt = 12 // LOCAL_DATE_TIME
  val RankDate = 13 // DATE
  val RankZonedTime = 14 // ZONED_TIME (ValueGroup.java:49)
  val RankLocalTime = 15 // LOCAL_TIME (ValueGroup.java:50)
  val RankDuration = 16 // …temporals < DURATION < TEXT (ValueGroup.java:51)
  val RankString = 17
  val RankBoolean = 18
  val RankNumber = 19
  val RankNull = 20 // null sorts last ascending, first descending

  /** DDL of the element struct at `depth` (for typed null/empty literals) */
  private def structDdl(depth: Int): String =
    if (depth >= MaxDepth) "struct<rank:int,s:string,b:boolean,d:double,repr:string>"
    else s"struct<rank:int,s:string,b:boolean,d:double,l:array<${structDdl(depth + 1)}>,repr:string>"

  private def nullStr = lit(null).cast("string")
  private def nullBool = lit(null).cast("boolean")
  private def nullDouble = lit(null).cast("double")
  private def nullListAt(depth: Int) =
    lit(null).cast(s"array<${structDdl(depth + 1)}>")

  /** canonical (all-nullable) DDL of the column-level encoded struct —
    * cast target to align nullability across independently-built encoded
    * values before a concat/union */
  def encodedDdl: String = structDdl(0)

  /** typed empty element array for `depth`'s `l` payload */
  def emptyElems(depth: Int = 0): Column =
    array().cast(s"array<${structDdl(depth + 1)}>")

  private def encAt(depth: Int, rank: Column, s: Column, b: Column,
      d: Column, l: Column, repr: Column): Column =
    if (depth >= MaxDepth)
      struct(rank.as("rank"), s.as("s"), b.as("b"), d.as("d"),
        repr.as("repr"))
    else
      struct(rank.as("rank"), s.as("s"), b.as("b"), d.as("d"), l.as("l"),
        repr.as("repr"))

  // ---- scalar encoders at any depth ------------------------------------

  def stringAt(depth: Int, c: Column): Column =
    nullAware(depth, c, encAt(depth, lit(RankString), c, nullBool, nullDouble,
      nullListAt(depth), c))

  def booleanAt(depth: Int, c: Column): Column =
    nullAware(depth, c, encAt(depth, lit(RankBoolean), nullStr, c, nullDouble,
      nullListAt(depth), c.cast("string")))

  def numberAt(depth: Int, c: Column): Column =
    nullAware(depth, c, encAt(depth, lit(RankNumber), nullStr, nullBool,
      c.cast("double"), nullListAt(depth), c.cast("string")))

  def dateAt(depth: Int, c: Column): Column =
    nullAware(depth, c, encAt(depth, lit(RankDate), nullStr, nullBool,
      datediff(c, lit("1970-01-01")).cast("double"), nullListAt(depth),
      date_format(c, "yyyy-MM-dd")))

  def zdtAt(depth: Int, c: Column): Column =
    nullAware(depth, c, encAt(depth, lit(RankZdt), nullStr, nullBool,
      unix_micros(c).cast("double"), nullListAt(depth),
      date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")))

  def ldtAt(depth: Int, c: Column): Column =
    nullAware(depth, c, encAt(depth, lit(RankLdt), nullStr, nullBool,
      unix_micros(c.cast("timestamp")).cast("double"), nullListAt(depth),
      date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")))

  def nullAt(depth: Int): Column =
    encAt(depth, lit(RankNull), nullStr, nullBool, nullDouble,
      nullListAt(depth), lit("null"))

  /** list at `depth` whose elements are already depth+1 structs */
  def listOfEncodedAt(depth: Int, es: Column): Column =
    encAt(depth, lit(RankList), nullStr, nullBool, nullDouble, es,
      concat(lit("["),
        array_join(transform(es, e => e.getField("repr")), ", "), lit("]")))

  /** a null value at any position sorts last (reference AnyValues
    * comparator: NO_VALUE is bigger than all other values) — wrap every
    * value encoder */
  private def nullAware(depth: Int, c: Column, e: Column): Column =
    when(c.isNull, nullAt(depth)).otherwise(e)

  /** DURATION encoder (reference DurationValue.COMPARATOR: average length
    * in seconds — months·2 629 746 + days·86 400 + seconds, nanos NOT
    * included — then nanos, months, days, seconds as tiebreaks). `d`
    * carries the average length; the tiebreak chain rides in `l` as
    * number elements, compared element-wise. Needs an `l` payload, so the
    * deepest level stays a compile-time rejection. */
  def durationAt(depth: Int, c: Column): Column = {
    val m = c.getField("months"); val dy = c.getField("days")
    val sc = c.getField("seconds"); val n = c.getField("nanos")
    val avgL = m * 2629746L + dy * 86400L + sc
    val avg = avgL.cast("double")
    // the double `d` is only a COARSE first key — monotone but lossy past
    // 2^53 seconds, where unequal averages collide. A hi/lo split of the
    // exact long average (each half < 2^32, exactly representable as the
    // tiebreak doubles) rides AHEAD of the component tiebreaks, so the
    // nanos-first chain can never reorder durations whose exact averages
    // differ (reference DurationValue.COMPARATOR compares the average
    // length as a long, exactly).
    val lo = pmod(avgL, lit(2147483648L))
    val hi = ((avgL - lo) / 2147483648L).cast("long")
    val ties = array(numberAt(depth + 1, hi), numberAt(depth + 1, lo),
      numberAt(depth + 1, n), numberAt(depth + 1, m),
      numberAt(depth + 1, dy), numberAt(depth + 1, sc))
    nullAware(depth, c, encAt(depth, lit(RankDuration), nullStr, nullBool,
      avg, ties, durationRepr(c)))
  }

  /** ISO-8601 text per the reference's DurationValue.prettyPrint: zero
    * components omitted, negative sub-second borrow, all-zero → PT0S. */
  private def durationRepr(c: Column): Column = {
    val months = c.getField("months"); val days = c.getField("days")
    val secs = c.getField("seconds"); val nanos = c.getField("nanos")
    def seg(v: Column, unit: String): Column =
      when(v =!= 0L, concat(v.cast("string"), lit(unit))).otherwise(lit(""))
    val years = ((months - months % 12) / 12).cast("long")
    val remM = months % 12
    // negative borrow: -1s + 5e8ns prints -0.5S (prettyPrint's s++/n-=1e9)
    val negative = secs < 0 && nanos =!= 0L
    val s2 = when(negative, secs + 1L).otherwise(secs)
    val n2 = when(negative, nanos - 1000000000L).otherwise(nanos)
    val hours = ((s2 - s2 % 3600L) / 3600L).cast("long")
    val rem = s2 % 3600L
    val mins = ((rem - rem % 60L) / 60L).cast("long")
    val sfin = rem % 60L
    val frac = when(n2 === 0L, lit("")).otherwise(concat(lit("."),
      regexp_replace(lpad(abs(n2).cast("string"), 9, "0"), "0+$", "")))
    val secSeg =
      when(sfin =!= 0L, concat(
          when(negative && sfin >= 0L && n2 =!= 0L, lit("-")).otherwise(lit("")),
          sfin.cast("string"), frac, lit("S")))
        .when(n2 =!= 0L, concat(
          when(negative, lit("-")).otherwise(lit("")), lit("0"), frac, lit("S")))
        .otherwise(lit(""))
    val timePart = when(secs =!= 0L || nanos =!= 0L,
      concat(lit("T"), seg(hours, "H"), seg(mins, "M"), secSeg))
      .otherwise(lit(""))
    val whole = concat(lit("P"), seg(years, "Y"), seg(remM, "M"),
      seg(days, "D"), timePart)
    when(whole === "P", lit("PT0S")).otherwise(whole)
  }

  /** GEOMETRY/point encoder (reference PointValue.compareTo: CRS code
    * first, then coordinates in order). `d` = srid; x,y ride in `l`. */
  def pointAt(depth: Int, c: Column): Column = {
    val x = c.getField("x"); val y = c.getField("y")
    val srid = c.getField("srid")
    val crsName = when(srid === 4326, lit("wgs-84")).otherwise(lit("cartesian"))
    val repr = concat(lit("point({x: "), x.cast("string"), lit(", y: "),
      y.cast("string"), lit(", crs: '"), crsName, lit("'})"))
    nullAware(depth, c, encAt(depth, lit(RankPoint), nullStr, nullBool,
      srid.cast("double"),
      array(numberAt(depth + 1, x), numberAt(depth + 1, y)), repr))
  }

  // ---- top-level (column) aliases — the public surface pre-nesting -----

  def string(c: Column): Column = stringAt(0, c)
  def boolean(c: Column): Column = booleanAt(0, c)
  def number(c: Column): Column = numberAt(0, c)
  def nullValue: Column = nullAt(0)
  def listOfEncoded(es: Column): Column = listOfEncodedAt(0, es)

  // ---- entity encoders ---------------------------------------------------
  // A node/relationship VALUE inside a mixed column is its id, carried
  // EXACTLY as a decimal string in `s` (a double payload would corrupt
  // xxhash64 ids past 2^53). Order among entities is therefore the string
  // order of their ids — deterministic and equality-exact, though not the
  // reference's creation order (ids differ between engines anyway). The
  // repr is a marker the result layer resolves through the graph snapshot.

  def nodeAt(depth: Int, id: Column): Column =
    nullAware(depth, id, encAt(depth, lit(RankNode), id.cast("string"),
      nullBool, nullDouble, nullListAt(depth),
      concat(lit("__node:"), id.cast("string"))))

  def relAt(depth: Int, id: Column): Column =
    nullAware(depth, id, encAt(depth, lit(RankRel), id.cast("string"),
      nullBool, nullDouble, nullListAt(depth),
      concat(lit("__rel:"), id.cast("string"))))

  /** path value = STRUCT{nodes, rels, length}: `s` carries the id lists
    * canonically ("n,n|r,r" — equality-exact, deterministic order), `d`
    * the length (coarse first key). */
  def pathAt(depth: Int, p: Column): Column = {
    val s = concat(
      array_join(transform(p.getField("nodes"), _.cast("string")), ","),
      lit("|"),
      array_join(transform(p.getField("rels"), _.cast("string")), ","))
    nullAware(depth, p, encAt(depth, lit(RankPath), s, nullBool,
      p.getField("length").cast("double"), nullListAt(depth),
      concat(lit("__path:"), s)))
  }

  // ---- depth lifting / UNWIND --------------------------------------------

  /** rebuild a column-level (depth 0) encoded struct in the layout of
    * `depth` below the column — nesting an already-encoded value one or
    * more levels deeper (`[encoded, …]`). Content past MaxDepth is
    * truncated: the planner rejects such nesting before it can carry
    * data, so nothing real is lost. */
  def sinkElem(c: Column, depth: Int): Column =
    nullAware(depth, c, sinkFrom(c, 0, depth))
  private def sinkFrom(c: Column, src: Int, tgt: Int): Column = {
    val l =
      if (tgt >= MaxDepth) nullListAt(tgt) // dropped by encAt
      else if (src >= MaxDepth) nullListAt(tgt)
      else transform(c.getField("l"), e => sinkFrom(e, src + 1, tgt + 1))
    encAt(tgt, c.getField("rank"), c.getField("s"), c.getField("b"),
      c.getField("d"), l, c.getField("repr"))
  }

  /** rebuild an element struct encoded at `depth` (1-based below the
    * column) in the layout of `depth - 1`, recursively — the inverse of
    * nesting. The deepest level has no `l`, so it lifts with a null list
    * payload (only scalars live there). */
  def liftElem(c: Column, depth: Int): Column = {
    val l =
      if (depth >= MaxDepth) nullListAt(depth - 1)
      else transform(c.getField("l"), e => liftElem(e, depth + 1))
    val lifted = encAt(depth - 1, c.getField("rank"), c.getField("s"),
      c.getField("b"), c.getField("d"), l, c.getField("repr"))
    when(c.isNull, lit(null).cast(s"struct<${structInner(depth - 1)}>"))
      .otherwise(lifted)
  }
  private def structInner(depth: Int): String = {
    val ddl = structDdl(depth)
    ddl.substring("struct<".length, ddl.length - 1)
  }

  /** UNWIND semantics over a variant-encoded value: a LIST contributes its
    * elements (lifted back to the column layout), NULL contributes no
    * rows, any other value contributes itself. `explode` of the result
    * reproduces Cypher's UNWIND exactly. */
  def unwindElems(c: Column): Column = {
    val rank = c.getField("rank")
    when(c.isNull || rank === lit(RankNull),
        array().cast(s"array<${structDdl(0)}>"))
      .when(rank === lit(RankList),
        transform(c.getField("l"), e => liftElem(e, 1)))
      .otherwise(array(c))
  }

  /** list of scalar elements — element-wise global order via the element
    * encoder, shorter list first on a prefix tie (Spark array ordering) */
  def list(c: Column, elem: Column => Column): Column =
    listOfEncoded(transform(c, elem))

  // legacy element-level encoders (depth-1 positions)
  def elemString(c: Column): Column = stringAt(1, c)
  def elemBoolean(c: Column): Column = booleanAt(1, c)
  def elemNumber(c: Column): Column = numberAt(1, c)
  def elemNull: Column = nullAt(1)

  /** element encoder for a list's scalar element type; None = not an
    * orderability-encodable element at that depth */
  def elemEncoderFor(dt: DataType): Option[Column => Column] =
    encoderAt(1, dt)

  /** encoder for `dt` at nesting `depth`; None = not encodable there
    * (e.g. a list at the deepest level) */
  def encoderAt(depth: Int, dt: DataType): Option[Column => Column] =
    dt match {
      case t if depth == 0 && isEncoded(t) => Some(identity)
      case StringType     => Some(stringAt(depth, _))
      case BooleanType    => Some(booleanAt(depth, _))
      case _: NumericType => Some(numberAt(depth, _))
      case NullType       => Some(_ => nullAt(depth))
      case org.apache.spark.sql.types.DateType => Some(dateAt(depth, _))
      case org.apache.spark.sql.types.TimestampType => Some(zdtAt(depth, _))
      case org.apache.spark.sql.types.TimestampNTZType => Some(ldtAt(depth, _))
      case ArrayType(et, _) if depth < MaxDepth =>
        encoderAt(depth + 1, et).map(f =>
          (c: Column) => nullAware(depth, c,
            listOfEncodedAt(depth, transform(c, f))))
      case MapType(StringType, vt, _) if depth < MaxDepth =>
        encoderAt(depth + 1, vt).map(f =>
          (c: Column) => nullAware(depth, c, mapEnc(depth, c, f)))
      case MapType(NullType, NullType, _) if depth < MaxDepth =>
        // ONLY the `{}` literal's MAP<VOID, VOID> — necessarily empty at
        // runtime, so rank Map, size 0. Non-string-keyed maps with real
        // keys (MAP<INT, VOID> from a cast) must NOT match: encoding them
        // as '{}' would silently drop keys from ordering/comparison.
        Some((c: Column) => nullAware(depth, c,
          encAt(depth, lit(RankMap), nullStr, nullBool,
            size(c).cast("double"), emptyElems(depth), lit("{}"))))
      case st: StructType if st.fieldNames.toSeq == PathStructFields =>
        Some(pathAt(depth, _))
      case st: StructType if st.fieldNames.toSeq == ZonedTimeFields =>
        Some(ztimeAt(depth, _))
      case st: StructType if st.fieldNames.toSeq == LocalTimeFields =>
        Some(ltimeAt(depth, _))
      case st: StructType if depth < MaxDepth &&
          st.fieldNames.toSeq == DurationFields =>
        Some(durationAt(depth, _))
      case st: StructType if depth < MaxDepth &&
          st.fieldNames.toSeq == PointFields =>
        Some(pointAt(depth, _))
      case st: StructType if st.fieldNames.toSeq == StructFields =>
        // an already-encoded struct: pass through at the column level;
        // below it, re-nest via sinkElem (layout depth must match the
        // position it is embedded at)
        if (depth == 0) Some(identity)
        else Some(sinkElem(_, depth))
      case st: StructType if depth < MaxDepth =>
        // literal maps / map projections compile to structs: a map value
        // with statically-known sorted keys
        val fs = st.fields.sortBy(_.name)
        val encs = fs.map(fld => encoderAt(depth + 1, fld.dataType))
        if (encs.exists(_.isEmpty)) None
        else Some { (c: Column) =>
          val keys = fs.map(fld => stringAt(depth + 1, lit(fld.name)))
          val vals = fs.zip(encs).map { case (fld, enc) =>
            enc.get(c.getField(fld.name)) }
          val repr = concat(lit("{"), concat_ws(", ",
            fs.zip(vals).map { case (fld, v) =>
              concat(lit(fld.name + ": "), v.getField("repr")) }: _*),
            lit("}"))
          nullAware(depth, c,
            encAt(depth, lit(RankMap), nullStr, nullBool,
              lit(fs.length).cast("double"),
              array((keys ++ vals): _*), repr))
        }
      case _ => None
    }

  /** MAP encoding from statically-known keys with ALREADY-ENCODED (at
    * depth+1) value columns — literal maps whose values mix types or hold
    * entities (`{k: n, l: 42}` in a heterogeneous list). Same layout as
    * [[mapEnc]]: d = size, l = sorted keys then values in key order. */
  def mapOfEncodedAt(depth: Int, entries: Seq[(String, Column)]): Column = {
    if (entries.isEmpty)
      encAt(depth, lit(RankMap), nullStr, nullBool, lit(0.0),
        emptyElems(depth), lit("{}"))
    else {
      val sorted = entries.sortBy(_._1)
      val keys = sorted.map(kv => stringAt(depth + 1, lit(kv._1)))
      val vals = sorted.map(_._2)
      val repr = concat(lit("{"), concat_ws(", ",
        sorted.map { case (k, v) =>
          concat(lit(k + ": "), v.getField("repr")) }: _*), lit("}"))
      encAt(depth, lit(RankMap), nullStr, nullBool,
        lit(sorted.length).cast("double"), array((keys ++ vals): _*), repr)
    }
  }

  /** MAP encoding (reference MapValue.unsafeCompareTo): `d` = size, `l` =
    * sorted-key elements then value elements in sorted-key order. Keys
    * sort with array_sort; values are fetched per sorted key so the value
    * type never needs native Spark ordering (maps aren't orderable). */
  private def mapEnc(depth: Int, c: Column, valEnc: Column => Column): Column = {
    val sortedKeys = array_sort(map_keys(c))
    val keyElems = transform(sortedKeys, k => stringAt(depth + 1, k))
    val valElems = transform(sortedKeys, k => valEnc(element_at(c, k)))
    val repr = concat(lit("{"),
      array_join(transform(sortedKeys,
        k => concat(k, lit(": "),
          valEnc(element_at(c, k)).getField("repr"))), ", "),
      lit("}"))
    encAt(depth, lit(RankMap), nullStr, nullBool,
      size(c).cast("double"), concat(keyElems, valElems), repr)
  }

  /** lift any statically-typed column into the encoding (pass-through for
    * already-encoded); None = not encodable at this type */
  def encodeAny(dt: DataType, c: Column): Option[Column] =
    encoderAt(0, dt).map(_(c))

  /** display text of an encoded value (Cypher toString semantics; map
    * entries render in sorted-key order — the deterministic choice). */
  def repr(c: Column): Column = c.getField("repr")

  def isEncoded(dt: DataType): Boolean = dt match {
    case st: StructType => st.fieldNames.toSeq == StructFields
    case _              => false
  }
}
