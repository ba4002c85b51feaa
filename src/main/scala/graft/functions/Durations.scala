package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Cypher's 4-field duration type (reference values/storable/
 * DurationValue.java: months, days, seconds, nanos — deliberately NOT
 * normalized across calendar units, because a month or a day is not a fixed
 * number of seconds). Spark's CalendarIntervalType is months/days/micros
 * and not comparable/aggregatable, so graft represents durations as a
 * STRUCT<months: BIGINT, days: BIGINT, seconds: BIGINT, nanos: BIGINT> —
 * columnar, sortable field-wise, and exactly the reference's component
 * semantics.
 */
object Durations {

  def duration(months: Column, days: Column, seconds: Column, nanos: Column): Column =
    struct(months.cast("long").as("months"), days.cast("long").as("days"),
      seconds.cast("long").as("seconds"), nanos.cast("long").as("nanos"))

  def duration(months: Long, days: Long, seconds: Long, nanos: Long): Column =
    duration(lit(months), lit(days), lit(seconds), lit(nanos))

  /** ISO-8601 duration literal `PnYnMnWnDTnHnMnS` (the reference's
    * DurationValue.parse): regexp field extraction, codegen'd. Seconds may
    * carry a fractional part → nanos. */
  def parseIso(s: Column): Column = {
    def grp(re: String, idx: Int): Column = {
      val x = regexp_extract(s, re, idx)
      when(x === "", 0L).otherwise(x.cast("long"))
    }
    val years   = grp("P(?:(\\d+)Y)?", 1)
    val months  = grp("P(?:\\d+Y)?(?:(\\d+)M)?", 1)
    val weeks   = grp("P(?:\\d+Y)?(?:\\d+M)?(?:(\\d+)W)?", 1)
    val days    = grp("P(?:\\d+Y)?(?:\\d+M)?(?:\\d+W)?(?:(\\d+)D)?", 1)
    val hours   = grp("T(?:(\\d+)H)?", 1)
    val minutes = grp("T(?:\\d+H)?(?:(\\d+)M)?", 1)
    val secsStr = regexp_extract(s, "T(?:\\d+H)?(?:\\d+M)?(?:(\\d+(?:\\.\\d+)?)S)?", 1)
    val secsWhole = when(secsStr === "", 0L).otherwise(floor(secsStr.cast("double")).cast("long"))
    val nanos = when(secsStr === "", 0L)
      .otherwise(round((secsStr.cast("double") - floor(secsStr.cast("double"))) * 1e9).cast("long"))
    duration(years * 12 + months, weeks * 7 + days,
      hours * 3600 + minutes * 60 + secsWhole, nanos)
  }

  /** duration.between for DATE columns (reference DurationValue.between):
    * whole calendar months, then leftover days. */
  def betweenDates(from: Column, to: Column): Column = {
    val rawMonths = (year(to) - year(from)) * 12 + (month(to) - month(from))
    val borrow = when(dayofmonth(to) < dayofmonth(from), 1).otherwise(0)
    val m = (rawMonths - borrow).cast("long")
    val d = datediff(to, add_months(from, m.cast("int"))).cast("long")
    duration(m, d, lit(0L), lit(0L))
  }

  /** duration.inDays — whole days only. */
  def inDays(from: Column, to: Column): Column =
    duration(lit(0L), datediff(to, from).cast("long"), lit(0L), lit(0L))

  /** duration.inSeconds for TIMESTAMP columns. */
  /** duration.inMonths: whole months between two temporals, truncated
    * toward zero (reference DurationValue.approximate / TemporalFunctions). */
  def inMonths(from: Column, to: Column): Column =
    duration(months_between(to, from, roundOff = false).cast("long"),
      lit(0L), lit(0L), lit(0L))

  def inSeconds(from: Column, to: Column): Column =
    duration(lit(0L), lit(0L), (unix_micros(to) - unix_micros(from)) / 1000000L,
      ((unix_micros(to) - unix_micros(from)) % 1000000L) * 1000L)

  private def f(d: Column, field: String): Column = d.getField(field)

  /** Component-wise add/subtract/scale — Cypher duration arithmetic. */
  def plus(a: Column, b: Column): Column =
    duration(f(a, "months") + f(b, "months"), f(a, "days") + f(b, "days"),
      f(a, "seconds") + f(b, "seconds"), f(a, "nanos") + f(b, "nanos"))

  def minus(a: Column, b: Column): Column =
    duration(f(a, "months") - f(b, "months"), f(a, "days") - f(b, "days"),
      f(a, "seconds") - f(b, "seconds"), f(a, "nanos") - f(b, "nanos"))

  def times(a: Column, k: Column): Column =
    duration(f(a, "months") * k, f(a, "days") * k, f(a, "seconds") * k, f(a, "nanos") * k)

  /** Carry nanos→seconds (the reference normalizes sub-second components;
    * calendar units stay separate by design). */
  def normalized(d: Column): Column = {
    val totalNanos = f(d, "seconds") * 1000000000L + f(d, "nanos")
    duration(f(d, "months"), f(d, "days"),
      (totalNanos / 1000000000L).cast("long"), pmod(totalNanos, lit(1000000000L)).cast("long"))
  }

  /** date + duration (calendar-aware: months first, then days). */
  def addToDate(date: Column, d: Column): Column =
    date_add(add_months(date, f(d, "months").cast("int")), f(d, "days").cast("int"))

  /** timestamp + duration (months, days, then exact seconds/nanos→micros). */
  def addToTimestamp(ts: Column, d: Column): Column =
    timestamp_micros(unix_micros(
      to_timestamp(date_add(add_months(ts.cast("date"), f(d, "months").cast("int")),
        f(d, "days").cast("int")))) +
      (unix_micros(ts) - unix_micros(to_timestamp(ts.cast("date")))) +
      f(d, "seconds") * 1000000L + (f(d, "nanos") / 1000L).cast("long"))

  /** SUM aggregate over a duration column — component-wise, like the
    * reference's duration-aware sum (SURVEY §2.5). */
  def sumDuration(d: Column): Column =
    struct(sum(f(d, "months")).as("months"), sum(f(d, "days")).as("days"),
      sum(f(d, "seconds")).as("seconds"), sum(f(d, "nanos")).as("nanos"))

  /** AVG aggregate — component-wise mean, truncated to whole components. */
  def avgDuration(d: Column): Column =
    struct(floor(avg(f(d, "months"))).cast("long").as("months"),
      floor(avg(f(d, "days"))).cast("long").as("days"),
      floor(avg(f(d, "seconds"))).cast("long").as("seconds"),
      floor(avg(f(d, "nanos"))).cast("long").as("nanos"))
}
