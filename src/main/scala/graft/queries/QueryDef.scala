package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One verifiable unit of the correctness gate: a Spark implementation plus
 * (when SQL-expressible) an equivalent DuckDB oracle over the same parquet
 * tables. Column names and types must line up — the driver sorts columns by
 * name and hashes values.
 *
 * Oracle-parity rules used throughout the registry:
 *  - every computed column aliased identically on both sides
 *  - doubles rounded (sum/avg 2dp, ratios 4dp) to absorb summation-order ulps
 *  - counts are BIGINT on both sides (DuckDB len()/year() etc. cast as needed)
 *  - deterministic ORDER BY / tiebreaks wherever ranks or offsets matter
 */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Shorthand for reading one of the driver's parquet tables. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
