package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot join keys. AQE's skew-join splitting covers
 * sort-merge joins at runtime, but explicit salting is still the tool when
 * a handful of keys dominate a shuffle AND the plan shape blocks AQE
 * (bucketed inputs, broadcast-ineligible dims, stateful streaming).
 *
 * The classic two-sided transform: the big (fact) side gets a
 * deterministic salt in [0, salts) derived from its row content, the small
 * (dim) side replicates once per salt value, and the join key becomes
 * (key, salt) — one hot key's rows now spread over `salts` reducers.
 * Deterministic salting (hash, not rand) keeps results reproducible and
 * retryable — a failed task re-computes the same salt.
 */
object Skew {

  /** Inner equi-join on `key`, salted `salts` ways. Dim-side rows replicate
    * `salts` times (keep dims small — that is the skew scenario); fact rows
    * salt by hash of the whole row's key + a stable disambiguator. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase distinct count per key: partial distinct within (key, salt)
    * partitions, then merge — bounds any single reducer's state even when
    * one key holds most of the data (plain count-distinct funnels the whole
    * hot key through one reducer). */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    df.select(col(key), col(valueCol).as("__v"),
        pmod(xxhash64(col(valueCol)), lit(salts.toLong)).as("__salt"))
      .groupBy(col(key), col("__salt"))
      .agg(count_distinct(col("__v")).as("__partial"))
      // value-hash salting sends equal values to the SAME salt, so the
      // per-salt distinct counts partition the global distinct set
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n_distinct"))
  }
}
