package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * JSONL corpus sink/source — the interchange format LLM training
 * pipelines actually exchange (one JSON document per line; every major
 * data-curation stack reads and writes it). The reference side of this
 * coin is the CSV bulk tool ([[ExportCsv]]); JSONL is the same role for
 * document corpora.
 *
 * Export serializes each row with NAME-SORTED keys, so the bytes are
 * deterministic given the row content — a re-export of the same frame
 * diffs clean, and downstream content-hash dedup over the serialized
 * lines is stable. Null fields are omitted (the JSONL convention; also
 * what keeps pure schema extension from rewriting history — the same
 * property the GraphStore diff relies on).
 *
 * Scale shape: both directions are plain distributed text scans/writes —
 * one file per partition, no driver materialization. Readers pass the
 * expected schema to skip Spark's sampling inference pass (at 100 TB an
 * inference pass is a full extra scan).
 */
object Jsonl {

  /** Write `df` as JSONL under `dir`, name-sorted keys, nulls omitted. */
  def save(df: DataFrame, dir: String): Unit =
    df.select(to_json(struct(df.columns.sorted.map(col).toSeq: _*)).as("value"))
      .write.mode("overwrite").text(dir)

  /** Read JSONL back. Pass `schema` to avoid the inference scan; corrupt
    * lines land in `_corrupt_record` per Spark's PERMISSIVE default. */
  def load(spark: SparkSession, dir: String,
      schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read.json(dir))(s => spark.read.schema(s).json(dir))
}
