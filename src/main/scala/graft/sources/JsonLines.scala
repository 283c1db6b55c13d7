package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Newline-delimited JSON ingestion — the delivery format crawl dumps
  * and annotation exports actually arrive in (one JSON object per
  * line, schema drift and truncated lines included). A 100 TB ingest
  * can neither crash on a malformed line (FAILFAST) nor silently
  * null it away (default PERMISSIVE): this reader enforces a
  * caller-supplied schema and QUARANTINES every unparseable line
  * verbatim, so ingest is total and the quarantine is auditable —
  * the JSONL analogue of the reference's
  * row-validation-before-migration step
  * (reference lambda_fns/order.js:346→420, which sweeps rows that
  * fail linkage instead of dropping them).
  *
  * Scale shape: line-splittable text input (parallel scan at any
  * size), schema projection at the parser (no infer pass over 100 TB
  * — `inferSchema` on JSONL is a full extra scan), and the good/bad
  * split is one map-side filter each over the same cached parse.
  */
object JsonLines {

  val CorruptCol = "_corrupt_line"

  /** An ingested JSONL split plus the handle to its one cached parse:
    * `release()` unpersists the parent after BOTH splits are
    * materialized (write the good rows, audit/persist the
    * quarantine, then release). Without the handle, repeated ingests
    * in one long-lived session accumulate cached parses — at 100 TB
    * ingest cadence that is an executor-memory leak, not a
    * convenience. */
  final case class Ingest(good: DataFrame, quarantined: DataFrame,
      release: () => Unit)

  /** Parse `path` against `schema`; returns the [[Ingest]] handle.
    * `good` has exactly the schema's columns; `quarantined` is one
    * string column [[CorruptCol]] holding each bad line verbatim.
    * The parsed frame is cached: Spark's JSON reader refuses to
    * answer queries that project ONLY the corrupt column from a raw
    * scan, and the cache also makes good/bad one parse, not two. */
  def readHandle(spark: SparkSession, path: String,
      schema: StructType): Ingest = {
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType))
    val parsed = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    val good = parsed.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val bad = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol))
    Ingest(good, bad, () => { parsed.unpersist(); () })
  }

  /** [[readHandle]] without the release handle — for one-shot
    * sessions (tests, single-ingest jobs) where the cache dies with
    * the session anyway. Long-lived ingest loops must use
    * [[readHandle]] and release each parse. */
  def read(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val h = readHandle(spark, path, schema)
    (h.good, h.quarantined)
  }

  /** One JSON object per line, the same format [[read]] accepts —
    * round-trip safe for the given schema. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
