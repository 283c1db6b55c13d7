package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Single place mapping `(sfDir, table) → DataFrame`.
  *
  * Mirrors the reference's data-access layer (the lambda handlers'
  * `dbConnection.query` calls in
  * reference lambda_fns/order_rdbms_blob.js:449-608) — except here the
  * "database" is columnar parquet and every read is a distributed,
  * column-pruned, predicate-pushed scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Some exporters write event time as TIMESTAMP(NANOS), which Spark
    // refuses by default; accept it as a raw nanosecond LONG. Harmless
    // no-op for the (more common) TIMESTAMP(MICROS) encoding — see
    // [[tsSec]] for how queries stay agnostic to which one arrived.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Epoch-seconds (floor) column for an events frame, adaptive to
    * whatever physical encoding the lake delivered for `ts`. A real
    * lake never guarantees one timestamp encoding — Parquet event time
    * shows up as TIMESTAMP(MICROS) (decoded TIMESTAMP or, when
    * isAdjustedToUTC=false, TIMESTAMP_NTZ) or TIMESTAMP(NANOS)
    * (decoded as a raw nanosecond LONG via nanosAsLong) depending on
    * the exporter — so the engine inspects the schema and adapts
    * instead of trusting one. All arithmetic is integral (`div`):
    * double math would lose precision above 2^53. The session is
    * pinned UTC (GraftSession), so the NTZ→TZ cast is wall-clock
    * exact; testdata epochs are positive, where `div` == floor.
    * DuckDB-oracle twin for every branch: `CAST(floor(epoch(ts)) AS
    * BIGINT)`. */
  def tsSec(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => expr("ts div 1000000000")
    case TimestampType    => expr("unix_micros(ts) div 1000000")
    case TimestampNTZType => expr("unix_micros(cast(ts as timestamp)) div 1000000")
    case other => throw new IllegalArgumentException(
      s"events.ts: unsupported physical type $other — expected " +
        "TIMESTAMP, TIMESTAMP_NTZ, or nanosecond BIGINT")
  }

  /** `ts` as a NATIVE TimestampNTZ column (for date_trunc-style
    * timestamp semantics, vs [[tsSec]]'s integer seconds), adaptive
    * to the same three encodings. The canonical type is NTZ because
    * that is what a naive-timestamp parquet column decodes to; the
    * session's pinned UTC makes the TZ→NTZ cast wall-clock exact, and
    * the NANOS long truncates to micros. NOTE the truncation is a
    * REAL precision loss for consumers that output or order on the
    * full timestamp (q36/q37 do — their oracles mirror the
    * truncation with `date_trunc('microseconds', ...)`); consumers at
    * second granularity or coarser never observe it. */
  def tsNative(df: DataFrame): Column = df.schema("ts").dataType match {
    case TimestampNTZType => col("ts")
    case TimestampType    => expr("cast(ts as timestamp_ntz)")
    case LongType         => expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
    case other => throw new IllegalArgumentException(
      s"events.ts: unsupported physical type $other — expected " +
        "TIMESTAMP, TIMESTAMP_NTZ, or nanosecond BIGINT")
  }

  /** Register all tables as temp views so operators can use spark.sql. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Event-time columns admit every encoding [[tsSec]] (or a plain
    * Spark comparison against a timestamp literal) adapts to; all
    * other columns pin one canonical dtype. Spark `simpleString`s. */
  private val tsLike = Set("timestamp", "timestamp_ntz", "bigint")

  /** Input schema contract: table → (column → acceptable dtypes).
    *
    * The round-7 lesson: one silent upstream re-encode of `events.ts`
    * (NANOS→MICROS) surfaced as 13 scattered analysis failures. The
    * contract turns the next such drift into ONE diagnostic naming
    * the table, column, and offending type. */
  val contract: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> (tsLike - "bigint"), "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> (tsLike - "bigint")),
    "events" -> Seq("event_id" -> Set("bigint"), "ts" -> tsLike,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  /** Diff an SF directory against [[contract]]; one line per drift,
    * e.g. `events.ts: expected one of [bigint, timestamp,
    * timestamp_ntz], got double`. Empty = conforming. Footer-only
    * (reads each parquet schema, scans nothing), so calling it at
    * every session start is free even at 100 TB. */
  def checkContract(spark: SparkSession, dir: String): Seq[String] =
    contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      scala.util.Try(load(spark, dir, table).schema).fold(
        e => Seq(s"$table: unreadable (${e.getMessage})"),
        schema => {
          val actual = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
          cols.flatMap { case (name, ok) =>
            actual.get(name) match {
              case None => Some(s"$table.$name: expected one of " +
                s"[${ok.toSeq.sorted.mkString(", ")}], column MISSING")
              case Some(t) if !ok(t) => Some(s"$table.$name: expected one of " +
                s"[${ok.toSeq.sorted.mkString(", ")}], got $t")
              case _ => None
            }
          }
        })
    }
}
