package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    // events.parquet carries TIMESTAMP(NANOS) which Spark refuses by
    // default; read it as a raw nanosecond LONG (queries floor it to
    // epoch seconds anyway, which is ns/µs-precision agnostic).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register all tables as temp views so operators can use spark.sql. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
