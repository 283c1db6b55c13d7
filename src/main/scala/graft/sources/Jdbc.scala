package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Partitioned JDBC source/sink — the reference's RDBMS side
  * (reference lambda_fns/order_rdbms_blob.js connects to Aurora MySQL
  * via mysql2; reference lambda_fns/sql_schema/order_rdbms_blob.sql
  * defines the blob table).
  *
  * At 100 TB the extraction MUST be range-partitioned: `partitionColumn/
  * lowerBound/upperBound/numPartitions` splits the PK range into
  * parallel range-predicate scans (each executor issues
  * `WHERE key >= lo AND key < hi`), and `pushDownPredicate` (default
  * on) ships filters into the database. One unpartitioned JDBC read =
  * one connection = the whole migration funneled through a single
  * task — never do that.
  */
object Jdbc {

  def read(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .option("fetchsize", "1000")
      .options(options)
      .load()

  /** Single-partition read — only for tiny dimension/config tables. */
  def readOne(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table)
      .options(options).load()

  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Append,
      options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc").option("url", url).option("dbtable", table)
      .option("batchsize", "1000").options(options).mode(mode).save()
}
