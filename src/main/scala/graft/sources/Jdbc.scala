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

  /** Incremental extraction: only rows past the last high-water mark.
    * The predicate ships into the database (JDBC pushdown), so each
    * sync reads only the delta — the steady-state mode of a live
    * migration (reference: dual-serving during the migration phase
    * requires continuous sync, README "How to serve data from old
    * services and new services"). */
  def readIncremental(spark: SparkSession, url: String, table: String,
      watermarkCol: String, lastMark: Long,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, options: Map[String, String] = Map.empty): DataFrame =
    read(spark, url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, options)
      .filter(org.apache.spark.sql.functions.col(watermarkCol) > lastMark)

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
