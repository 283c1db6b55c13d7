package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Columnar lake writer — the "S3 Parquet/ORC write" target side of
  * the north star. Partition layout + bounded file sizes are the two
  * levers that keep a 100 TB table scannable:
  *
  *  - `partitionBy` cols become directory partitions → partition
  *    pruning turns `WHERE dt = ...` into a directory listing, no scan
  *  - `maxRecordsPerFile` bounds file size so no executor ever
  *    shoulders a multi-GB file, and readers parallelize evenly
  *  - callers repartition on the partition columns first so each
  *    partition directory is written by few tasks (no small-file storm:
  *    without it, every task writes a sliver into every partition)
  */
object LakeSink {

  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1000000L): Unit =
    write(df, path, "parquet", partitionCols, maxRecordsPerFile)

  def writeOrc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1000000L): Unit =
    write(df, path, "orc", partitionCols, maxRecordsPerFile)

  private def write(df: DataFrame, path: String, format: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long): Unit = {
    val repartitioned =
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df
    val w = repartitioned.write.format(format)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .save(path)
  }

  def read(spark: SparkSession, path: String, format: String): DataFrame =
    spark.read.format(format).load(path)
}
