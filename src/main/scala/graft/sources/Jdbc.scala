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

  /** Idempotent staged upsert — the transactional pointer-rewrite
    * pattern (reference lambda_fns/order_rdbms_blob.js:574 rewrites
    * blob pointers in a transactional UPDATE; a distributed writer
    * needs the same exactly-once effect without distributed
    * transactions). Plain `write(Append)` is neither atomic nor
    * re-runnable: a retried batch double-inserts, a mid-write failure
    * leaves a partial batch visible.
    *
    * Two phases: (1) the executors bulk-write the batch to a STAGING
    * table (overwrite — re-running a failed attempt simply rewrites
    * it; nothing is visible in the target yet); (2) one driver-side
    * transaction swaps it in: `DELETE target WHERE key IN (staging
    * keys)` + `INSERT target SELECT FROM staging`, committed together.
    * Readers never see a partial batch (phase 2 is a single DB
    * transaction), and re-running the whole call after ANY failure
    * point converges to the same final state (delete-then-insert is
    * idempotent per key). The key set rides inside the database —
    * nothing is collected to Spark. */
  def writeStaged(df: DataFrame, url: String, table: String,
      stagingTable: String, keyCol: String,
      options: Map[String, String] = Map.empty): Unit = {
    write(df, url, stagingTable, SaveMode.Overwrite, options)
    // Spark's JDBC writer quotes column identifiers on CREATE (they
    // stay lowercase in the DB); unquoted references would be
    // case-folded by the database and miss them
    def q(c: String) = "\"" + c + "\""
    val cols = df.schema.fieldNames.map(q).mkString(", ")
    val key = q(keyCol)
    val props = new java.util.Properties()
    options.foreach { case (k, v) => props.put(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      // the idempotency contract rests on delete-then-insert matching
      // per key — a NULL key never matches `IN (...)`, so a re-run
      // would re-insert it forever. Refuse inside the same transaction
      // rather than silently converging to duplicates.
      val rs = st.executeQuery(
        s"SELECT COUNT(*) FROM $stagingTable WHERE $key IS NULL")
      rs.next()
      val nulls = rs.getLong(1)
      rs.close()
      require(nulls == 0,
        s"$nulls staged row(s) have NULL $key: a NULL key cannot be " +
          "upserted idempotently (DELETE..IN never matches NULL)")
      st.executeUpdate(
        s"DELETE FROM $table WHERE $key IN (SELECT $key FROM $stagingTable)")
      st.executeUpdate(
        s"INSERT INTO $table ($cols) SELECT $cols FROM $stagingTable")
      conn.commit()
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.close()
  }
}
