package graft

import graft.operators.Migration
import graft.sources.{BlobSink, Jdbc}
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** MIGRATE-WHILE-SERVING end to end — the reference's actual
  * operational story (reference sites/js/app_bridge.js + order.js dual
  * paths): a live RDBMS keeps taking writes DURING the snapshot
  * migration; a CDC tail (the streaming latest-per-key compaction)
  * tracks which records the snapshot no longer represents; the bridge
  * serves every record from exactly one correct side mid-flight; a
  * delta pass drains the tail; and the final reconciliation closes
  * with zero dangling pointers and exactly the superseded objects as
  * GC candidates.
  *
  * One scenario, five pinned states:
  *   1. snapshot-migrate 100 rows (blobs → store, pointer table)
  *   2. mutate the live source mid-flight: updates, deletes, inserts,
  *      including update-then-delete and update-twice chains
  *   3. CDC tail: the change feed through [[EventStreams.latestPerKey]]
  *      (multi-batch) compacts to the NET op per record
  *   4. mid-state bridge: stale pointers invalidated by the CDC keys —
  *      untouched rows serve s3, touched rows serve the LIVE db
  *      payload, deleted rows are gone
  *   5. drain + close: delta-migrate the net-upsert keys, rebuild the
  *      pointer table; bridge serves everything from s3; every pointer
  *      embeds the md5 of the CURRENT source payload; reconcile finds
  *      0 dangling pointers and exactly the 6 superseded objects
  */
class LiveMigrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dbDir = Files.createTempDirectory("graft_live_derby").toString
  private lazy val url = s"jdbc:derby:$dbDir/livedb;create=true"
  private val N = 100

  private def exec(sqls: String*): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try sqls.foreach(conn.createStatement().execute) finally conn.close()
  }

  private def payload(i: Long, v: Int = 0): Array[Byte] =
    (if (v == 0) s"live-blob-$i-${"x" * (i % 23).toInt}"
     else s"live-blob-$i-v$v").getBytes("UTF-8")

  private def seed(): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE live_orders (
             order_id BIGINT NOT NULL PRIMARY KEY,
             description VARCHAR(30) NOT NULL,
             order_blob BLOB NOT NULL)""")
      val ps = conn.prepareStatement("INSERT INTO live_orders VALUES (?, ?, ?)")
      (0 until N).foreach { i =>
        ps.setLong(1, i.toLong); ps.setString(2, s"src-${i % 3}")
        ps.setBytes(3, payload(i.toLong)); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  private def upd(id: Long, v: Int): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(
        "UPDATE live_orders SET order_blob = ? WHERE order_id = ?")
      ps.setBytes(1, payload(id, v)); ps.setLong(2, id); ps.executeUpdate()
    } finally conn.close()
  }

  private def ins(id: Long): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement("INSERT INTO live_orders VALUES (?, ?, ?)")
      ps.setLong(1, id); ps.setString(2, s"src-${id % 3}")
      ps.setBytes(3, payload(id)); ps.executeUpdate()
    } finally conn.close()
  }

  private def readSrc(): DataFrame =
    Jdbc.read(spark, url, "live_orders", "order_id", 0, 200, 4)

  // CDC ops ride the Event schema (the log-compaction machinery is
  // op-agnostic): user_id = record id, value = op (1 upsert, 2 delete),
  // event_id = change sequence number, event_type constant
  private val UPSERT = 1.0
  private val DELETE = 2.0
  private def chg(seq: Long, id: Long, op: Double): Event =
    Event(seq, new java.sql.Timestamp(1700000000000L + seq * 1000), id, "op", op)

  test("live migration: snapshot, mid-flight mutations, CDC-aware bridge, drained close") {
    seed()
    val store = Files.createTempDirectory("graft_live_store").toString
    val ptrDir = Files.createTempDirectory("graft_live_ptr").toString

    // ---- 1. snapshot migration while the source is "serving" -------
    val (written, snapPtr) = Migration.migrate(readSrc(),
      col("ORDER_ID"), col("DESCRIPTION"), col("ORDER_BLOB"),
      store, s"$ptrDir/snap")
    assert(written == N && snapPtr.count() == N)

    // ---- 2. the source keeps moving: updates/deletes/inserts -------
    upd(10, 1); upd(20, 1)                     // plain updates
    exec("DELETE FROM live_orders WHERE order_id = 30",
         "DELETE FROM live_orders WHERE order_id = 40")
    upd(50, 1); exec("DELETE FROM live_orders WHERE order_id = 50") // u→d chain
    upd(60, 1); upd(60, 2)                     // u→u chain
    ins(100); ins(101)                         // inserts
    val feed = Seq(
      chg(1, 10, UPSERT), chg(2, 20, UPSERT), chg(3, 30, DELETE),
      chg(4, 40, DELETE), chg(5, 50, UPSERT), chg(6, 50, DELETE),
      chg(7, 60, UPSERT), chg(8, 60, UPSERT), chg(9, 100, UPSERT),
      chg(10, 101, UPSERT))

    // ---- 3. CDC tail: stream-compact the feed to net ops ----------
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = EventStreams.latestPerKey(in.toDS()).toDF()
      .writeStream.format("memory").queryName("live_cdc")
      .outputMode(OutputMode.Update).start()
    feed.grouped(4).foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
    q.stop()
    val netOps = spark.sql("SELECT user_id, event_id, value FROM live_cdc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).values.map(_.maxBy(_._2)).map(t => t._1 -> t._3).toMap
    assert(netOps == Map(10L -> UPSERT, 20L -> UPSERT, 30L -> DELETE,
      40L -> DELETE, 50L -> DELETE, 60L -> UPSERT, 100L -> UPSERT,
      101L -> UPSERT), s"CDC compaction drifted: $netOps")
    val touched = netOps.keySet.toSeq.toDF("k")

    // ---- 4. mid-state: bridge with CDC-invalidated pointers --------
    // ANY net op invalidates the snapshot pointer (an updated blob's
    // pointer is stale; a deleted row's pointer must not serve)
    val validPtr = snapPtr.join(touched, col("record_id") === col("k"), "left_anti")
    val mid = Migration.bridgeRead(readSrc(), "ORDER_ID", "ORDER_BLOB",
      validPtr, "record_id", "s3_prefix").localCheckpoint(true)
    assert(mid.count() == N - 3 + 2, "deleted rows gone, inserts visible")
    val origins = mid.groupBy("origin").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(origins == Map("s3" -> 94L, "db" -> 5L),
      s"mid-state serving split drifted: $origins")
    assert(mid.filter(col("ORDER_ID").isin(10L, 20L, 60L, 100L, 101L) &&
      col("origin") =!= "db").count() == 0, "touched rows must serve LIVE db")
    // the bridge serves the CURRENT payload for an updated row — the
    // locator md5 must match the post-update bytes, not the snapshot
    val loc60 = mid.filter(col("ORDER_ID") === 60L).collect().head.getString(2)
    val md60 = java.security.MessageDigest.getInstance("MD5")
      .digest(payload(60, 2)).map("%02x".format(_)).mkString
    assert(loc60 == s"db://$md60", "updated row must serve its LIVE bytes")
    assert(mid.filter(col("ORDER_ID").isin(30L, 40L, 50L)).count() == 0)

    // ---- 5. drain the tail: delta-migrate net upserts, close -------
    val upsertKeys = netOps.filter(_._2 == UPSERT).keySet
    val (deltaWritten, deltaPtr) = Migration.migrate(
      readSrc().filter(col("ORDER_ID").isin(upsertKeys.toSeq: _*)),
      col("ORDER_ID"), col("DESCRIPTION"), col("ORDER_BLOB"),
      store, s"$ptrDir/delta")
    assert(deltaWritten == upsertKeys.size)
    val finalPtr = validPtr.unionByName(deltaPtr).localCheckpoint(true)
    assert(finalPtr.count() == 99)

    // fully migrated: the bridge serves EVERYTHING from s3
    val closed = Migration.bridgeRead(readSrc(), "ORDER_ID", "ORDER_BLOB",
      finalPtr, "record_id", "s3_prefix")
    assert(closed.filter(col("origin") =!= "s3").count() == 0)

    // every pointer embeds the md5 of the CURRENT source payload
    // (prefix = blobs/<source>/<id>/<md5>) — a stale pointer that
    // survived the CDC invalidation would fail here
    val srcMd5 = readSrc().select(col("ORDER_ID").as("record_id"),
      md5(col("ORDER_BLOB").cast("binary")).as("live_md5"))
    val mismatched = finalPtr
      .withColumn("ptr_md5", element_at(split(col("s3_prefix"), "/"), -1))
      .join(srcMd5, Seq("record_id"))
      .filter(col("ptr_md5") =!= col("live_md5"))
    assert(mismatched.count() == 0, "pointer/content divergence after drain")

    // reconciliation closes: no dangling pointers; orphan objects are
    // EXACTLY the 6 superseded snapshot blobs (originals of
    // 10/20/30/40/50/60) — the GC list, matching the reference's
    // delete-row-deletes-object lockstep (order.js deleteS3Asset)
    val rec = Migration.reconcile(finalPtr, "s3_prefix",
      BlobSink.inventory(spark, store), "object_key").localCheckpoint(true)
    assert(rec.filter(col("status") === "dangling_pointer").count() == 0)
    val orphans = rec.filter(col("status") === "orphan_object")
      .select(element_at(split(col("s3_prefix"), "/"), 3).cast("long").as("id"))
      .collect().map(_.getLong(0)).sorted
    assert(orphans.toSeq == Seq(10L, 20L, 30L, 40L, 50L, 60L),
      s"GC candidates must be exactly the superseded originals: ${orphans.toSeq}")

    // a9-style bucket validation between live source and pointer table
    // (count / bytes / key range per bucket) — the final "books match"
    val srcSide = readSrc().groupBy((col("ORDER_ID") % 16).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(octet_length(col("ORDER_BLOB"))).as("b"),
        min("ORDER_ID").as("lo"), max("ORDER_ID").as("hi"))
    val ptrSide = finalPtr.groupBy((col("record_id") % 16).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("nbytes")).as("b"),
        min("record_id").as("lo"), max("record_id").as("hi"))
    assert(srcSide.exceptAll(ptrSide).count() == 0 &&
      ptrSide.exceptAll(srcSide).count() == 0,
      "per-bucket validation must close after the drain")
  }
}
