package graft

import graft.operators.Migration
import graft.sources.{BlobSink, Jdbc}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end reference fidelity: RDBMS (embedded Derby) with a BLOB
  * column → partitioned JDBC extraction → blob objects on the store +
  * pointer table — the reference's entire migration
  * (reference README "Target Architecture", lambda_fns/sql_schema/
  * order_rdbms_blob.sql). */
class MigrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dbDir = Files.createTempDirectory("graft_derby").toString
  private lazy val url = s"jdbc:derby:$dbDir/blobdb;create=true"

  private def seedDerby(): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE orders_rdbms_blob (
             order_id BIGINT NOT NULL PRIMARY KEY,
             description VARCHAR(30) NOT NULL,
             order_blob BLOB NOT NULL)""")
      val ps = conn.prepareStatement(
        "INSERT INTO orders_rdbms_blob VALUES (?, ?, ?)")
      (0 until 100).foreach { i =>
        ps.setLong(1, i.toLong)
        ps.setString(2, s"order-$i")
        ps.setBytes(3, s"blob-payload-$i-${"x" * (i % 37)}".getBytes("UTF-8"))
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  test("partitioned JDBC read of a BLOB table (reference source side)") {
    seedDerby()
    val df = Jdbc.read(spark, url, "orders_rdbms_blob",
      partitionColumn = "order_id", lowerBound = 0, upperBound = 100,
      numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    val row = df.filter(col("ORDER_ID") === 7).collect().head
    assert(new String(row.getAs[Array[Byte]]("ORDER_BLOB"), "UTF-8")
      .startsWith("blob-payload-7"))
  }

  test("migrate: blobs out to store, pointer table rewritten, linkage validates") {
    val store = Files.createTempDirectory("graft_store").toString
    val ptr = Files.createTempDirectory("graft_ptr").toString + "/pointers"
    val src = Jdbc.read(spark, url, "orders_rdbms_blob",
      "order_id", 0, 100, 4)
    val (written, pointers) = Migration.migrate(src,
      col("ORDER_ID"), col("DESCRIPTION"), col("ORDER_BLOB"), store, ptr)
    assert(written == 100)
    assert(pointers.count() == 100)
    // every pointer resolves to a real object of the recorded size
    val inv = BlobSink.inventory(spark, store)
      .withColumnRenamed("nbytes", "obj_bytes")
    assert(inv.count() == 100)
    val joined = pointers.join(inv, col("s3_prefix") === col("object_key"))
    assert(joined.count() == 100)
    assert(joined.filter(col("nbytes") =!= col("obj_bytes")).count() == 0)
  }

  test("string varchar(120) primary keys work through JDBC CRUD (reference schema)") {
    // the reference's order_id IS varchar(120) (sql_schema/order.sql:3)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE orders_str (
             order_id VARCHAR(120) NOT NULL PRIMARY KEY,
             description VARCHAR(30) NOT NULL)""")
      val ps = conn.prepareStatement("INSERT INTO orders_str VALUES (?, ?)")
      (0 until 30).foreach { i =>
        ps.setString(1, f"ord-$i%05d"); ps.setString(2, s"d$i"); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
    val df = Jdbc.readOne(spark, url, "orders_str")
    // point lookup by string key
    val one = Migration.pointLookup(df, "ORDER_ID", "ord-00007").collect()
    assert(one.length == 1 && one.head.getString(1) == "d7")
    // keyset pagination on the varchar key: zero-padded → ordered
    val page = Migration.pageAfter(df, "ORDER_ID",
      Seq("ORDER_ID"), "ord-00009", 5).collect().map(_.getString(0))
    assert(page.toSeq == (10 until 15).map(i => f"ord-$i%05d"))
    // the string predicate is pushed into the JDBC source, not
    // filtered in Spark after a full table read
    val p = Migration.pointLookup(df, "ORDER_ID", "ord-00007")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("EqualTo(ORDER_ID,ord-00007)"),
      p.take(1200))
  }

  test("reconcile finds planted orphan objects and dangling pointers") {
    val store = Files.createTempDirectory("graft_rec").toString
    val staged = spark.range(10).select(
      concat(lit("blobs/x/"), col("id")).as("s3_prefix"),
      col("id").cast("string").cast("binary").as("payload"))
    assert(BlobSink.write(staged, store, "s3_prefix", "payload") == 10)
    // pointers: drop object 3's row (→ 3 is an orphan object) and add
    // a pointer to an object that was never written (→ dangling)
    val pointers = spark.range(10).filter(col("id") =!= 3)
      .select(concat(lit("blobs/x/"), col("id")).as("s3_prefix"))
      .union(spark.sql("SELECT 'blobs/x/ghost' AS s3_prefix"))
    val rec = Migration.reconcile(pointers, "s3_prefix",
      BlobSink.inventory(spark, store), "object_key").collect()
    assert(rec.length == 2)
    val byStatus = rec.map(r => r.getString(1) -> r.getString(0)).toMap
    assert(byStatus("orphan_object") == "blobs/x/3")
    assert(byStatus("dangling_pointer") == "blobs/x/ghost")
  }

  test("gcOrphans deletes exactly the unpointed objects, idempotently; mass-delete guarded") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_gc").toString
    val rows = (1L to 10L)
      .map(i => (i, s"blobs/$i/h$i", s"payload-$i".getBytes("UTF-8")))
      .toDF("id", "s3_prefix", "blob")
    assert(BlobSink.write(rows, base, "s3_prefix", "blob") == 10L)
    // pointers cover 8 of the 10 objects → 2 orphans
    val pointers = rows.filter(col("id") <= 8).select("s3_prefix")
    val (scanned, deleted) = BlobSink.gcOrphans(spark, base, pointers, "s3_prefix")
    assert(scanned == 10L && deleted == 2L)
    val left = BlobSink.inventory(spark, base)
    assert(left.count() == 8)
    assert(left.filter(col("object_key").contains("/9/") ||
      col("object_key").contains("/10/")).count() == 0,
      "exactly the unpointed objects must be gone")
    // idempotent re-run: nothing left to collect
    val (s2, d2) = BlobSink.gcOrphans(spark, base, pointers, "s3_prefix")
    assert(s2 == 8L && d2 == 0L)
    // a stale/empty pointer table must refuse BY NAME, not delete the store
    val err = intercept[IllegalArgumentException] {
      BlobSink.gcOrphans(spark, base, pointers.limit(0), "s3_prefix")
    }
    assert(err.getMessage.contains("ORPHAN GC REFUSED"))
    assert(BlobSink.inventory(spark, base).count() == 8,
      "the refused run must not have deleted anything")
  }

  test("gcOrphans grace window: a young unpointed object (in-flight writer) survives") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_gc_grace").toString
    val rows = (1L to 6L)
      .map(i => (i, s"blobs/$i/h$i", s"payload-$i".getBytes("UTF-8")))
      .toDF("id", "s3_prefix", "blob")
    assert(BlobSink.write(rows, base, "s3_prefix", "blob") == 6L)
    // pointers cover 4 of 6 → orphans are 5 (aged) and 6 (just written)
    val pointers = rows.filter(col("id") <= 4).select("s3_prefix")
    // age objects 1..5 past the grace window; object 6 keeps its
    // fresh mtime (the in-flight write whose pointer isn't visible yet)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1L to 5L).foreach(i =>
      fs.setTimes(new org.apache.hadoop.fs.Path(s"$base/blobs/$i/h$i"),
        System.currentTimeMillis() - 7200000L, -1))
    val (scanned, deleted) = BlobSink.gcOrphans(spark, base, pointers,
      "s3_prefix", graceMs = 3600000L)
    assert(scanned == 6L && deleted == 1L,
      "only the grace-aged orphan is collectable")
    val left = BlobSink.inventory(spark, base)
    assert(left.count() == 5)
    assert(left.filter(col("object_key") === "blobs/5/h5").count() == 0,
      "the aged orphan must be gone")
    assert(left.filter(col("object_key") === "blobs/6/h6").count() == 1,
      "the in-flight-young orphan must survive the grace window")
    // guard denominator excludes young objects: age ALL objects, wipe
    // the pointers — now every eligible object is orphaned → refusal
    (1L to 6L).filterNot(_ == 5L).foreach(i =>
      fs.setTimes(new org.apache.hadoop.fs.Path(s"$base/blobs/$i/h$i"),
        System.currentTimeMillis() - 7200000L, -1))
    val err = intercept[IllegalArgumentException] {
      BlobSink.gcOrphans(spark, base, pointers.limit(0), "s3_prefix",
        graceMs = 3600000L)
    }
    assert(err.getMessage.contains("ORPHAN GC REFUSED"))
  }

  test("bridgeRead serves migrated rows from the pointer and the rest from the blob") {
    val legacy = spark.range(6).select(col("id").as("k"),
      concat(lit("payload-"), col("id")).cast("binary").as("b"))
    val pointers = spark.range(6).filter(col("id") % 2 === 0)
      .select(col("id").as("pk"), concat(lit("blobs/"), col("id")).as("pfx"))
    val served = Migration.bridgeRead(legacy, "k", "b", pointers, "pk", "pfx")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(served.size == 6)
    (0L until 6L).foreach { i =>
      if (i % 2 == 0) assert(served(i) == ("s3", s"blobs/$i"))
      else { assert(served(i)._1 == "db" && served(i)._2.startsWith("db://")) }
    }
  }

  test("replaceBlobs: new objects land, pointers merge, superseded objects GC — not dangle") {
    import spark.implicits._
    // the reference's UPDATE order_blob lifecycle (order.js:675) end
    // to end: migrate → replace 5 payloads → merged pointers resolve
    // to the NEW objects while the old ones await GC → gcOrphans
    // collects exactly the superseded set
    val store = Files.createTempDirectory("graft_upd").toString
    val ptr = Files.createTempDirectory("graft_updp").toString + "/p"
    val src = (1L to 20L)
      .map(i => (i, "docs", s"payload-$i".getBytes("UTF-8")))
      .toDF("rid", "src", "blob")
    val (w0, pointers) = Migration.migrate(src,
      col("rid"), col("src"), col("blob"), store, ptr)
    assert(w0 == 20)
    val updates = (1L to 5L)
      .map(i => (i, "docs", s"payload-$i-v2".getBytes("UTF-8")))
      .toDF("rid", "src", "blob")
    val (w1, merged, superseded) = Migration.replaceBlobs(pointers,
      updates, col("rid"), col("src"), col("blob"), store)
    assert(w1 == 5)
    assert(superseded.count() == 5, "5 old objects are superseded")
    assert(merged.count() == 20, "merge must not change cardinality")
    // every merged pointer resolves to a live object of matching size
    val inv = BlobSink.inventory(spark, store)
      .withColumnRenamed("nbytes", "obj_bytes")
    assert(inv.count() == 25, "old objects must still exist pre-GC " +
      "(in-flight readers of the old snapshot)")
    val resolved = merged.join(inv, col("s3_prefix") === col("object_key"))
    assert(resolved.count() == 20)
    assert(resolved.filter(col("nbytes") =!= col("obj_bytes")).count() == 0)
    // updated rows carry the NEW content hash
    val p1 = merged.filter(col("record_id") === 1L).head.getString(2)
    val newHex = java.security.MessageDigest.getInstance("MD5")
      .digest("payload-1-v2".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(p1.endsWith(newHex), p1)
    // GC under the merged pointer table collects EXACTLY the
    // superseded objects (grace 0: no concurrent writer here)
    val (scanned, deleted) = BlobSink.gcOrphans(spark, store,
      merged, "s3_prefix")
    assert(scanned == 25 && deleted == 5)
    assert(BlobSink.inventory(spark, store).count() == 20)
    // idempotent-content update: replacing with IDENTICAL bytes
    // supersedes nothing (content-addressed prefix unchanged)
    val (w2, _, sup2) = Migration.replaceBlobs(merged,
      updates, col("rid"), col("src"), col("blob"), store)
    assert(w2 == 5 && sup2.count() == 0,
      "same-bytes replacement must supersede nothing")
  }

  test("replaceBlobs refuses NULL and duplicate update keys before any object lands") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_updr").toString
    val ptr = Files.createTempDirectory("graft_updrp").toString + "/p"
    val src = (1L to 10L)
      .map(i => (i, "docs", s"payload-$i".getBytes("UTF-8")))
      .toDF("rid", "src", "blob")
    val (_, pointers) = Migration.migrate(src,
      col("rid"), col("src"), col("blob"), store, ptr)
    val before = BlobSink.inventory(spark, store).count()
    // duplicate key: would flow through upsert into TWO pointer rows
    // for one record — the corruption mergeKeyed refuses by name
    val dup = Seq((1L, "docs", "a".getBytes("UTF-8")),
        (1L, "docs", "b".getBytes("UTF-8")))
      .toDF("rid", "src", "blob")
    val e1 = intercept[IllegalArgumentException] {
      Migration.replaceBlobs(pointers, dup,
        col("rid"), col("src"), col("blob"), store)
    }
    assert(e1.getMessage.contains("REPLACE REFUSED") &&
      e1.getMessage.contains("duplicate"))
    val nul = Seq((Option.empty[Long], "docs", "c".getBytes("UTF-8")))
      .toDF("rid", "src", "blob")
    val e2 = intercept[IllegalArgumentException] {
      Migration.replaceBlobs(pointers, nul,
        col("rid"), col("src"), col("blob"), store)
    }
    assert(e2.getMessage.contains("REPLACE REFUSED") &&
      e2.getMessage.contains("NULL"))
    assert(BlobSink.inventory(spark, store).count() == before,
      "refused replaces must land no object")
  }

  test("approx profile (a17): sketch n_distinct within 5% of exact; other columns equal") {
    val o = Tables.load(spark, TestSpark.sf, "orders")
    val cols = Seq(
      "o_orderkey" -> col("o_orderkey"),
      "o_custkey" -> col("o_custkey"),
      "o_orderstatus" -> col("o_orderstatus"),
      "o_orderpriority" -> col("o_orderpriority"),
      "o_orderdate" -> col("o_orderdate").cast("date"))
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r).toMap
    val exact = byCol(Migration.profileColumns(o, cols))
    val approx = byCol(Migration.profileColumns(o, cols,
      approxDistinct = true))
    assert(exact.keySet == approx.keySet)
    for ((name, e) <- exact) {
      val a = approx(name)
      // every non-sketch column is EXACT in both forms
      for (f <- Seq("n_rows", "n_null"))
        assert(a.getAs[Long](f) == e.getAs[Long](f), s"$name.$f")
      for (f <- Seq("min_s", "max_s"))
        assert(a.getAs[String](f) == e.getAs[String](f), s"$name.$f")
      val ed = e.getAs[Long]("n_distinct").toDouble
      val ad = a.getAs[Long]("n_distinct").toDouble
      // rsd=0.02 sketch, 3 sigma — the q27 bound
      assert(math.abs(ad - ed) <= 0.06 * ed,
        s"$name: approx distinct $ad vs exact $ed exceeds 6% (rsd 0.02, 3σ)")
    }
  }

  test("jdbc write-back of pointer table (reference target schema)") {
    val pointers = spark.range(5).select(
      col("id").as("order_id"),
      concat(lit("d-"), col("id")).as("description"),
      concat(lit("blobs/p/"), col("id")).as("s3_prefix"))
    Jdbc.write(pointers, url, "orders_pointer", SaveMode.Overwrite)
    val back = Jdbc.readOne(spark, url, "orders_pointer")
    assert(back.count() == 5)
  }

  test("upsert keeps update winners and base keepers") {
    val base = spark.range(10).select(col("id").as("k"), lit("old").as("v"))
    val upd = spark.range(3).select(col("id").as("k"), lit("new").as("v"))
    val merged = Migration.upsert(base, upd, "k")
    assert(merged.count() == 10)
    assert(merged.filter(col("v") === "new").count() == 3)
  }

  test("deleteWhere removes exactly the tombstoned keys") {
    val base = spark.range(10).select(col("id").as("k"))
    val tomb = spark.range(4).select(col("id").as("t"))
    assert(Migration.deleteWhere(base, "k", tomb, "t").count() == 6)
  }

  test("staged JDBC write: transactional swap, idempotent across re-runs") {
    import spark.implicits._
    val dbDir2 = Files.createTempDirectory("graft_derby3").toString
    val url2 = s"jdbc:derby:$dbDir2/staged;create=true"
    // target starts with two rows; the batch updates key 2, adds key 3
    Jdbc.write(Seq((1L, "old-1"), (2L, "old-2")).toDF("id", "descr"),
      url2, "pointer_target", SaveMode.Overwrite)
    val batch = Seq((2L, "new-2"), (3L, "new-3")).toDF("id", "descr")
    def state(): Set[(Long, String)] =
      Jdbc.readOne(spark, url2, "pointer_target")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    Jdbc.writeStaged(batch, url2, "pointer_target", "pointer_staging", "id")
    val after1 = state()
    assert(after1 == Set((1L, "old-1"), (2L, "new-2"), (3L, "new-3")),
      s"got $after1")
    // a RETRY of the same batch (failure-recovery path) must converge
    // to the identical state — no double inserts
    Jdbc.writeStaged(batch, url2, "pointer_target", "pointer_staging", "id")
    assert(state() == after1)
    // a NULL-key row can never be upserted idempotently (DELETE..IN
    // does not match NULL, so every retry would re-insert it): the
    // swap transaction must refuse it and leave the target untouched
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("descr",
        org.apache.spark.sql.types.StringType)))
    val nullBatch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(4L, "new-4"),
        org.apache.spark.sql.Row(null, "keyless"))),
      schema)
    val e = intercept[IllegalArgumentException] {
      Jdbc.writeStaged(nullBatch, url2, "pointer_target", "pointer_staging", "id")
    }
    assert(e.getMessage.contains("NULL"))
    assert(state() == after1, "refused batch must not touch the target")
  }

  test("keyset pagination pages without overlap") {
    val orders = Tables.load(spark, TestSpark.sf, "orders")
    val p1 = Migration.pageAfter(orders, "o_orderkey",
      Seq("o_orderkey"), after = -1, limit = 10).collect().map(_.getLong(0))
    val p2 = Migration.pageAfter(orders, "o_orderkey",
      Seq("o_orderkey"), after = p1.last, limit = 10).collect().map(_.getLong(0))
    assert(p1.length == 10 && p2.length == 10)
    assert(p1.toSet.intersect(p2.toSet).isEmpty)
    assert(p1.max < p2.min)
  }
}
