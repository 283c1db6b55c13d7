package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL DML routed to the merge-on-read log
  * ([[graft.plans.GraftSqlParser]] / [[graft.plans.GraftDml]]):
  * semantics, refusals, and the effect-row contract. */
class DmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.delete(); d.getPath
  }

  private def mkTable(prefix: String): String = {
    val dir = freshDir(prefix)
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
        (4L, "d", 40.0), (5L, "e", 50.0))
      .toDF("id", "name", "price").repartition(2)
      .write.parquet(dir)
    graft.sources.LakeSink.registerKeyDir(spark, dir, "id")
    dir
  }

  test("UPDATE: assignments evaluate against the OLD row, land as one log batch") {
    val dir = mkTable("dmlu")
    val r = spark.sql(
      s"UPDATE parquet.`$dir` SET price = price * 2, name = concat(name, '!') " +
        "WHERE id <= 2").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq(("update", 2L, 0L)))
    val v = graft.sources.LakeSink.morReadUpsertDir(spark, dir, "id")
      .orderBy("id").collect()
    assert(v.map(_.getDouble(2)).toSeq == Seq(20.0, 40.0, 30.0, 40.0, 50.0))
    assert(v.map(_.getString(1)).toSeq == Seq("a!", "b!", "c", "d", "e"))
    // base data files untouched — the update is log-only
    assert(spark.read.parquet(dir).count() == 5)
  }

  test("UPDATE: simultaneous assignment semantics (SET a = b, b = a swaps)") {
    val dir = freshDir("dmlswap")
    Seq((1L, 100.0, 200.0)).toDF("id", "x", "y").write.parquet(dir)
    graft.sources.LakeSink.registerKeyDir(spark, dir, "id")
    spark.sql(s"UPDATE parquet.`$dir` SET x = y, y = x")
    val r = graft.sources.LakeSink.morReadUpsertDir(spark, dir, "id").head()
    assert(r.getDouble(1) == 200.0 && r.getDouble(2) == 100.0)
  }

  test("DELETE: predicate resolves to keys, lands tombstones, view hides them") {
    val dir = mkTable("dmld")
    val r = spark.sql(s"DELETE FROM parquet.`$dir` WHERE price >= 40.0")
      .collect()
    assert(r.head.getLong(3) == 2L)
    assert(graft.sources.LakeSink.morReadUpsertDir(spark, dir, "id")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // an empty-match DELETE lands nothing (no pointless batch)
    val r2 = spark.sql(s"DELETE FROM parquet.`$dir` WHERE price > 999.0")
      .collect()
    assert(r2.head.getLong(3) == 0L)
  }

  test("MERGE: matched keys full-row replace, unmatched insert") {
    val dir = mkTable("dmlm")
    Seq((2L, "B2", 22.0), (9L, "i", 90.0)).toDF("id", "name", "price")
      .createOrReplaceTempView("dml_merge_src")
    val r = spark.sql(s"MERGE INTO parquet.`$dir` AS t USING dml_merge_src AS s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *").collect()
    assert(r.head.getLong(1) == 1L && r.head.getLong(2) == 1L)
    val v = graft.sources.LakeSink.morReadUpsertDir(spark, dir, "id")
      .orderBy("id").collect()
    assert(v.length == 6)
    assert(v(1).getString(1) == "B2" && v(5).getLong(0) == 9L)
  }

  test("DML statements compose: UPDATE then MERGE then DELETE, latest wins") {
    val dir = mkTable("dmlc")
    spark.sql(s"UPDATE parquet.`$dir` SET name = 'U' WHERE id = 1")
    Seq((1L, "M", 11.0)).toDF("id", "name", "price")
      .createOrReplaceTempView("dml_c_src")
    spark.sql(s"MERGE INTO parquet.`$dir` USING dml_c_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    spark.sql(s"DELETE FROM parquet.`$dir` WHERE id = 2")
    val v = graft.sources.LakeSink.morReadUpsertDir(spark, dir, "id")
      .orderBy("id").collect()
    assert(v.map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L, 5L))
    assert(v(0).getString(1) == "M" && v(0).getDouble(2) == 11.0)
  }

  test("MERGE with WHEN MATCHED AND cond THEN DELETE: the CDC-apply statement — D-rows tombstone, the rest upsert") {
    val dir = mkTable("dmlcdc")
    // a Debezium-shaped change batch: op column drives the clauses
    Seq((2L, "b2", 22.0, "U"), (3L, "c", 30.0, "D"),
        (9L, "i", 90.0, "I"), (11L, "x", 1.0, "D"))
      .toDF("id", "name", "price", "op")
      .createOrReplaceTempView("dml_cdc_src")
    val r = spark.sql("MERGE INTO parquet.`" + dir + "` AS t USING " +
      "(SELECT id, name, price, op FROM dml_cdc_src) s ON t.id = s.id " +
      "WHEN MATCHED AND s.op = 'D' THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *").collect().head
    // id 2 updates; id 3 (matched, op D) deletes; id 9 inserts;
    // id 11 (op D but NOT matched) falls through to INSERT —
    // standard MERGE clause semantics (Delta's too)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 2L, 1L)))
    val v = graft.sources.LakeSink.morReadUpsertDir(spark, dir, "id")
    assert(v.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L, 5L, 9L, 11L))
    assert(v.filter(col("id") === 2L).head().getString(1) == "b2")
  }

  test("refusal: no registered key names every registration route") {
    val dir = freshDir("dmlnokey")
    Seq((1L, "a")).toDF("id", "name").write.parquet(dir)
    val e = intercept[IllegalStateException] {
      spark.sql(s"DELETE FROM parquet.`$dir` WHERE id = 1")
    }
    assert(e.getMessage.contains("no key registered"))
    assert(e.getMessage.contains("graft.key"))
  }

  test("refusal: UPDATE of the key column, and unknown SET columns") {
    val dir = mkTable("dmlkey")
    val e1 = intercept[IllegalArgumentException] {
      spark.sql(s"UPDATE parquet.`$dir` SET id = id + 1")
    }
    assert(e1.getMessage.contains("key column"))
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"UPDATE parquet.`$dir` SET nope = 1")
    }
    assert(e2.getMessage.contains("unknown columns"))
  }

  test("refusal: unsupported MERGE shapes name mergeKeyed, not a silent fallthrough") {
    val e = intercept[UnsupportedOperationException] {
      spark.sql("MERGE INTO t USING s ON t.k = s.k " +
        "WHEN MATCHED AND t.x > 1 THEN DELETE")
    }
    assert(e.getMessage.contains("mergeKeyed"))
    // ON condition not on the registered key refuses too
    val dir = mkTable("dmlon")
    Seq((1L, "a", 1.0)).toDF("id", "name", "price")
      .createOrReplaceTempView("dml_on_src")
    val e2 = intercept[Exception] {
      spark.sql(s"MERGE INTO parquet.`$dir` t USING dml_on_src s " +
        "ON t.name = s.name WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e2.getMessage.contains("MERGE REFUSED"))
  }

  test("catalog tables: key from graft.key TBLPROPERTIES; log-free DELETE publishes a snapshot") {
    val dir = freshDir("dmlcat")
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "price").write.parquet(dir)
    spark.sql("DROP TABLE IF EXISTS dml_cat")
    graft.sources.LakeSink.registerExternal(spark, "dml_cat", dir,
      key = "id", format = "parquet")
    spark.sql("DELETE FROM dml_cat WHERE id = 2")
    assert(graft.sources.LakeSink.readMor(spark, "dml_cat", "id")
      .count() == 2)
    // the delete published a time-travel-visible snapshot generation
    assert(graft.sources.LakeSink.listGenerations(spark, "dml_cat")
      .size >= 2)
    // UPDATE on the catalog table lands in the live generation's log
    spark.sql("UPDATE dml_cat SET price = 99.0 WHERE id = 1")
    val v = graft.sources.LakeSink.morReadUpsertDir(spark,
      graft.sources.LakeSink.tableLocation(spark, "dml_cat"), "id")
    assert(v.filter(col("id") === 1).head().getDouble(2) == 99.0)
    spark.sql("DROP TABLE IF EXISTS dml_cat")
  }

  test("DML composes with the planner: under morApply the predicate scan is a single-root read the prune rules can skip files on; semantics identical either way") {
    val dir = freshDir("dmlprune")
    // key-clustered table with a committed bloom manifest
    spark.range(8000L).select(col("id"),
        concat(lit("n"), col("id")).as("name"), lit(1.0).as("price"))
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
      .write.parquet(dir)
    graft.sources.LakeSink.attachBlooms(spark, dir, "id")
    graft.sources.LakeSink.registerKeyDir(spark, dir, "id")
    spark.conf.set("spark.graft.morApply.enabled", "true")
    spark.conf.set("spark.graft.bloomPrune.enabled", "true")
    try {
      // point UPDATE: lands exactly one row's batch; the view read is
      // single-root so the bloom rule can decide files at plan time
      val r = spark.sql(
        s"UPDATE parquet.`$dir` SET price = 9.0 WHERE id = 4242").collect()
      assert(r.head.getLong(1) == 1L)
      // point DELETE through the same composition
      val r2 = spark.sql(
        s"DELETE FROM parquet.`$dir` WHERE id = 17").collect()
      assert(r2.head.getLong(3) == 1L)
      val v = graft.sources.LakeSink.morReadUpsertDir(spark, dir, "id")
      assert(v.filter(col("id") === 4242L).head().getDouble(2) == 9.0)
      assert(v.filter(col("id") === 17L).count() == 0)
      assert(v.count() == 7999L)
    } finally {
      spark.conf.unset("spark.graft.morApply.enabled")
      spark.conf.unset("spark.graft.bloomPrune.enabled")
    }
  }

  test("concurrent SQL DML: two writers race statements — the log claim serializes, losers refuse and retry, history converges") {
    val dir = mkTable("dmlrace")
    def issueWithRetry(sql: String): Unit = {
      var done = false; var tries = 0
      while (!done && tries < 200) {
        try { spark.sql(sql).collect(); done = true }
        catch { case _: java.util.ConcurrentModificationException =>
          tries += 1; Thread.sleep(20) }
      }
      assert(done, s"statement never landed after $tries retries: $sql")
    }
    val threads = (0 until 2).map { tid =>
      new Thread(() => (0 until 3).foreach { i =>
        issueWithRetry(s"UPDATE parquet.`$dir` SET price = price + 1.0 " +
          s"WHERE id = ${tid + 1}")
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // six single-row statements landed as six uniquely-sequenced
    // batches; each key's price reflects exactly ITS three updates
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val seqs = fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$dir/_updates", "u-*")).toSeq
      .map(_.getPath.getName.split("-")(1).toLong)
    assert(seqs.size == 6 && seqs.distinct.size == 6, s"seqs: $seqs")
    val v = graft.sources.LakeSink.morReadUpsertDir(spark, dir, "id")
      .filter(col("id") <= 2L).orderBy("id").collect()
    assert(v.map(_.getDouble(2)).toSeq == Seq(13.0, 23.0),
      "each key's three increments must all stick — no lost update")
  }

  test("everything else delegates: SELECT/CREATE/EXPLAIN parse untouched") {
    assert(spark.sql("SELECT 1 AS x").head().getInt(0) == 1)
    assert(spark.sql("SELECT 'UPDATE t SET x = 1' AS s").head()
      .getString(0).startsWith("UPDATE"))
  }

  test("non-key MERGE ON extraction refuses non-matching column names") {
    val ok = graft.plans.GraftDml.splitAssignments("a = 1, b = greatest(c, d)")
    assert(ok.contains(Seq("a" -> "1", "b" -> "greatest(c, d)")))
    assert(graft.plans.GraftDml.splitAssignments("a = 'x,y', b = 2")
      .contains(Seq("a" -> "'x,y'", "b" -> "2")))
  }
}
