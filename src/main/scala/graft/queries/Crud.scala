package graft.queries

import graft.{Q, Tables}
import graft.operators.Migration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Analytics.{moneySum, termSum6}

/** SURVEY §2 A — the reference's CRUD/migration surface as
  * distributed batch operators (see [[graft.operators.Migration]]).
  */
object Crud {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val a1 = Q("a1_count", Some(
    "SELECT count(o_orderkey) AS n FROM orders")) { (s, d) =>
    Migration.countRecords(t(s, d, "orders"), "o_orderkey")
  }

  val a2 = Q("a2_page", Some("""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 40""")) { (s, d) =>
    Migration.pageOffset(t(s, d, "orders"), "o_orderkey",
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"), 20, 40)
  }

  val a3 = Q("a3_point_lookup", Some("""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(o_orderdate AS DATE) AS odate, o_orderpriority
    FROM orders WHERE o_orderkey = 42""")) { (s, d) =>
    Migration.pointLookup(t(s, d, "orders"), "o_orderkey", 42)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate").cast("date").as("odate"),
        col("o_orderpriority"))
  }

  val a4 = Q("a4_projection", Some("""
    SELECT doc_id, lang, source, n_chars FROM documents
    ORDER BY doc_id LIMIT 100""")) { (s, d) =>
    Migration.pageOffset(t(s, d, "documents"), "doc_id",
      Seq("doc_id", "lang", "source", "n_chars"), 100, 0)
  }

  val a5 = Q("a5_blob_fetch", Some("""
    SELECT doc_id, strlen(text) AS nbytes, md5(text) AS blob_md5
    FROM documents WHERE doc_id = 7""")) { (s, d) =>
    Migration.blobFetch(t(s, d, "documents"), "doc_id", "text", 7)
  }

  val a6 = Q("a6_externalize", Some("""
    SELECT doc_id AS record_id, source,
      concat_ws('/', 'blobs', source, doc_id, md5(text)) AS s3_prefix,
      strlen(text) AS nbytes
    FROM documents ORDER BY record_id""")) { (s, d) =>
    Migration.externalize(t(s, d, "documents"),
      col("doc_id"), col("source"), col("text"))
      .orderBy("record_id")
  }

  val a7 = Q("a7_delete", Some("""
    SELECT o_orderstatus, count(*) AS n,
      CAST(sum(CAST(floor((o_totalprice) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total
    FROM orders WHERE NOT EXISTS (
      SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderstatus ORDER BY o_orderstatus""")) { (s, d) =>
    val tombstones = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    Migration.deleteWhere(t(s, d, "orders"), "o_orderkey", tombstones, "l_orderkey")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")
  }

  val a8 = Q("a8_upsert", Some("""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice * 1.05 AS o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 0),
    merged AS (
      SELECT * FROM updates
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders o WHERE NOT EXISTS (
        SELECT 1 FROM updates u WHERE u.o_orderkey = o.o_orderkey))
    SELECT o_orderstatus, count(*) AS n,
      CAST(sum(CAST(floor((o_totalprice) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS total
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""")) { (s, d) =>
    val base = t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val updates = base.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") * 1.05)
    // 18,6 (not 18,2): updated rows carry the full-precision *1.05
    // product, so the per-row quantization grid must be fine enough
    // to be midpoint-free for derived doubles
    Migration.upsert(base, updates, "o_orderkey")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), termSum6(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")
  }

  /** keyset pagination — the 100 TB-safe form of a2 (OFFSET must
    * sort-and-skip the whole prefix; keyset is O(page) at any depth) */
  val a11 = Q("a11_keyset", Some("""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderkey > 40 ORDER BY o_orderkey LIMIT 20""")) { (s, d) =>
    Migration.pageAfter(t(s, d, "orders"), "o_orderkey",
      Seq("o_orderkey", "o_custkey", "o_totalprice"), 40, 20)
  }

  // int sums CAST AS BIGINT: DuckDB sum() yields HUGEINT, which
  // stringifies differently from Spark's LONG in the driver compare
  val a9 = Q("a9_validate", Some("""
    SELECT doc_id % 16 AS bucket, count(*) AS n,
      CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes,
      min(doc_id) AS min_id, max(doc_id) AS max_id,
      CAST(sum(instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1) AS BIGINT) AS checksum
    FROM documents GROUP BY bucket ORDER BY bucket""")) { (s, d) =>
    Migration.validate(t(s, d, "documents"), "doc_id", "text", 16)
      .orderBy("bucket")
  }

  val a10 = Q("a10_manifest", Some("""
    SELECT source, count(*) AS n_objects,
      CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
    FROM documents GROUP BY source ORDER BY source""")) { (s, d) =>
    Migration.manifest(Migration.externalize(t(s, d, "documents"),
      col("doc_id"), col("source"), col("text")))
      .orderBy("source")
  }

  val qs: Seq[Q] = Seq(a1, a2, a3, a4, a5, a6, a7, a8, a9, a10, a11)
}
