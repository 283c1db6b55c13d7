package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a Spark implementation plus (when
  * SQL-expressible) an ANSI/DuckDB oracle over the same parquet
  * tables. The driver's correctness gate hash-compares the two.
  */
final case class Q(name: String, oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

object Registry {
  lazy val all: Seq[Q] =
    queries.Analytics.qs ++ queries.Crud.qs ++ queries.Text.qs ++
      queries.Dedup.qs ++ queries.Embed.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
