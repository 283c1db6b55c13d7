package graft

/** Quick smoke: the driver's t1 check (entry rows > 0) plus a named
  * query + its formatted plan. Usage:
  *   sbt "runMain graft.Smoke [queryName] [sfDir]"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n ${if (n > 0) "OK" else "EMPTY!"}")
    args.headOption.foreach { name =>
      val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
      val df = SparkEntry.queries(name)(spark, dir)
      df.show(5, false)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
