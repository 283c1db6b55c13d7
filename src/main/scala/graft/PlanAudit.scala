package graft

/** Dev diagnostic: dump `.explain("formatted")` for EVERY declared
  * query into an output directory (one file per query) so the plan
  * audit — exchange counts, join strategies, PushedFilters/ReadSchema,
  * cartesian products, global windows — can be grepped offline.
  * Plans are built (not executed), though operators that run
  * plan-time actions (advisors, ensure* fixture builds) still pay
  * those. Usage: sbt "runMain graft.PlanAudit <sfDir> <outDir> [names]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/tmp/plan_audit")
    val only = args.drop(2).toSet
    new java.io.File(out).mkdirs()
    val spark = GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$out/$name.txt"),
            plan.getBytes("UTF-8"))
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[audit] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
