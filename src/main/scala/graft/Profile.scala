package graft

/** Dev profiling harness: run one query N times, print per-run wall
  * time (cold = plan+codegen+exec, warm ≈ exec only).
  * Usage: sbt "runMain graft.Profile q12_casewhen /root/testdata/sf0.001 3"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q12_casewhen")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(16)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[profile] $name run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
