package graft

/** Dev profiling harness: run one query N times, print per-run wall
  * time (cold = plan+codegen+exec, warm ≈ exec only).
  * Usage: sbt "runMain graft.Profile q12_casewhen /root/testdata/sf0.001 3"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q12_casewhen").split(",").toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(16)

    // watchdog: if a query runs >8s, dump non-idle thread stacks once
    @volatile var inFlight: Option[(String, Long)] = None
    @volatile var dumped = false
    val watchdog = new Thread(() => {
      while (true) {
        Thread.sleep(2000)
        inFlight.foreach { case (nm, t0) =>
          if (!dumped && (System.nanoTime() - t0) / 1e9 > 8) {
            dumped = true
            println(s"[watchdog] $nm stalled; thread dump:")
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
              val s = st.take(12).map(_.toString)
              val interesting = s.exists(f => f.contains("spark") || f.contains("graft")) &&
                !s.headOption.exists(h => h.contains("Unsafe.park") || h.contains("Object.wait") ||
                  h.contains("epollWait") || h.contains("SocketDispatcher"))
              if (interesting)
                println(s"[watchdog]   ${t.getName} ${t.getState}\n" +
                  s.map("[watchdog]     " + _).mkString("\n"))
            }
          }
        }
      }
    })
    watchdog.setDaemon(true)
    watchdog.start()

    for (i <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      inFlight = Some((name, t0)); dumped = false
      // toRdd, not count(): count() lets pruning delete unused aggregate
      // expressions and profile a hollowed-out plan (see Bench.force)
      val n = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      inFlight = None
      println(f"[profile] $name run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
