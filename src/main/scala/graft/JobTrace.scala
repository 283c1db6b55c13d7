package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev diagnostic: run one query and print its JOB timeline — job
  * count, per-job wall time, stage/task counts — so multi-stage
  * operators (iterative trainers, advisors, index probes) can be
  * attributed to scheduling latency vs real work without the UI.
  * Usage: sbt "runMain graft.JobTrace <name> <sfDir> [reps]"
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession.local(16)
    val jobs = mutable.Map[Int, (Long, String)]()
    val done = mutable.ArrayBuffer[(Int, Long, Long, Int)]() // id, t0, dur, nStages
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(j.jobId) = (j.time,
            Option(j.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse(""))
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(j.jobId).foreach { case (t0, _) =>
            done += ((j.jobId, t0, j.time - t0, 0))
          }
        }
    })
    for (i <- 1 to reps) {
      done.synchronized(done.clear())
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      val ds = done.synchronized(done.toSeq.sortBy(_._2))
      val busy = ds.map(_._3).sum / 1e3
      println(f"[trace] $name run$i rows=$n wall=$wall%.2fs jobs=${ds.size} jobtime=$busy%.2fs")
      if (i == reps) {
        val tMin = ds.headOption.map(_._2).getOrElse(0L)
        ds.foreach { case (id, t0j, dur, _) =>
          println(f"[trace]   job$id%-4d +${(t0j - tMin) / 1e3}%7.2fs dur=${dur / 1e3}%6.2fs")
        }
        // gaps between consecutive jobs = driver-side work
        val gaps = ds.sliding(2).collect {
          case Seq((_, a0, ad, _), (_, b0, _, _)) if b0 - (a0 + ad) > 50 =>
            (a0 + ad - tMin) / 1e3 -> (b0 - a0 - ad) / 1e3
        }.toSeq
        gaps.foreach { case (at, g) =>
          println(f"[trace]   gap  +$at%7.2fs ${g}%6.2fs (driver)")
        }
      }
    }
    spark.stop()
  }
}
