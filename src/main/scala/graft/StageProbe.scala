package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Dev probe (NOT part of the library): runs one graded query N times
  * and prints every completed stage's wall-clock + first line of its
  * call site, so "which stage eats the time" is measured instead of
  * guessed. Usage: StageProbe <queryName> [reps]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q157_weighted_median"
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = Sessions.local("graft-stage-probe", Sessions.defaultCpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = ArrayBuffer.empty[(Int, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val dur = (for {s <- i.submissionTime; c <- i.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((i.stageId, dur, i.numTasks, i.name.linesIterator.next()))
        }
      }
    })
    for (r <- 1 to reps) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let async listener drain
      println(f"[stage] === $name run$r total $total%.2f s ===")
      stages.synchronized {
        stages.sortBy(_._1).foreach { case (id, dur, nt, nm) =>
          println(f"[stage] $id%4d ${dur / 1000.0}%7.2f s  tasks=$nt%4d  $nm")
        }
        val sum = stages.map(_._2).sum / 1000.0
        println(f"[stage] stage-time sum ${sum}%.2f s (wall $total%.2f)")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
