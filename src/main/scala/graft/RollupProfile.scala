package graft

import graft.spark.Sessions
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Stage-level profiler for the exact bench job: registers a listener
  * and prints every completed stage's wall duration, task count, and
  * summed task time — the direct way to find stages that serialize the
  * pipeline (1-task stages, skewed stages, barriers).
  */
object RollupProfile {

  def main(args: Array[String]): Unit = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")
    val n = sys.env.getOrElse("SPARK_GRAFT_PAGES", "32000000").toLong
    val spark = Sessions.rebuild(master, "graft-profile")
    spark.sparkContext.setLogLevel("WARN")

    case class St(name: String, wallMs: Long, tasks: Int, taskMs: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (collecting) {
        val i = sc.stageInfo
        val wall = (for { a <- i.completionTime; b <- i.submissionTime } yield a - b).getOrElse(-1L)
        stages += St(i.name.takeWhile(_ != '\n').take(60), wall, i.numTasks, i.taskMetrics.executorRunTime)
      }
    })

    Bench.rollupBench(spark, 20000L) // warmup
    Bench.ensureBenchInput(spark, n)
    Bench.rollupBench(spark, n) // warm the page cache

    collecting = true
    val (tp, br, ts, bs) = Bench.rollupBench(spark, n)
    val (points, sec) = (tp + br, ts + bs)
    collecting = false
    Thread.sleep(500)
    println(f"""{"total":{"master":"$master","pages":$n,"points":$points,"sec":$sec%.2f}}""")
    stages.sortBy(-_.wallMs).take(20).foreach { s =>
      println(f"""{"stage":"${s.name}","wall_ms":${s.wallMs},"tasks":${s.tasks},"task_ms":${s.taskMs}}""")
    }
    spark.stop()
  }
}
