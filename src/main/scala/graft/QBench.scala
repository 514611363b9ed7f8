package graft

import org.apache.spark.sql.SparkSession

/** Scratch single-query timing harness: `runMain graft.QBench q48_cleaning [reps]`. */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession
      .builder()
      .appName("graft-qbench")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      // heap comes from build.sbt javaOptions (-Xmx via SPARK_DRIVER_MEM,
      // default 48g): setting spark.driver.memory after JVM start is a
      // no-op in local mode
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_QBENCH_JOBS=1: log every Spark job (action) with its
    // wall time — the direct way to see whether a query's cost is data
    // or a chain of sequential driver actions.
    if (sys.env.getOrElse("SPARK_GRAFT_QBENCH_JOBS", "0") == "1") {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = {
          val desc = Option(j.properties).flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          val site = j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')).getOrElse("")
          val what = if (desc.nonEmpty) desc else site
          starts.put(j.jobId, (System.nanoTime(), s"stages=${j.stageInfos.size} $what"))
        }
        override def onJobEnd(j: SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId)).foreach { case (t0, what) =>
            val ms = (System.nanoTime() - t0) / 1e6
            println(f"[job] #${j.jobId}%-4d $ms%8.1f ms  ${what.take(90)}")
          }
        }
      })
    }
    val reps = if (args.length > 1) args(1).toInt else 2
    args(0).split(",").foreach { name =>
      val fn = SparkEntry.queries(name)
      // SPARK_GRAFT_QBENCH_NOOP=1: noop-sink like graft.Bench (computes
      // EVERY output column; count() lets Catalyst prune projections)
      val noop = sys.env.getOrElse("SPARK_GRAFT_QBENCH_NOOP", "0") == "1"
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val out = fn(spark, sfDir)
        val n = if (noop) { Bench.noopRun(out); -1L } else out.count()
        val sec = (System.nanoTime() - t0) / 1e9
        out.unpersist()
        println(f"[qbench] $name rep$i: $sec%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
