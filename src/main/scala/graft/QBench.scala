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
