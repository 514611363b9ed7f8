package graft

import graft.pages.{PageGen, PagePipeline}
import graft.rollup.Rollup
import graft.spark.Sessions
import org.apache.spark.sql.functions._

/** Scaling control experiments that isolate WHERE the shared-memory
  * sandbox stops scaling (companion to ScalingBench; see BASELINE.md):
  *
  *  - "cpu": pure whole-stage-codegen compute (sha2 chains over
  *    range()) — no input, negligible allocation. Measures the
  *    engine + scheduler scaling ceiling on this box.
  *  - "mem": the full repair+rollup pipeline over IN-MEMORY generated
  *    pages (PageGen is pure codegen over range()) — same expressions
  *    as the real pipeline, no parquet decode. Separates scan/decode
  *    bandwidth from expression work.
  *
  * Prints one JSON line per variant with throughput at N and 4N plus
  * efficiency.
  */
object CpuScalingBench {

  private def cpuJob(spark: org.apache.spark.sql.SparkSession, n: Long): Long = {
    spark
      .range(n)
      .select(sha2(concat(lit("k"), col("id"), sha2(concat(col("id") * 7, lit("x")).cast("string"), 256)).cast("string"), 256).as("h"))
      .select(count(when(substring(col("h"), 1, 1) === "a", 1)).as("c"))
      .head()
      .getLong(0)
  }

  private def memJob(spark: org.apache.spark.sql.SparkSession, n: Long): Long = {
    val dirty = PageGen.corrupt(PageGen.clean(spark, n))
    val repaired = PagePipeline.repair(dirty)
    Rollup
      .fromRaw(
        repaired.withColumn("domain", PageGen.domainOf("url")),
        Seq("domain", "lang"),
        "warc_ts",
        "1m",
        length(col("html")).cast("long")
      )
      .count()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "4").toInt
    val cpuRows = sys.env.getOrElse("SPARK_GRAFT_CPU_ROWS", "60000000").toLong
    val memPages = sys.env.getOrElse("SPARK_GRAFT_MEM_PAGES", "16000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt

    def measure(cores: Int, job: (org.apache.spark.sql.SparkSession, Long) => Long, rows: Long): Double = {
      val spark = Sessions.rebuild(s"local[$cores]", s"graft-cpuscale-$cores")
      spark.sparkContext.setLogLevel("WARN")
      job(spark, rows / 100) // warmup
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        job(spark, rows)
        rows / ((System.nanoTime() - t0) / 1e9)
      }.max
      spark.stop()
      best
    }

    val variants = Seq(
      ("cpu", cpuJob _, cpuRows),
      ("mem_pipeline", memJob _, memPages)
    ).filter { case (name, _, _) =>
      sys.env.get("SPARK_GRAFT_SCALE_VARIANT").forall(_ == name)
    }

    // SPARK_GRAFT_SCALE_SINGLE=<cores>: one parallelism level per JVM
    // (same process-isolation rationale as ScalingBench — surviving
    // heap/GC state of one side must not taint the other)
    sys.env.get("SPARK_GRAFT_SCALE_SINGLE") match {
      case Some(c) =>
        for ((name, job, rows) <- variants) {
          val thr = measure(c.toInt, job, rows)
          println(f"""{"metric":"single_throughput_$name","cores":$c,"rows_per_sec":$thr%.0f,"rows":$rows}""")
        }
      case None =>
        for ((name, job, rows) <- variants) {
          val small = measure(n, job, rows)
          val big = measure(4 * n, job, rows)
          val eff = (big / small) / 4.0
          println(
            f"""{"metric":"scaling_efficiency_$name","value":$eff%.3f,"cores_small":$n,"cores_big":${4 * n},"rows_per_sec_small":$small%.0f,"rows_per_sec_big":$big%.0f}"""
          )
        }
    }
  }
}
