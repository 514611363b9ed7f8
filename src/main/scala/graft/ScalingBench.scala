package graft

import graft.spark.Sessions

/** Two-parallelism scaling benchmark (the sandbox stand-in for the
  * north rule's N vs 4N executor clusters): runs the identical pages
  * correct-then-rollup job at `local[N]` and `local[4N]` in fresh
  * sessions and reports throughput at both plus scaling efficiency
  * `(thr4N / thrN) / 4`.
  *
  * Prints one JSON line; results are recorded in BASELINE.md.
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    // default N=4 (pair 4 vs 16): this box's memory bandwidth stops
    // scaling past ~16 streaming threads (measured: 8->32 procs gives
    // only 2.3x aggregate bandwidth) — a machine property, not a job
    // property; see BASELINE.md "scaling" notes
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "4").toInt
    // large enough that driver-serial time (planning, job barriers,
    // ~2-3 s/run) is a small fraction of even the 4N-side wall, small
    // enough that the shared memory bus does not dominate (BASELINE.md
    // scaling notes)
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "32000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt

    def run(cores: Int): Double = {
      val spark = Sessions.rebuild(s"local[$cores]", s"graft-scale-$cores")
      spark.sparkContext.setLogLevel("WARN")
      Bench.rollupBench(spark, 20000L) // warmup
      val best = (1 to reps).map { _ =>
        val (tp, br, ts, bs) = Bench.rollupBench(spark, nPages)
        val (points, sec) = (tp + br, ts + bs)
        points / sec
      }.max
      spark.stop()
      best
    }

    // SPARK_GRAFT_SCALE_SINGLE=<cores>: measure one parallelism level
    // in a fresh JVM and exit — lets the N and 4N sides run in
    // separate processes so heap/GC state of one cannot taint the
    // other (observed: a 4-core run's surviving heap regressed the
    // 16-core run in shared-JVM mode)
    sys.env.get("SPARK_GRAFT_SCALE_SINGLE").foreach { c =>
      val thr = run(c.toInt)
      println(f"""{"metric":"single_throughput","cores":$c,"points_per_sec":$thr%.1f,"pages":$nPages}""")
      return
    }

    val thrSmall = run(n)
    val thrBig = run(4 * n)
    val eff = (thrBig / thrSmall) / 4.0
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","cores_small":$n,"cores_big":${4 * n},"throughput_small":$thrSmall%.1f,"throughput_big":$thrBig%.1f,"pages":$nPages}"""
    )
  }
}
