package graft.core

/** Bounded driver-side parallelism over independent units of Spark
  * work (per-column model fits, per-tier writes to disjoint paths).
  *
  * Each unit submits its own small Spark jobs; concurrent job
  * submission from driver threads is Spark's supported multi-tenancy
  * model (on a cluster this is what the FAIR scheduler arbitrates).
  * Use ONLY for units that are independent and deterministic in
  * isolation — results must not depend on scheduling order. Output
  * order follows input order; failures propagate to the caller.
  */
object Par {

  /** Pool width for overlapped driver-side units; `-Dgraft.par.threads=1`
    * forces sequential execution (measurement / debugging).
    */
  def defaultThreads: Int =
    sys.props.get("graft.par.threads").flatMap(_.toIntOption).getOrElse(8)

  def mapOrdered[A, B: scala.reflect.ClassTag](units: Array[A], maxThreads: Int = defaultThreads)(
      body: A => B
  ): Array[B] = {
    if (units.length <= 1 || maxThreads <= 1) return units.map(body)
    import scala.concurrent.{Await, ExecutionContext, Future, Promise}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(maxThreads, units.length))
    val ec   = ExecutionContext.fromExecutorService(pool)
    try {
      val futs = units.map(u => Future(body(u))(ec))
      // Fail fast: the first unit failure (in completion order, not
      // index order) unblocks the caller immediately; the finally block
      // then interrupts sibling units and waits for them to exit, so no
      // orphaned unit keeps reading caller-owned resources (e.g. a
      // shared cached DataFrame the caller unpersists while unwinding).
      val result = Promise[Array[B]]()
      futs.foreach(_.failed.foreach(result.tryFailure)(ec))
      Future
        .sequence(futs.toIndexedSeq)(scala.collection.BuildFrom.buildFromIterableOps, ec)
        .foreach(r => result.trySuccess(r.toArray))(ec)
      Await.result(result.future, Duration.Inf)
    } finally {
      pool.shutdownNow()
      pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
    }
  }
}
