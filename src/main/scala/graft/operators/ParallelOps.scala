package graft.operators

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.Try

import org.apache.spark.sql.SparkSession

/** A19 — inter-table orchestration: the reference fans out one worker
  * per endpoint with per-future error isolation
  * (/root/reference/src/main.py:330-352, ThreadPoolExecutor +
  * as_completed). In Spark the data plane is already parallel; this
  * replicates the *job-level* concurrency — submitting independent
  * actions (e.g., per-table loads) so the scheduler can interleave
  * their stages — with the same isolation: one failed table never
  * aborts the others.
  */
object ParallelOps {

  private val groupSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Run independent jobs concurrently; returns per-job outcomes in
    * input order. `parallelism` mirrors the reference's max_workers=2.
    * `timeout` bounds the WHOLE batch — a wedged job throws a
    * TimeoutException here instead of hanging the caller forever.
    *
    * Pass `spark` when the jobs submit Spark actions: each job then
    * runs under a shared job group, and on timeout the group is
    * CANCELLED — interrupting thread-pool workers alone (shutdownNow)
    * never stops the already-submitted Spark jobs, which would keep
    * burning executors after the caller has thrown. */
  def runIsolated[T](jobs: Seq[() => T], parallelism: Int = 2,
      timeout: Duration = Duration.Inf,
      spark: Option[SparkSession] = None): Seq[Try[T]] = {
    // daemon threads + shutdownNow on timeout: a wedged job must not
    // keep the JVM alive after the caller has already given up on it
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism,
      (r: Runnable) => { val t = new Thread(r, "graft-parallel"); t.setDaemon(true); t })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val group = s"graft-parallel-${groupSeq.incrementAndGet()}"
    // cancellation race guard: a worker that dequeues a job AFTER
    // cancelJobGroup() would re-set the group and run uncancelled;
    // the flag stops not-yet-started jobs before they submit anything
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    try {
      val futures = jobs.map(j => Future(Try {
        if (cancelled.get)
          throw new java.util.concurrent.CancellationException(
            "runIsolated: batch timed out before this job started")
        // job-group set per worker thread (it's thread-local), so the
        // whole batch is cancellable as one unit
        spark.foreach(_.sparkContext.setJobGroup(group, "graft runIsolated",
          interruptOnCancel = true))
        try j()
        finally spark.foreach(_.sparkContext.clearJobGroup())
      }))
      Await.result(Future.sequence(futures), timeout)
    } catch {
      case e: scala.concurrent.TimeoutException =>
        cancelled.set(true)
        // AndFutureJobs closes the remaining window the flag can't: a
        // worker that passed the flag check but hasn't submitted yet
        // still gets its jobs cancelled when they arrive
        spark.foreach(_.sparkContext.cancelJobGroupAndFutureJobs(group))
        pool.shutdownNow(); throw e
    } finally pool.shutdown()
  }
}
