package graft.operators

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.Try

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

  /** Run independent jobs concurrently; returns per-job outcomes in
    * input order. `parallelism` mirrors the reference's max_workers=2.
    * `timeout` bounds the WHOLE batch — a wedged job throws a
    * TimeoutException here instead of hanging the caller forever. */
  def runIsolated[T](jobs: Seq[() => T], parallelism: Int = 2,
      timeout: Duration = Duration.Inf): Seq[Try[T]] = {
    // daemon threads + shutdownNow on timeout: a wedged job must not
    // keep the JVM alive after the caller has already given up on it
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism,
      (r: Runnable) => { val t = new Thread(r, "graft-parallel"); t.setDaemon(true); t })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = jobs.map(j => Future(Try(j())))
      Await.result(Future.sequence(futures), timeout)
    } catch {
      case e: scala.concurrent.TimeoutException => pool.shutdownNow(); throw e
    } finally pool.shutdown()
  }
}
