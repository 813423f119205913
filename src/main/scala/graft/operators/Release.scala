package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Explicit release of operator-local caches.
  *
  * The positional/zip/sample family persists its input snapshot because an
  * internal metadata pass (counts, boundary rows, partial sums) and the
  * deferred output pass must read the SAME data. The output pass only runs
  * when the caller finally acts on the returned frame — so the operator
  * cannot `try/finally`-unpersist before returning, and pre-round-5 code
  * left the blocks to Spark's ContextCleaner (reclaimed only when the
  * result's lineage went unreachable; a long-lived session accumulates
  * them meanwhile).
  *
  * [[afterNextAction]] closes that: it registers a one-shot
  * `QueryExecutionListener` that unpersists the op-local blocks after the
  * next COMPLETED Dataset action on the session — in the gate/bench/Verify
  * flow, exactly the action that consumed the operator's output. The
  * operator's own internal passes never trigger it (they are RDD actions,
  * which don't fire QueryExecutionListener). If some unrelated Dataset
  * action fires first, the cost is a lineage recompute on the real
  * consuming action — a perf hazard only, and only for callers that
  * interleave actions between building a positional op and running it
  * (the documented order contract already requires the input to be a
  * deterministic post-orderBy pipeline).
  *
  * Note the callback arrives on the listener-bus thread, i.e. release is
  * asynchronous — shortly after the action, not within it (tests poll).
  */
object Release {

  /** Unpersist the given op-local RDD snapshots after the next completed
    * Dataset action on the session.
    */
  def afterNextAction(spark: SparkSession, rdds: RDD[_]*): Unit =
    register(spark, () => rdds.foreach(_.unpersist(blocking = false)))

  /** Unpersist a query-local cached Dataset after the next completed
    * Dataset action (which, for a query that persists a subtree consumed
    * by its own final plan, is that query's own run).
    */
  def datasetAfterNextAction(df: Dataset[_]): Unit =
    register(df.sparkSession, () => { df.unpersist(blocking = false); () })

  private def register(spark: SparkSession, cleanup: () => Unit): Unit = {
    val lm = spark.listenerManager
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def fire(): Unit =
        if (done.compareAndSet(false, true)) { cleanup(); lm.unregister(this) }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = fire()
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = fire()
    }
    lm.register(listener)
  }
}
