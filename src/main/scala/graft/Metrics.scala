package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Lightweight observability: a `QueryExecutionListener` that records,
  * per completed action, the wall time plus the plan's scan and
  * shuffle metrics — the numbers a pipeline operator actually watches
  * (is this stage reading more than yesterday? did a code change grow
  * the shuffle?). Records are plain case classes; the E1 driver (or
  * any caller) can land them as a metrics table beside the data
  * layers. Listener callbacks are fired asynchronously by Spark's
  * listener bus — readers poll [[Recorder.snapshot]] (tests) or call
  * [[Recorder.drain]] periodically (production: drain keeps the buffer
  * bounded over a long-lived session; snapshot alone would grow with
  * every action forever).
  */
object Metrics {

  /** One completed Spark action. `scanRows`/`scanFiles` sum over every
    * file scan in the FINAL adaptive plan; `shuffleBytes` sums the
    * bytes written by every exchange (the cluster-wide cost signal). */
  case class QueryMetric(
      action: String,
      durationMs: Long,
      scanRows: Long,
      scanFiles: Long,
      shuffleBytes: Long,
      failed: Boolean)

  final class Recorder extends QueryExecutionListener {
    private val records = new ConcurrentLinkedQueue[QueryMetric]()

    /** Full traversal of an executed adaptive plan: AQE nests each
      * stage's subtree behind a childless QueryStageExec wrapper, so
      * plain `collect` sees only the wrappers — recurse through
      * `.plan` explicitly. */
    private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: allNodes(q.plan)
      case other => other +: other.children.flatMap(allNodes)
    }

    private def sumScanMetric(qe: QueryExecution, key: String): Long =
      allNodes(qe.executedPlan).collect {
        // numOutputRows exists on most operators — restrict to leaf
        // scan nodes (v1 FileSourceScanExec / v2 BatchScanExec both
        // render as "*Scan*") so the number means "rows off storage".
        case s if s.children.isEmpty &&
          s.nodeName.toLowerCase.contains("scan") &&
          s.metrics.contains(key) => s.metrics(key).value
      }.sum

    private def sumMetric(qe: QueryExecution, key: String): Long =
      allNodes(qe.executedPlan).collect {
        case p if p.metrics.contains(key) => p.metrics(key).value
      }.sum

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      records.add(QueryMetric(
        action = funcName,
        durationMs = durationNs / 1000000L,
        scanRows = sumScanMetric(qe, "numOutputRows"),
        scanFiles = sumScanMetric(qe, "numFiles"),
        shuffleBytes = sumMetric(qe, "shuffleBytesWritten"),
        failed = false))

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit =
      records.add(QueryMetric(funcName, 0L, 0L, 0L, 0L, failed = true))

    def snapshot: Seq[QueryMetric] = records.asScala.toSeq

    /** Remove and return everything recorded so far — the flush a
      * long-running pipeline calls periodically (landing the result as
      * a metrics table) so the in-memory buffer stays bounded. */
    def drain(): Seq[QueryMetric] = {
      val out = Seq.newBuilder[QueryMetric]
      var m = records.poll()
      while (m != null) { out += m; m = records.poll() }
      out.result()
    }
  }

  /** Attach a recorder to the session; returns it for polling. The
    * caller owns detachment via [[detach]] (tests) — a long-lived
    * pipeline simply keeps it attached. */
  def attach(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r)
    r
  }

  def detach(spark: SparkSession, r: Recorder): Unit =
    spark.listenerManager.unregister(r)
}
