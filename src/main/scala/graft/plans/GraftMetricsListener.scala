package graft.plans

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Query-level observability: a [[QueryExecutionListener]] that turns
  * every action into one metrics row — duration, output rows, shuffle
  * count, codegen span count. "Measure, don't guess" as a library
  * surface: the skew profile (q86) diagnoses DATA before a run; this
  * diagnoses PLANS after one, with no instrumentation inside any
  * operator (the engine's listener bus does the work, so it costs
  * nothing on the query path).
  *
  * {{{
  * val m = new GraftMetricsListener
  * spark.listenerManager.register(m)
  * ... run queries ...
  * m.drain()  // ActionMetrics(name, ns, rows, shuffles, codegenSpans)
  * }}}
  *
  * At 100 TB this is the feedback loop that catches "this stage
  * suddenly shuffles" regressions in CI: assert on shuffle counts per
  * named pipeline, not on wall-clock.
  */
final class GraftMetricsListener extends QueryExecutionListener {

  final case class ActionMetrics(action: String, durationNs: Long,
                                 outputRows: Option[Long], shuffles: Int,
                                 codegenSpans: Int, failed: Boolean)

  private val buf = new ConcurrentLinkedQueue[ActionMetrics]

  private def planCounts(qe: QueryExecution): (Int, Int) = {
    // string-walk rather than tree-walk: with AQE the executed plan is
    // an AdaptiveSparkPlanExec wrapper whose FINAL children don't show
    // up in plan.collect, but the rendered tree (isFinalPlan=true at
    // this point) always carries them. Two rendering traps: (a) the
    // adaptive node prints BOTH "Final Plan" and "Initial Plan"
    // sections — count only the final one or every node doubles;
    // (b) "Exchange" as a substring also matches BroadcastExchange /
    // ReusedExchange, which are NOT shuffles — require a word start.
    val tree = qe.executedPlan.toString.split("== Initial Plan ==").head
    val shuffles = "(?<![A-Za-z])Exchange".r.findAllIn(tree).length
    // codegen spans render as "*(n) NodeName" prefixes; counting the
    // openers is a >0 signal and a relative width measure
    var cg = 0; var i = tree.indexOf("*(")
    while (i >= 0) { cg += 1; i = tree.indexOf("*(", i + 1) }
    (shuffles, cg)
  }

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit = {
    val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
    val (ex, cg) = planCounts(qe)
    buf.add(ActionMetrics(funcName, durationNs, rows, ex, cg, failed = false))
  }

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit = {
    val (ex, cg) = planCounts(qe)
    buf.add(ActionMetrics(funcName, 0L, None, ex, cg, failed = true))
  }

  /** Remove and return everything captured so far (oldest first). */
  def drain(): Seq[ActionMetrics] = {
    val out = buf.iterator().asScala.toList
    out.foreach(_ => buf.poll())
    out
  }
}
