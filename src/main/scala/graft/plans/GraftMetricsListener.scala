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
    // TREE walk, not a string walk over the rendered plan (a Spark
    // version bump that changes plan rendering would silently break
    // substring counting). `plan.collect` alone is NOT enough: with
    // AQE the executed plan is an AdaptiveSparkPlanExec LEAF whose
    // final plan hangs off `executedPlan` (final by onSuccess time),
    // and each materialized stage is a QueryStageExec leaf whose real
    // subtree hangs off `plan` — both must be descended explicitly.
    // ReusedExchangeExec points at an exchange counted where it
    // originally appeared, so it is a stop (also avoids revisiting a
    // shared subtree); BroadcastExchange is deliberately NOT a
    // shuffle (ShuffleExchangeLike only).
    import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    var shuffles = 0
    var cg = 0
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec        => walk(s.plan)
      case _: ReusedExchangeExec    => ()
      case w: WholeStageCodegenExec => cg += 1; w.children.foreach(walk)
      case e: ShuffleExchangeLike   => shuffles += 1; e.children.foreach(walk)
      case other                    => other.children.foreach(walk)
    }
    walk(qe.executedPlan)
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
