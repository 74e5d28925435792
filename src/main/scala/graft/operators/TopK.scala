package graft.operators

import graft.plans.{TopKPerKeyPlan, TopKStrategy}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, SortOrder}
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}

/** Public API over the [[graft.plans.TopKPerKeyPlan]] custom operator
  * (see its scaladoc for the plan shape and the scale argument vs the
  * window-rank formulation). */
object TopK {

  /** The k rows sorting first under `order` within each key group.
    * Ties must be broken by the ordering itself (add a unique column)
    * for fully deterministic output. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], order: Seq[Column],
                 k: Int): DataFrame = {
    require(k >= 1 && keyCols.nonEmpty && order.nonEmpty)
    val spark = df.sparkSession
    TopKStrategy.setup(spark)
    val analyzed = df.queryExecution.analyzed
    val resolver = spark.sessionState.analyzer.resolver
    def attr(n: String): Attribute = analyzed.output
      .find(a => resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"no column '$n' among ${analyzed.output.map(_.name).mkString(", ")}"))
    val keys = keyCols.map(attr)
    val ordering = order.map { c =>
      GraftColumnBridge.eagerExpression(c).transformUp {
        case u: UnresolvedAttribute => attr(u.name)
      } match {
        case so: SortOrder => so
        case e => SortOrder(e, Ascending)
      }
    }
    GraftColumnBridge.ofRows(spark, TopKPerKeyPlan(keys, ordering, k, analyzed))
  }
}
