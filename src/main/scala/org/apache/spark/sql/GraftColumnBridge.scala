package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the Column↔Expression conversion `private[sql]`
  * (`classic.ExpressionUtils`, columnNodeSupport.scala) as part of the
  * Connect/classic API split; extension libraries that ship custom
  * `Expression`s conventionally expose it through a same-package
  * bridge like this one. Used by `graft.operators.Similarity` (dot /
  * norm), `graft.operators.FuzzyDedup` (rolling fingerprints), and
  * `graft.operators.Sketches` (HLL aggregate).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column → catalyst Expression conversion.
    * [[expression]] returns a lazy `ColumnNodeExpression` wrapper
    * that still references the non-serializable internal column AST
    * (it normally converts during analysis of a standard operator);
    * custom logical operators need the real catalyst tree up front —
    * e.g. a sort Column becomes a genuine `expressions.SortOrder`. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** DataFrame from a LogicalPlan (`Dataset.ofRows` is `private[sql]`
    * in Spark 4) — needed to hand custom logical operators such as
    * [[graft.plans.TopKPerKeyPlan]] back to the session. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
