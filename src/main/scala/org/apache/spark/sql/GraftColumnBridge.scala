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
}
