package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Amount allocation — splitting a header total across detail lines
  * so the pennies add back up exactly. The financial-pipeline
  * counterpart of [[Profiling.reconcileTotals]] (which AUDITS the
  * header⇄lines invariant, this ENFORCES it).
  */
object Allocation {

  /** Largest-remainder proration: distribute an integer `totalCol`
    * (e.g. cents) across each key's lines proportionally to
    * `weightCol`, producing integer allocations that sum EXACTLY to
    * the total per key — Hamilton's apportionment method.
    *
    * All arithmetic is integer (`div` / `%` on longs): line i gets
    * `⌊total·wᵢ/Σw⌋` plus one extra unit if its integer remainder
    * `total·wᵢ mod Σw` ranks among the `total − Σ⌊…⌋` largest
    * (ties broken by `tieBreak`, ascending). Integer operands make
    * the result bit-identical on any engine and any partitioning —
    * a double-based share would make the rank order (and thus WHO
    * gets the spare pennies) float-noise-dependent.
    *
    * Requires: `totalCol` ≥ 0 and constant within a key, weights ≥ 0,
    * Σw > 0 per key (a zero-weight key would divide by zero — filter
    * such keys upstream; zero-weight LINES are fine and can still
    * receive a remainder penny only if total > Σ⌊…⌋ rounds require,
    * matching Hamilton semantics).
    *
    * Scale shape: ONE shuffle on the key — two window specs over the
    * same partition (full-frame sums, then the remainder rank), no
    * join, no driver action; output is input-sized. At 100 TB this
    * is the same single key-shuffle any per-group window pays.
    *
    * @return input columns + `alloc` (long) */
  def prorate(lines: DataFrame, keyCol: String, weightCol: String,
              totalCol: String, tieBreak: Seq[String]): DataFrame = {
    val wAll = Window.partitionBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.partitionBy(col(keyCol))
      .orderBy(col("_rem").desc +: tieBreak.map(col(_).asc): _*)
    lines
      .withColumn("_sw", sum(col(weightCol)).over(wAll))
      .withColumn("_base",
        expr(s"($totalCol * $weightCol) div _sw"))
      .withColumn("_rem",
        expr(s"($totalCol * $weightCol) % _sw"))
      .withColumn("_spare", col(totalCol) - sum(col("_base")).over(wAll))
      .withColumn("_rn", row_number().over(wRank))
      .withColumn("alloc",
        col("_base") + when(col("_rn") <= col("_spare"), 1L).otherwise(0L))
      .drop("_sw", "_base", "_rem", "_spare", "_rn")
  }
}
