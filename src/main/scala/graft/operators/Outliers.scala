package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group z-score outlier flagging (SURVEY.md §2.11 extension
  * surface) — the distribution-based anomaly gate of a corpus
  * pipeline: flag documents whose length (tokens, chars, quality
  * score …) sits more than `threshold` standard deviations from
  * their group's mean (group = source domain, language, shard …).
  *
  * Scale shape: one map-side-combinable aggregation to (sum, sum of
  * squares, count) per group — the classic mergeable moment sketch —
  * broadcast back over the corpus as a scan-speed projection. Moments
  * over INTEGER-valued columns are exact in double arithmetic (every
  * partial sum < 2^53), so z-scores are reproducible across engines
  * and partitionings; constant groups (variance 0) flag nothing.
  */
object Outliers {

  /** @param broadcastStats when true (default), the per-group moment
    *         table is broadcast back over the corpus — right up to
    *         ~10⁷ groups (3 doubles/group ≈ a few hundred MB of
    *         driver/executor memory). Beyond that, pass false for a
    *         plain shuffled equi-join: same result, no driver
    *         collect, at the cost of shuffling the corpus once on the
    *         group key.
    * @return the input plus `z` (rounded 6) and `is_outlier`. Rows
    *         whose group key is NULL are dropped (equi-join
    *         semantics) — pre-coalesce the group column to a sentinel
    *         if unknown-group rows should be scored as their own
    *         stratum. */
  def zscore(df: DataFrame, valueCol: String, groupCols: Seq[String],
             threshold: Double = 3.0, broadcastStats: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty && threshold > 0)
    val v = col(valueCol).cast("double")
    val g = groupCols.map(col)
    val stats = df.groupBy(g: _*).agg(
      sum(v).as("_sv"), sum(v * v).as("_sv2"),
      count(v).cast("double").as("_n"))
    val mean = col("_sv") / col("_n")
    // E[x²] − E[x]² can land an ulp BELOW zero for near-constant
    // groups once sums of squares leave double's exact-integer range
    // (≥ 2^53): sqrt(−ε) = NaN, and abs(NaN) > t is TRUE in Spark —
    // which would flag every row of such a group. Clamp at 0 and
    // route the clamped value into the constant-group branch.
    val variance = greatest(col("_sv2") / col("_n") - mean * mean, lit(0.0))
    val z = (v - mean) / sqrt(variance)
    val withStats =
      if (broadcastStats) df.join(broadcast(stats), groupCols)
      else df.join(stats, groupCols)
    withStats
      .withColumn("z",
        when(col("_n") === 0 || variance === 0.0, lit(0.0))
          .otherwise(round(z, 6)))
      .withColumn("is_outlier",
        when(col("_n") === 0 || variance === 0.0, lit(false))
          .otherwise(abs(z) > threshold))
      .drop("_sv", "_sv2", "_n")
  }
}
