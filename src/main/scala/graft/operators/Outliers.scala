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

  /** @return the input plus `z` (rounded 6) and `is_outlier`. Rows
    *         whose group key is NULL are dropped (equi-join
    *         semantics) — pre-coalesce the group column to a sentinel
    *         if unknown-group rows should be scored as their own
    *         stratum. */
  def zscore(df: DataFrame, valueCol: String, groupCols: Seq[String],
             threshold: Double = 3.0): DataFrame = {
    require(groupCols.nonEmpty && threshold > 0)
    val v = col(valueCol).cast("double")
    val g = groupCols.map(col)
    val stats = df.groupBy(g: _*).agg(
      sum(v).as("_sv"), sum(v * v).as("_sv2"),
      count(v).cast("double").as("_n"))
    val mean = col("_sv") / col("_n")
    val variance = col("_sv2") / col("_n") - mean * mean
    val z = (v - mean) / sqrt(variance)
    df.join(broadcast(stats), groupCols)
      .withColumn("z",
        when(col("_n") === 0 || variance === 0.0, lit(0.0))
          .otherwise(round(z, 6)))
      .withColumn("is_outlier",
        when(col("_n") === 0 || variance === 0.0, lit(false))
          .otherwise(abs(z) > threshold))
      .drop("_sv", "_sv2", "_n")
  }
}
