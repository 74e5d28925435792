package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (interval/range) join — an operator Spark lacks natively
  * (SURVEY.md §2.11 extension surface): joining on
  * `|left.ts − right.ts| ≤ width` (plus an equality key) plans as a
  * nested-loop join when written directly, which is quadratic per key
  * group and a non-starter at scale.
  *
  * Scale shape: quantize time into width-`width` buckets with INTEGER
  * division (no doubles — int64 nanos exceed 2^53, where floating
  * floor silently corrupts), equi-join the replicated side against
  * its own and both adjacent buckets, and post-filter the exact band
  * predicate. `|t1 − t2| ≤ width` implies the bucket indices differ
  * by at most 1, so the 3-bucket fan covers every true pair exactly
  * once (bucket values are distinct — no dedup needed), and the join
  * is a plain shuffled/broadcast equi-join on (key, bucket):
  * O(true pairs + 3·|left|) instead of O(|left|·|right|) per key.
  */
object RangeJoin {

  /** Join rows sharing `keyCol` whose `leftTs`/`rightTs` (non-negative
    * integer timestamps, e.g. epoch nanos) differ by at most `width`.
    * The LEFT side is replicated 3× — pass the smaller/filtered
    * relation as `left`. Right columns come back prefixed with
    * `rightPrefix` so same-named columns never collide. */
  def bandJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: String, rightTs: String, width: Long,
               rightPrefix: String = "r_"): DataFrame = {
    require(width > 0, "width must be positive")
    val r0 = right.columns.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, rightPrefix + c))
    val cand = left
      .withColumn("_lb", expr(s"$leftTs div CAST($width AS BIGINT)"))
      .withColumn("_cb", explode(array(col("_lb") - 1, col("_lb"), col("_lb") + 1)))
    val rb = r0.withColumn("_rb",
      expr(s"$rightPrefix$rightTs div CAST($width AS BIGINT)"))
    cand
      .join(rb, cand("_cb") === rb("_rb") &&
        cand(keyCol) === rb(rightPrefix + keyCol))
      .filter(abs(col(leftTs) - col(rightPrefix + rightTs)) <= width)
      .drop("_lb", "_cb", "_rb")
  }
}
