package graft.operators

import graft.functions.HashFunctions.md5Long
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic sketches composed from relational primitives.
  *
  * [[hllDistinct]] is a HyperLogLog distinct-count estimator built
  * entirely from md5 + integer/bit expressions, so — unlike
  * `approx_count_distinct` (whose HLL++ registers are engine-private)
  * — the *estimate itself* is bit-reproducible by the DuckDB oracle:
  * both engines compute the identical register table and the
  * identical harmonic mean.
  *
  * Scale shape: one shuffle of (bucket → max rho) with map-side
  * partial max — 256 groups regardless of input size; the estimate is
  * a single-row reduction. Exactly the register-merge structure a
  * distributed HLL needs (registers are max-mergeable), expressed
  * declaratively.
  */
object Sketches {

  /** HLL with m = 256 buckets (p = 8) over an expression.
    * Returns one row: (est_distinct, exact_distinct) — the exact
    * count rides along for error inspection; drop it at true scale.
    * alpha_256 = 0.7213/(1 + 1.079/256), truncated to a shared
    * literal so both engines use the same constant. */
  def hllDistinct(rows: DataFrame, valueCol: String): DataFrame = {
    val h = md5Long(col(valueCol))
    val hashed = rows.select(h.as("h"), col(valueCol).as("v"))
    // The hash partitions values across buckets, so the global exact
    // distinct count is the SUM of per-bucket distinct counts — it
    // rides the register aggregation instead of forcing a second scan
    // of the token stream (the round-1 plan read the input twice).
    val regs = hashed
      .select((col("h").bitwiseAND(lit(255L))).as("bucket"), col("v"),
        when(expr("shiftright(h, 8)") > 0,
          lit(53) - length(bin(expr("shiftright(h, 8)")))).otherwise(lit(53)).as("rho"))
      .groupBy("bucket").agg(max("rho").as("mj"), countDistinct(col("v")).as("ed"))
    // coalesce: an empty input has no register rows — zsum degrades to
    // 256 empty registers and the linear-counting branch yields 0, the
    // right answer, instead of a NULL row
    val z = regs.agg(
      (coalesce(sum(pow(lit(2.0), -col("mj"))), lit(0.0)) +
        (lit(256) - count(lit(1)))).as("zsum"),
      (lit(256) - count(lit(1))).as("zeros"),
      coalesce(sum(col("ed")), lit(0L)).as("exact_distinct"))
    val raw = lit(0.718272) * lit(65536.0) / col("zsum")
    // linear-counting small-range correction (standard HLL): below
    // 2.5·m with empty registers, m·ln(m/V) is the better estimator
    val corrected = when(raw <= 640.0 && col("zeros") > 0,
      lit(256.0) * log(lit(256.0) / col("zeros"))).otherwise(raw)
    z.select(
      round(corrected, 4).as("est_distinct"),
      col("exact_distinct"))
  }

  /** Corpus-level distinct-token estimate over a documents table. */
  def hllDistinctTokens(docs: DataFrame, textCol: String = "text"): DataFrame =
    hllDistinct(
      docs.select(explode(tokens(col(textCol))).as("term")), "term")

  /** The same estimator as a custom Catalyst aggregate
    * ([[graft.plans.HllAgg]]): identical registers, single aggregate
    * expression with map-side partial merge of 256-byte buffers. Use
    * like any aggregate Column: `df.agg(hllAggCol($"v"))`. */
  def hllAggCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.HllAgg(org.apache.spark.sql.GraftColumnBridge.expression(c))
        .toAggregateExpression())
}
