package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-distribution diagnostics — the profiling pass that DECIDES
  * the physical strategies used elsewhere in this engine (salting
  * factor for [[SkewJoin]], bucket counts, AQE skew thresholds). At
  * 100 TB you profile before you join; this makes the profile itself
  * a first-class, cheap, deterministic query.
  */
object Profiling {

  /** Top-N heaviest keys with their skew statistics:
    *
    *  - `share`          — fraction of all rows on this key;
    *  - `ratio_to_mean`  — key count ÷ mean key count (1.0 = uniform);
    *  - `suggested_salt` — ⌈ratio⌉, the replication factor that would
    *    level this key to the mean (the `salt` input of
    *    [[SkewJoin.saltedJoin]]).
    *
    * Scale shape: one map-side-combinable count per key, a 1-row
    * broadcast of (n_keys, total), and a global top-N that plans as
    * TakeOrderedAndProject — never a full sort of the key table.
    * Ties at the cut rank break by key, so the N-th row is
    * deterministic on every engine. */
  def keySkewProfile(df: DataFrame, keyCols: Seq[String],
                     topN: Int = 10): DataFrame = {
    require(keyCols.nonEmpty && topN >= 1)
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    val stats = broadcast(counts.agg(
      count(lit(1)).as("_nkeys"), sum("cnt").as("_total")))
    // double-space ratio: cnt·n_keys as int64 could overflow at
    // extreme cardinality × volume; the double keeps both engines on
    // the identical operand sequence
    val ratio = col("cnt").cast("double") * col("_nkeys") / col("_total")
    counts.crossJoin(stats)
      .select(keyCols.map(col) ++ Seq(
        col("cnt"),
        round(col("cnt") / col("_total"), 6).as("share"),
        round(ratio, 6).as("ratio_to_mean"),
        ceil(ratio).cast("long").as("suggested_salt")): _*)
      .orderBy(col("cnt").desc +: keyCols.map(col): _*)
      .limit(topN)
  }
}
