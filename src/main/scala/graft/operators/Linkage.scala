package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter): blocked candidate
  * generation + per-field agreement log-weights + threshold. The
  * entity-resolution complement to [[Merge.goldenRecord]] (which
  * assumes links are already known) — extension surface, SURVEY.md
  * §2.11; the reference pipeline links nothing.
  *
  * Model: each field comparison contributes ln(m/u) when it agrees
  * and ln((1−m)/(1−u)) when it disagrees (m = P(agree | match),
  * u = P(agree | non-match)); a pair is a link when the summed weight
  * clears `minScore`. Callers pass the weights as plain doubles so
  * the identical literals appear in the oracle dual — the engine
  * never computes logs at runtime.
  *
  * Scale shape: candidate generation is ONE equi-join shuffle on the
  * blocking key — never a cross join; pairs exist only within blocks.
  * Field comparisons and the weighted sum are codegen'd `Column`
  * expressions evaluated join-side, and the threshold filters before
  * anything else sees the pairs. Skewed blocks are the operator's
  * known hazard at 100 TB — compose with [[SkewJoin.saltedJoin]] or
  * AQE skew handling when a blocking key is hot (documented, not
  * hidden).
  */
object Linkage {

  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** One field comparison: `agree` is any boolean Column over the
    * joined pair; weights are precomputed ln-ratios. */
  final case class FieldComparison(name: String, agree: Column,
                                   wAgree: Double, wDisagree: Double)

  /** Jaro-Winkler similarity (DuckDB-exact scoring, see
    * [[graft.plans.JaroWinkler.sim]]) as a codegen'd Column — the
    * string comparator to feed [[FieldComparison]]
    * (`jaroWinkler(a, b) >= 0.9`) instead of exact equality. */
  def jaroWinkler(a: Column, b: Column): Column =
    toCol(graft.plans.JaroWinklerSim(toExpr(a), toExpr(b)))

  /** Score all within-block pairs of `a` × `b`; keep those at or
    * above `minScore`. `a` and `b` must share ONLY the `blockKeys`
    * column names (pre-alias everything else, e.g. `a_...`/`b_...`);
    * comparison Columns reference the aliased names. Output: the two
    * id columns, one boolean per comparison, and the rounded score.
    */
  def fellegiSunter(a: DataFrame, b: DataFrame, blockKeys: Seq[String],
                    aKey: String, bKey: String,
                    comparisons: Seq[FieldComparison],
                    minScore: Double): DataFrame = {
    require(comparisons.nonEmpty, "at least one field comparison")
    val shared = a.columns.toSet.intersect(b.columns.toSet) -- blockKeys
    require(shared.isEmpty,
      s"a and b may only share the blocking keys; also shared: $shared")
    val score = comparisons.map { c =>
      when(c.agree, lit(c.wAgree)).otherwise(lit(c.wDisagree))
    }.reduce(_ + _)
    val flags = comparisons.map(c => c.agree.as(s"agree_${c.name}"))
    a.join(b, blockKeys)
      .select(Seq(col(aKey), col(bKey)) ++ flags :+
        round(score, 6).as("score"): _*)
      .filter(col("score") >= minScore)
  }
}
