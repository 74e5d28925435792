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

  /** Reciprocal-rank fusion: merge N ranked candidate lists into one
    * consensus ranking — THE standard hybrid-retrieval combiner
    * (BM25 list ⊕ dense-vector list) because it needs no score
    * calibration, only ranks: each list contributes 1/(k + rank) and
    * the fused score is the sum (k=60 per the original RRF paper's
    * recommendation).
    *
    * Engine-exact by quantization: the contribution is the INTEGER
    * `quantScale div (k + rank)` so the cross-list sum is order-free
    * integer addition (the [[Graph.pageRank]] trick) and the fused
    * ranking — including the top-N cutoff, tie-broken by id — is
    * bit-identical on any engine; `rrf_q / quantScale` recovers the
    * float score to ~1e-9, far inside any ranking use.
    *
    * Ranks are `row_number` by (score DESC, id) — callers pass lists
    * that are already CANDIDATE lists (retrieval top-k, bounded by
    * construction), so the per-list sort is small; fusing is one
    * map-side-combinable integer agg + a top-N. For corpus-wide
    * lists, rank with [[topKPerKey]] first — fusion itself never
    * needs the full corpus. */
  def reciprocalRankFusion(lists: Seq[DataFrame], idCol: String,
                           scoreCol: String, k: Int = 60,
                           topN: Int = 100,
                           quantScale: Long = 1000000000L): DataFrame = {
    require(lists.nonEmpty && k >= 1 && topN >= 1 && quantScale >= 1)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ranked = lists.map { df =>
      df.select(col(idCol).as("_id"),
          col(scoreCol).cast("double").as("_score"))
        .filter(col("_id").isNotNull)
        .withColumn("_r", row_number().over(
          Window.orderBy(col("_score").desc, col("_id"))))
        .select(col("_id"),
          expr(s"$quantScale div (${k.toLong} + _r)").as("_c"))
    }
    ranked.reduce(_ unionByName _)
      .groupBy(col("_id").as(idCol))
      .agg(sum("_c").as("rrf_q"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_q").desc, col(idCol))
      .limit(topN)
  }
}
