package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column `array<float>` (SURVEY.md §2.11).
  *
  * Shapes:
  *  - [[cosineTopK]] — brute-force: broadcast the (small) query set
  *    against the corpus, one scan, per-query top-k via window rank.
  *    O(queries · corpus · dim) — the correct baseline, and the right
  *    plan whenever queries are few (the corpus side never shuffles;
  *    ranking shuffles only (query, candidate) pairs).
  *  - [[ivfTopK]] — IVF-style: restrict search to the query's own
  *    partition (here the `label` column stands in for a centroid
  *    assignment). At 100 TB: corpus bucketed/partitioned by
  *    partition key ⇒ per-query work divides by the number of
  *    partitions, at a recall cost on boundary vectors.
  *
  * Dot products use the `zip_with`/`aggregate` higher-order functions
  * — codegen-friendly, no UDF, and a left-to-right fold that the
  * DuckDB oracle reproduces exactly.
  */
object Similarity {

  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Left-to-right double-precision dot product via higher-order
    * functions — the declarative baseline (interpreted per element;
    * kept as the reference implementation and parity check). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Dot product over `array<float>`: native codegen'd expression
    * ([[graft.plans.DotProductF]]), bit-identical to [[dotHof]] (same
    * left-to-right double fold) but a tight primitive loop inside
    * whole-stage codegen instead of per-element interpretation. */
  def dot(a: Column, b: Column): Column =
    toCol(graft.plans.DotProductF(toExpr(a), toExpr(b)))

  /** L2 norm over `array<float>` (single-pass native expression). */
  def norm(a: Column): Column = toCol(graft.plans.L2NormF(toExpr(a)))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for every query vector, the k nearest
    * corpus vectors (self excluded). Deterministic ordering: rounded
    * score desc, then candidate id. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val scored = q.join(c, col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("query_id", "cand_id", "cos", "rn")
  }

  /** IVF-style top-k: search only the query's own `partCol` cell. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              partCol: String = "label"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), col(partCol).as("qp"), norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      col(partCol).as("cp"), norm(col(vecCol)).as("cn"))
    val scored = q.join(c, col("qp") === col("cp") && col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("query_id", "cand_id", "cos", "rn")
  }

  /** Embedding near-duplicate pairs within partition blocks:
    * same-`partCol` pairs with cosine ≥ threshold. The blocked
    * (IVF-ish) analog of exact all-pairs near-dup — at scale the
    * join shuffles each block once instead of crossing the corpus. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   partCol: String = "label"): DataFrame = {
    // norms precomputed once per vector, not once per pair: at n²/p
    // pairs that's the difference between 1 and ~2n/p folds per row
    val a = corpus.select(col(idCol).as("vec_a"), col(vecCol).as("va"),
      col(partCol).as("pa"), norm(col(vecCol)).as("na"))
    val b = corpus.select(col(idCol).as("vec_b"), col(vecCol).as("vb"),
      col(partCol).as("pb"), norm(col(vecCol)).as("nb"))
    a.join(b, col("pa") === col("pb") && col("vec_a") < col("vec_b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }
}
