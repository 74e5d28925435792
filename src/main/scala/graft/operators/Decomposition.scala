package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.functions._

/** Distributed second-moment statistics and PCA over an embedding
  * column — whitening / dimensionality reduction for training-data
  * curation (LLM-pipeline extension, SURVEY.md §2.11; the reference
  * has no vector analytics at all).
  *
  * Everything expensive is one corpus scan through
  * [[graft.plans.GramAgg]]: the shuffle carries a single
  * d(d+3)/2+1-double buffer per task (map-side partial merge), never
  * rows. The eigensolve then runs on the DRIVER over the d×d matrix —
  * deliberately: at d = 64 that is a 4K-entry dense problem,
  * microseconds of work, and shipping it to executors would buy
  * nothing. This is the same "statistics pass, then broadcast back"
  * shape as [[Similarity.kmeansRefine]]'s centroid step, and it is
  * the textbook 100 TB PCA: O(n·d²) distributed, O(d³) central.
  */
object Decomposition {

  /** Population covariance as (i, j, cov) rows for i ≤ j — the
    * declarative read-out of one [[graft.plans.GramAgg]] pass.
    * Upper-triangle layout: entry (i,j) sits at offset
    * i·d − i(i−1)/2 + (j−i) past the count+sums prefix. Rounded to 6
    * decimals so the FP partial-merge order never shows. */
  def covarianceMatrix(rows: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val g = rows.agg(gramCol(col(vecCol), dim).as("g"))
    g.select(col("g"), explode(sequence(lit(0), lit(dim - 1))).as("i"))
      .select(col("g"), col("i"),
        explode(sequence(col("i"), lit(dim - 1))).as("j"))
      .select(
        col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        // + 0.0 collapses IEEE −0.0 to +0.0 (a −εcov that rounds to
        // zero keeps its sign bit otherwise, and the oracle compare
        // sorts on the rendered string)
        (round(
          expr(s"element_at(g, cast(2 + $dim + i*$dim - i*(i-1) div 2 + (j-i) as int))") /
            expr("element_at(g, 1)") -
            (expr("element_at(g, cast(i + 2 as int))") / expr("element_at(g, 1)")) *
              (expr("element_at(g, cast(j + 2 as int))") / expr("element_at(g, 1)")),
          6) + lit(0.0)).as("cov"))
  }

  /** Project each vector onto the top-`k` principal components of the
    * corpus covariance. One GramAgg scan → driver Jacobi eigensolve
    * (d×d) → eigenvectors broadcast back as literals into a codegen'd
    * [[graft.plans.DotProductF]] projection — the second scan never
    * shuffles. Deterministic: cyclic Jacobi with a fixed sweep count,
    * eigenvectors sign-fixed (largest-|component| positive),
    * eigenvalue ties broken by index. */
  def pcaProject(rows: DataFrame, idCol: String, vecCol: String, dim: Int,
                 k: Int, statsDecimals: Int = -1): DataFrame = {
    require(k >= 1 && k <= dim, s"k=$k out of range for dim=$dim")
    // statistics pass (documented driver action, same class as
    // kmeansRefine's seed collect): ONE row of d(d+3)/2+1 doubles
    val buf = rows.agg(gramCol(col(vecCol), dim).as("g"))
      .head().getSeq[Double](0).toArray
    val n = buf(0)
    require(n > 0, "pcaProject: empty input")
    // statsDecimals >= 0 quantizes mean and covariance BEFORE the
    // eigensolve: the distributed sums' partial-merge order perturbs
    // the statistics at ~1 ulp, and quantizing collapses that to one
    // canonical value — projections become bit-reproducible across
    // cluster sizes AND engines (the DuckDB dual replays the same
    // rounded stats). Half-away-from-zero on x·10^d, the C round()
    // semantics SQL engines use for DOUBLE.
    def quant(x: Double): Double =
      if (statsDecimals < 0) x
      else {
        val p = math.pow(10, statsDecimals)
        val y = x * p
        (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)) / p
      }
    val mean = Array.tabulate(dim)(i => quant(buf(1 + i) / n))
    val meanRaw = Array.tabulate(dim)(i => buf(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = quant(buf(t) / n - meanRaw(i) * meanRaw(j))
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(cov) // descending eigenvalues
    val scores = (0 until k).map { c =>
      val v = vecs(c)
      val vLit = array(v.map(x => lit(x.toFloat)): _*)
      val offset = (0 until dim).map(d => mean(d) * v(d)).sum
      (toCol(graft.plans.DotProductF(
        toExpr(col(vecCol)), toExpr(vLit))) - lit(offset))
        .as(s"pc${c + 1}")
    }
    rows.select(col(idCol) +: scores: _*)
  }

  /** Aggregate Column wrapper for [[graft.plans.GramAgg]]. */
  def gramCol(c: org.apache.spark.sql.Column, dim: Int): org.apache.spark.sql.Column =
    toCol(graft.plans.GramAgg(toExpr(c), dim).toAggregateExpression())

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: fixed 12
    * sweeps (converges quadratically; 12 is far past machine epsilon
    * for d ≤ 256), rotations applied pairwise. Returns eigenvalues
    * descending with matching eigenvectors (rows of the returned
    * matrix), each sign-fixed so its largest-|.| component is
    * positive. Driver-side by design — the input is d×d. */
  private[operators] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 12) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tSign = if (theta >= 0) 1.0 else -1.0
            val tt = tSign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val s = tt * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vpr = v(p)(r); val vqr = v(q)(r)
              v(p)(r) = c * vpr - s * vqr
              v(q)(r) = s * vpr + c * vqr
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val row = v(i)
      val mx = row.indices.maxBy(j => (math.abs(row(j)), -j))
      if (row(mx) < 0) row.map(-_) else row.clone()
    }.toArray
    (vals, vecs)
  }
}
