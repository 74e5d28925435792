package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecompositionSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4
  // deterministic anisotropic cloud: variance concentrated on a known
  // direction (1,1,0,0)/√2 plus small noise on the rest
  private def cloud(n: Int): Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(123)
    (1 to n).map { i =>
      val main = rng.nextGaussian() * 3.0
      val v = Array(
        main / math.sqrt(2) + rng.nextGaussian() * 0.1,
        main / math.sqrt(2) + rng.nextGaussian() * 0.1,
        rng.nextGaussian() * 0.5,
        rng.nextGaussian() * 0.2 + 1.0)
      (i.toLong, v.map(_.toFloat).toSeq)
    }
  }

  test("GramAgg covariance matches a driver-side exact computation") {
    val data = cloud(400)
    val df = data.toDF("id", "vec").repartition(7)
    val got = Decomposition.covarianceMatrix(df, "vec", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val xs = data.map(_._2.map(_.toDouble).toArray)
    val n = xs.size.toDouble
    val mean = Array.tabulate(dim)(i => xs.map(_(i)).sum / n)
    for (i <- 0 until dim; j <- i until dim) {
      val exact = xs.map(x => (x(i) - mean(i)) * (x(j) - mean(j))).sum / n
      assert(math.abs(got((i.toLong, j.toLong)) - exact) < 1e-5,
        s"cov($i,$j): got ${got((i.toLong, j.toLong))} exact $exact")
    }
    assert(got.size == dim * (dim + 1) / 2)
  }

  test("GramAgg fails loudly on a wrong-width vector") {
    val df = Seq((1L, Seq(1f, 2f))).toDF("id", "vec")
    val e = intercept[Exception] {
      Decomposition.covarianceMatrix(df, "vec", dim).collect()
    }
    assert(e.getMessage != null)
  }

  test("jacobiEigen: A·v = λ·v, orthonormal, descending, sign-fixed") {
    val rng = new scala.util.Random(9)
    val d = 6
    val b = Array.fill(d, d)(rng.nextGaussian())
    // symmetric PSD-ish: BᵀB
    val m = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => b(k)(i) * b(k)(j)).sum)
    val (vals, vecs) = Decomposition.jacobiEigen(m)
    for (c <- 0 until d) {
      val v = vecs(c)
      // residual ‖Av − λv‖
      val res = (0 until d).map { i =>
        val av = (0 until d).map(j => m(i)(j) * v(j)).sum
        math.pow(av - vals(c) * v(i), 2)
      }.sum
      assert(math.sqrt(res) < 1e-8, s"eigenpair $c residual ${math.sqrt(res)}")
      val norm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-10)
      val mx = v.indices.maxBy(j => (math.abs(v(j)), -j))
      assert(v(mx) > 0, s"sign fix violated on vec $c")
      for (c2 <- c + 1 until d) {
        val dot = (0 until d).map(i => v(i) * vecs(c2)(i)).sum
        assert(math.abs(dot) < 1e-9, s"vecs $c,$c2 not orthogonal: $dot")
      }
    }
    assert(vals.sliding(2).forall(p => p(0) >= p(1) - 1e-12), "not descending")
  }

  test("pcaProject: pc1 variance = λ1, finds the planted direction, partition-invariant") {
    val df = cloud(600).toDF("id", "vec")
    val out = Decomposition.pcaProject(df, "id", "vec", dim, k = 2)
    val rows = out.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val n = rows.length.toDouble
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v1 = variance(rows.map(_._2).toSeq)
    val v2 = variance(rows.map(_._3).toSeq)
    // planted main direction has variance ≈ 9 ≫ the noise dims
    assert(v1 > 5.0, s"pc1 variance too small: $v1")
    assert(v1 > v2 * 5, s"pc1 ($v1) should dominate pc2 ($v2)")
    // projection means are ~0 (centered)
    assert(math.abs(rows.map(_._2).sum / n) < 1e-6)
    // partitioning must not change scores beyond FP-merge noise
    val re = Decomposition.pcaProject(df.repartition(11), "id", "vec", dim, k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, pc1, _) =>
      assert(math.abs(re(id) - pc1) < 1e-4, s"id=$id drifted: $pc1 vs ${re(id)}")
    }
  }
}
