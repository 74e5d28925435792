package graft.operators

import graft.SparkSpec
import graft.operators.Linkage.FieldComparison
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val comparisons = Seq(
    FieldComparison("email", col("a_em") === col("b_em"), 5.0, -2.0),
    FieldComparison("name", col("a_nm") === col("b_nm"), 3.0, -1.0))

  test("fellegiSunter links only within blocks, scores per F-S weights") {
    val a = Seq(
      (1, 10L, "x@m", "ann"), (1, 11L, "y@m", "bob"), (2, 12L, "z@m", "cat"))
      .toDF("blk", "a_key", "a_em", "a_nm")
    val b = Seq(
      (1, 20L, "x@m", "ann"),  // full match with 10 → 8.0
      (1, 21L, "y@m", "BOB"),  // email-only with 11 → 4.0
      (2, 22L, "q@m", "cat"))  // name-only with 12 → 1.0 (cut)
      .toDF("blk", "b_key", "b_em", "b_nm")
    val out = Linkage.fellegiSunter(a, b, Seq("blk"), "a_key", "b_key",
        comparisons, minScore = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(out == Map((10L, 20L) -> 8.0, (11L, 21L) -> 4.0))
  }

  test("cross-block twins never pair: blocking is the only candidate source") {
    val a = Seq((1, 1L, "same@m", "same")).toDF("blk", "a_key", "a_em", "a_nm")
    val b = Seq((2, 2L, "same@m", "same")).toDF("blk", "b_key", "b_em", "b_nm")
    assert(Linkage.fellegiSunter(a, b, Seq("blk"), "a_key", "b_key",
      comparisons, minScore = -100.0).count() == 0)
  }

  test("shared non-blocking column names are rejected loudly") {
    val a = Seq((1, 1L, "x")).toDF("blk", "a_key", "oops")
    val b = Seq((1, 2L, "y")).toDF("blk", "b_key", "oops")
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(a, b, Seq("blk"), "a_key", "b_key",
        Seq(FieldComparison("o", col("oops") === col("oops"), 1.0, -1.0)), 0.0)
    }
  }

  test("emWeights: scala-replicated 2-iteration EM on a separable mixture") {
    import spark.implicits._
    // 100 all-agree pairs (the matches) + 900 all-disagree pairs
    val pairs = ((1 to 100).map(_ => (true, true)) ++
      (1 to 900).map(_ => (false, false))).toDF("gx", "gy")
    val out = Linkage.emWeights(pairs, Seq("gx", "gy"), iters = 2)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // replicate the exact arithmetic: 2 patterns, F=2; p is
    // quantized ALONE (bounded) then scaled by the exact count
    def q12(x: Double) = BigInt(math.floor(x * 1e12 + 0.5).toLong)
    var (lam, m, u) = (0.1, 0.9, 0.1) // symmetric fields share params
    for (_ <- 1 to 2) {
      def p(g: Boolean) = {
        val pm = (if (g) lam * m * m else lam * (1.0 - m) * (1.0 - m))
        val pu = (if (g) (1.0 - lam) * u * u
                  else (1.0 - lam) * (1.0 - u) * (1.0 - u))
        pm / (pm + pu)
      }
      val (pT, pF) = (p(true), p(false))
      val sp = q12(pT) * 100 + q12(pF) * 900
      val su = q12(1.0 - pT) * 100 + q12(1.0 - pF) * 900
      val sg = q12(pT) * 100; val sug = q12(1.0 - pT) * 100
      lam = (sp.toDouble / 1e12) / 1000L
      m = sg.toDouble / sp.toDouble; u = sug.toDouble / su.toDouble
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = (r6(lam), r6(m), r6(u), r6(math.log(m / u)),
      r6(math.log((1.0 - m) / (1.0 - u))))
    assert(out("gx") == exp && out("gy") == exp, s"$out vs $exp")
    // the mixture separates: matches agree, non-matches don't
    assert(out("gx")._2 > 0.9 && out("gx")._3 < 0.05, s"$out")
    assert(out("gx")._4 > 0 && out("gx")._5 < 0, "weight signs")
  }

  test("sortedNeighborhood: exact rank-adjacent pairs, n·w bound, skew-proof") {
    import spark.implicits._
    val df = Seq((5L, "e"), (1L, "a"), (3L, "c"), (2L, "b"), (4L, "d"))
      .toDF("id", "k")
    val got = Linkage.sortedNeighborhood(df, "k", "id", window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // rank order a..e = ids 1..5; pairs within 2 ranks
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L)), got.toString)
    // the linear bound holds even when every key is IDENTICAL — the
    // case that melts fixed-cardinality blocking
    val skew = (1L to 100L).map(i => (i, "same")).toDF("id", "k")
    val n = Linkage.sortedNeighborhood(skew, "k", "id", window = 3).count()
    assert(n == 3 * 100 - (1 + 2 + 3), s"n·w bound broken: $n")
    // partitioning-invariant (rank ties broken by id)
    val re = Linkage.sortedNeighborhood(df.repartition(5), "k", "id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(re == got)
  }

  test("emWeights: pattern counts past the old int64 saturation point stay exact") {
    // 20M same-pattern pairs: the pre-fix floor(cnt·p·1e12) hit
    // cnt·p ≈ 2e7 > 9.2e6 and saturated Long.MaxValue, corrupting
    // the M-step. The p-alone quantization must reproduce the exact
    // BigInt replication below.
    val n = 20000000L
    val agree = spark.range(n).selectExpr("true as g")
    val disagree = spark.range(n / 2).selectExpr("false as g")
    val out = Linkage.emWeights(agree.union(disagree), Seq("g"), iters = 1)
      .collect().head
    def q12(x: Double) = BigInt(math.floor(x * 1e12 + 0.5).toLong)
    val (lam0, m0, u0) = (0.1, 0.9, 0.1)
    def p(g: Boolean) = {
      val pm = if (g) lam0 * m0 else lam0 * (1.0 - m0)
      val pu = if (g) (1.0 - lam0) * u0 else (1.0 - lam0) * (1.0 - u0)
      pm / (pm + pu)
    }
    val (pT, pF) = (p(true), p(false))
    val sp = q12(pT) * BigInt(n) + q12(pF) * BigInt(n / 2)
    val su = q12(1.0 - pT) * BigInt(n) + q12(1.0 - pF) * BigInt(n / 2)
    val sg = q12(pT) * BigInt(n); val sug = q12(1.0 - pT) * BigInt(n)
    assert(sp > BigInt(Long.MaxValue), "test must cross the old bound")
    val lam = (sp.toDouble / 1e12) / (n + n / 2)
    val m = sg.toDouble / sp.toDouble
    val u = sug.toDouble / su.toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(1) == r6(lam), s"lambda ${out.getDouble(1)} vs $lam")
    assert(out.getDouble(2) == r6(m), s"m ${out.getDouble(2)} vs $m")
    assert(out.getDouble(3) == r6(u), s"u ${out.getDouble(3)} vs $u")
  }
}
